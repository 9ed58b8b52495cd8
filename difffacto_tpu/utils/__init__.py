from .loggers import RunLogger, ScalarLogger, TextLogger
from .registry import (
    DATASETS,
    DECOMPOSERS,
    DIFFUSIONS,
    DISCRIMINATORS,
    ENCODERS,
    GENERATORS,
    HOOKS,
    LOSSES,
    METRICS,
    MODELS,
    NETS,
    OPTIMS,
    Registry,
    SAMPLERS,
    SCHEDULERS,
    SEGMENTORS,
    build_from_cfg,
)


def install_tool_watchdog(default_s: float = 1800.0):
    """Hard wall-clock limit for one-shot CLI tools.

    A tunnel-blocked JAX call can hang a tool process forever (a round-2
    A/B script sat ~3 h on a dead TPU stream, starving the tunnel for the
    driver's bench — see VERDICT r2 'process hygiene'). A daemon timer
    hard-exits the process with status 124 (the coreutils ``timeout``
    convention) once the budget elapses; ``os._exit`` fires even while the
    main thread is blocked inside a C extension.

    Budget: ``DIFFFACTO_TOOL_TIMEOUT`` seconds when set (0 disables),
    else ``default_s``.
    """
    import os
    import sys
    import threading

    budget = float(os.environ.get("DIFFFACTO_TOOL_TIMEOUT", default_s))
    if budget <= 0:
        return

    def _expire():
        print(
            f"[difffacto_tpu] tool watchdog: exceeded {budget:.0f}s wall "
            "budget (DIFFFACTO_TOOL_TIMEOUT to adjust); hard-exiting 124",
            file=sys.stderr,
            flush=True,
        )
        os._exit(124)

    t = threading.Timer(budget, _expire)
    t.daemon = True
    t.start()


def enable_compile_cache(path: str = None):
    """Enable JAX's persistent compilation cache for CLI entry points.

    First compiles through the device tunnel take minutes (the whole-trunk
    kernels and scan-of-pallas metric programs are large); caching them cuts
    repeat-run startup to seconds. Opt-out: DIFFFACTO_NO_COMPILE_CACHE=1.
    """
    import os

    if os.environ.get("DIFFFACTO_NO_COMPILE_CACHE", "") == "1":
        return
    import jax

    path = path or os.environ.get(
        "DIFFFACTO_COMPILE_CACHE", os.path.expanduser("~/.cache/difffacto_jax")
    )
    # Separate cache per platform: a remote-device tunnel process writes
    # CPU-AOT entries compiled for the REMOTE host's CPU features; loading
    # those into a local CPU-only process trips feature-mismatch warnings
    # and risks SIGILL. (jax keys entries by program, not by executing CPU.)
    # Read the CONFIGURED platform rather than jax.default_backend(): the
    # latter initializes the backend, and callers (conftest, dryrun) must
    # still be able to switch platforms after enabling the cache.
    platform = (getattr(jax.config, "jax_platforms", None) or "default").split(",")[0]
    path = os.path.join(path, platform)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
