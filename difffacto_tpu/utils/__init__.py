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


def _host_cpu_fingerprint() -> str:
    """Short hash of this host's CPU ISA features (/proc/cpuinfo flags).

    Used to partition the persistent compile cache so CPU-AOT executables
    compiled on one microarchitecture are never loaded on another (XLA's
    cpu_aot_loader warns this "could lead to execution errors such as
    SIGILL"). Falls back to the platform machine string off-Linux."""
    import hashlib
    import platform as _plat

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    if not feats:
        feats = _plat.machine()
    return hashlib.sha256(feats.encode()).hexdigest()[:12]


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
    # Separate cache per platform AND per host CPU fingerprint: a
    # remote-device tunnel process writes CPU-AOT entries compiled for the
    # REMOTE host's CPU features; loading those into a local CPU-only
    # process trips cpu_aot_loader feature-mismatch errors and risks SIGILL
    # (jax keys entries by program, not by executing CPU — observed live in
    # MULTICHIP_r03.json). Keying the directory by the local /proc/cpuinfo
    # feature flags makes entries from a different microarchitecture land in
    # a different directory instead of being loaded and trusted.
    platform = (getattr(jax.config, "jax_platforms", None) or "default").split(",")[0]
    path = os.path.join(path, platform + "-" + _host_cpu_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
