"""Test configuration: run everything on a virtual 8-device CPU mesh.

GOTCHA (this box): /root/.axon_site/sitecustomize.py imports jax's config at
interpreter startup with JAX_PLATFORMS=axon, so *env vars set here are too
late* — the platform must be forced through jax.config.update. Without this,
tests silently run over the single-TPU tunnel (~100x slower, and concurrent
processes deadlock).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # Same ISA cap as __graft_entry__.py: pin compiled CPU code to AVX2 so
    # persistent-cache AOT entries never carry host-specific AVX512/AMX (or
    # XLA pseudo-feature) targets that cpu_aot_loader rejects with SIGILL
    # warnings when a different worker loads them.
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

# CPU auction-EMD with full eval iterations is minutes-slow on this 1-core
# host; tests cap the iteration budget (accuracy still plenty for assertions).
os.environ.setdefault("DIFFFACTO_EMD_ITERS", "300")

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: XLA CPU compiles of the full model graph on
# this 1-core host take ~30-60s each; cache them across test runs.
_CACHE_DIR = "/tmp/jax_cache/avx2"  # keyed by the ISA cap above; entries in
# the legacy flat /tmp/jax_cache were compiled pre-cap and must not be loaded
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    # Multi-minute e2e tests are marked slow. They run BY DEFAULT (CI and
    # the driver's full-suite gate include them); deselect for the fast
    # iteration loop with:  python -m pytest tests/ -q -m "not slow"
    config.addinivalue_line(
        "markers", "slow: multi-minute e2e test (deselect with -m 'not slow')"
    )
