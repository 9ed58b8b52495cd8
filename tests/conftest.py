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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# CPU auction-EMD with full eval iterations is minutes-slow on this 1-core
# host; tests cap the iteration budget (accuracy still plenty for assertions).
os.environ.setdefault("DIFFFACTO_EMD_ITERS", "300")

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: XLA CPU compiles of the full model graph on
# this 1-core host take ~30-60s each; cache them across test runs.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
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
