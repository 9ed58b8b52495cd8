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

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
