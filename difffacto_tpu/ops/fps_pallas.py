"""Pallas TPU kernel for furthest point sampling.

FPS is inherently sequential over the m selected points (reference CUDA
kernel: pointnet2_ops/_ext-src/src/sampling_gpu.cu:70-229). The XLA
``fori_loop`` version (ops/points.py) round-trips the running min-distance
vector through HBM every iteration; this kernel keeps the (1, N) distance
vector AND the (3, N) coordinates resident in VMEM for the whole loop —
one grid step per batch element, zero HBM traffic inside the loop.

Layout: coordinates channel-first (3, N) so N fills the lane dimension
(channel-last (N, 3) would pad 3 -> 128 lanes, 42x memory waste).

The CUDA kernel's near-origin skip quirk (mag <= 1e-3, sampling_gpu.cu:
100-101) is deliberately NOT reproduced — see SURVEY.md §7.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(xyz_ref, out_ref, dists_ref):
    """xyz (1, 3, N) f32 VMEM -> out (1, 1, m) int32; dists (1, N) scratch."""
    N = xyz_ref.shape[2]
    m = out_ref.shape[2]
    xyz = xyz_ref[0]  # (3, N)
    dists_ref[:] = jnp.full((1, N), jnp.inf, jnp.float32)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)

    out_ref[:] = jnp.zeros((1, 1, m), jnp.int32)

    def body(i, cur):
        # coordinates of the current point via one-hot reduction (lane gather)
        onehot = (lane_idx == cur).astype(jnp.float32)  # (1, N)
        cx = jnp.sum(xyz * onehot, axis=1, keepdims=True)  # (3, 1)
        d = jnp.sum((xyz - cx) ** 2, axis=0, keepdims=True)  # (1, N)
        dmin = jnp.minimum(dists_ref[:], d)
        dists_ref[:] = dmin
        nxt = jnp.argmax(dmin[0]).astype(jnp.int32)
        # scalar stores to VMEM are unsupported: masked full-vector write
        out_ref[:] = jnp.where(out_lane == i, nxt, out_ref[:])
        return nxt

    jax.lax.fori_loop(1, m, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnums=(1,))
def furthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Batched Pallas FPS: (B, N, 3) -> (B, npoint) int32 indices.

    Starts from point 0 per cloud like the CUDA kernel and the XLA fallback.
    """
    B, N, _ = xyz.shape
    x = jnp.transpose(xyz, (0, 2, 1)).astype(jnp.float32)  # (B, 3, N)
    out = pl.pallas_call(
        _fps_kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, npoint), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, N), jnp.float32)],
    )(x)
    return out[:, 0]


def fps_auto(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Pallas on TPU, XLA fori_loop elsewhere."""
    from .points import furthest_point_sample

    if jax.default_backend() == "tpu":
        return furthest_point_sample_pallas(xyz, npoint)
    return furthest_point_sample(xyz, npoint)
