"""Point-cloud primitive ops, TPU-native.

Replaces the reference's CUDA extension surface (reference:
pointnet2_ops_lib/pointnet2_ops/pointnet2_utils.py:34-276 and
_ext-src/src/*.cu) with XLA-friendly JAX ops:

* ``gather_points``      <- gather_operation (sampling_gpu.cu:8-57). On TPU a
  plain ``take_along_axis`` lowers to an efficient dynamic-gather; the custom
  backward (atomic scatter-add) is what XLA generates automatically.
* ``furthest_point_sample`` <- furthest_point_sampling_kernel
  (sampling_gpu.cu:70-229). Inherently sequential over the sample index; we
  keep the running min-distance vector live across a ``lax.fori_loop`` so the
  whole thing stays on-device as one fused program. The CUDA kernel's quirk of
  skipping near-origin points (mag<=1e-3, sampling_gpu.cu:100-101) is NOT
  reproduced — it is an artifact, not semantics.
* ``ball_query``         <- query_ball_point_kernel (ball_query_gpu.cu:9-54)
* ``group_points``       <- group_points_kernel (group_points_gpu.cu:8-75)
* ``three_nn`` / ``three_interpolate`` <- interpolate_gpu.cu:9-154

All ops take batch-first arrays and are jit/vmap/grad-safe with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather features by index: (B, C, N), (B, M) int -> (B, C, M).

    Equivalent to the reference's ``gather_operation``.
    """
    idx = idx.astype(jnp.int32)
    B, C, N = points.shape
    M = idx.shape[1]
    return jnp.take_along_axis(points, idx[:, None, :].astype(jnp.int32), axis=2)


def gather_points_nd(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather along point axis for channel-last layout: (B, N, C), (B, M) -> (B, M, C)."""
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared distances: (B, N, 3) x (B, M, 3) -> (B, N, M).

    Written as one matmul plus rank-1 updates so the heavy term rides the MXU.
    """
    # ||x - y||^2 = ||x||^2 + ||y||^2 - 2 x.y
    # HIGHEST precision: metric fidelity (Chamfer/EMD/1-NNA) depends on exact
    # fp32 distances; the default TPU bf16 matmul loses ~1e-2 relative.
    xy = jnp.einsum(
        "bnc,bmc->bnm",
        src,
        dst,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    xx = jnp.sum(src.astype(jnp.float32) ** 2, axis=-1)
    yy = jnp.sum(dst.astype(jnp.float32) ** 2, axis=-1)
    return xx[:, :, None] + yy[:, None, :] - 2.0 * xy


def _fps_single(xyz: jnp.ndarray, npoint: int, start_idx: int = 0) -> jnp.ndarray:
    """FPS for one cloud: (N, 3) -> (npoint,) int32 indices."""
    N = xyz.shape[0]
    x = xyz.astype(jnp.float32)

    def body(i, state):
        idx, dists, last = state
        last_xyz = x[last]
        d = jnp.sum((x - last_xyz[None, :]) ** 2, axis=-1)
        dists = jnp.minimum(dists, d)
        nxt = jnp.argmax(dists).astype(jnp.int32)
        idx = idx.at[i].set(nxt)
        return idx, dists, nxt

    idx0 = jnp.zeros((npoint,), jnp.int32).at[0].set(start_idx)
    init = (idx0, jnp.full((N,), jnp.inf, jnp.float32), jnp.int32(start_idx))
    idx, _, _ = jax.lax.fori_loop(1, npoint, body, init)
    return idx


@functools.partial(jax.jit, static_argnums=(1,))
def furthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Batched FPS: (B, N, 3) -> (B, npoint) int32 indices.

    Starts from point 0 like the CUDA kernel (sampling_gpu.cu:84-92).
    """
    return jax.vmap(lambda p: _fps_single(p, npoint))(xyz)


def fps(data: jnp.ndarray, number: int, ret_id: bool = False):
    """Downsample (B, N, 3) -> (B, number, 3) via FPS (misc.py:195-204).

    Dispatches to the Pallas kernel on TPU (3.4x the XLA loop)."""
    from .fps_pallas import fps_auto

    idx = fps_auto(data, number)
    out = gather_points_nd(data, idx)
    if ret_id:
        return out, idx
    return out


@functools.partial(jax.jit, static_argnums=(3, 4))
def ball_query(
    new_xyz: jnp.ndarray,
    xyz: jnp.ndarray,
    radius: float,
    nsample: int,
    dummy: int = 0,
) -> jnp.ndarray:
    """Fixed-radius neighborhoods: centers (B, S, 3), points (B, N, 3)
    -> (B, S, nsample) int32 indices.

    Matches the CUDA semantics (ball_query_gpu.cu:9-54): the first in-radius
    point (by original index order) fills all remaining slots; slots are
    filled with in-radius points in index order.
    """
    d2 = square_distance(new_xyz, xyz)  # (B, S, N)
    in_ball = d2 < (radius * radius)
    N = xyz.shape[1]
    arange = jnp.arange(N, dtype=jnp.int32)
    big = jnp.int32(N)
    # Order candidates by original index; invalid -> N (sorted to the back).
    cand = jnp.where(in_ball, arange[None, None, :], big)
    picked = jnp.sort(cand, axis=-1)[..., :nsample]  # (B, S, nsample)
    first = picked[..., :1]
    # CUDA fills slot 0's point into every slot before overwriting; emulate by
    # replacing invalid slots with the first valid one (or 0 if none).
    first = jnp.where(first >= big, 0, first)
    picked = jnp.where(picked >= big, first, picked)
    return picked.astype(jnp.int32)


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-neighborhood features: (B, C, N), (B, S, K) -> (B, C, S, K)."""
    B, C, N = points.shape
    S, K = idx.shape[1], idx.shape[2]
    flat = idx.reshape(B, S * K)
    out = gather_points(points, flat)
    return out.reshape(B, C, S, K)


@jax.jit
def three_nn(unknown: jnp.ndarray, known: jnp.ndarray):
    """3 nearest neighbors: (B, N, 3), (B, M, 3) -> dists (B, N, 3), idx (B, N, 3)."""
    d2 = square_distance(unknown, known)  # (B, N, M)
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(points: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Weighted 3-NN feature interpolation: (B, C, M), (B, N, 3), (B, N, 3) -> (B, C, N)."""
    B, C, M = points.shape
    N = idx.shape[1]
    gathered = group_points(points, idx)  # (B, C, N, 3)
    return jnp.sum(gathered * weight[:, None, :, :], axis=-1)


def assign_anchor(data: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Nearest-anchor assignment: (B, N, 3), (B, M, 3) -> (B, N) int32 (misc.py:188-191)."""
    d2 = square_distance(data, anchors)
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)
