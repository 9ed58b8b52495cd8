"""Chamfer distance, TPU-native.

Replaces the reference CUDA Chamfer extension (reference:
python/difffacto/metrics/chamfer_dist/chamfer.cu:15-229 and
__init__.py:28-100). On TPU the pairwise-distance matrix is a matmul-shaped
reduction that XLA maps straight onto the MXU, so no custom kernel is needed
at 2048 points; for larger clouds ``chamfer_split_tiled`` streams the distance
matrix in column tiles to bound memory.

Autodiff replaces the hand-written backward scatter kernel
(chamfer.cu:173-229): gradients of ``min`` flow through the argmin lanes
automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .points import square_distance


@jax.jit
def chamfer_split(x: jnp.ndarray, y: jnp.ndarray):
    """Bidirectional squared-L2 NN distances.

    x: (B, N, 3), y: (B, M, 3) -> (dl (B, N), dr (B, M)) where
    dl[i] = min_j ||x_i - y_j||^2, dr[j] = min_i.
    Matches the reference's ``distChamfer`` / ``ChamferDistanceL2_split``
    (evaluation_utils.py:93-103).
    """
    d2 = square_distance(x, y)
    return jnp.min(d2, axis=2), jnp.min(d2, axis=1)


@jax.jit
def chamfer_l2(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean bidirectional squared-L2 Chamfer, per batch element -> (B,)."""
    dl, dr = chamfer_split(x, y)
    return dl.mean(axis=1) + dr.mean(axis=1)


@jax.jit
def chamfer_l1(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean bidirectional L2-norm (not squared) Chamfer -> (B,)."""
    dl, dr = chamfer_split(x, y)
    return jnp.sqrt(jnp.maximum(dl, 0.0)).mean(axis=1) + jnp.sqrt(
        jnp.maximum(dr, 0.0)
    ).mean(axis=1)


@functools.partial(jax.jit, static_argnums=(2,))
def chamfer_split_tiled(x: jnp.ndarray, y: jnp.ndarray, tile: int = 2048):
    """Memory-bounded Chamfer for large M: streams y in tiles of ``tile``.

    Keeps peak memory at O(B*N*tile) instead of O(B*N*M). Used for the 8192-
    point car config (configs/gen_car.py:90).
    """
    B, N, _ = x.shape
    M = y.shape[1]
    assert M % tile == 0, "tile must divide M"
    num_tiles = M // tile

    def body(carry, yt):
        dl = carry
        d2 = square_distance(x, yt)  # (B, N, tile)
        dl = jnp.minimum(dl, jnp.min(d2, axis=2))
        dr_t = jnp.min(d2, axis=1)  # (B, tile)
        return dl, dr_t

    y_tiles = y.reshape(B, num_tiles, tile, 3).transpose(1, 0, 2, 3)
    dl0 = jnp.full((B, N), jnp.inf, jnp.float32)
    dl, dr_tiles = jax.lax.scan(body, dl0, y_tiles)
    dr = dr_tiles.transpose(1, 0, 2).reshape(B, M)
    return dl, dr


def pairwise_chamfer(sample: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """All-pairs Chamfer matrix between two *sets* of clouds.

    sample: (S, N, 3), ref: (R, N, 3) -> (S, R) where entry (i, j) is
    mean_min(sample_i->ref_j) + mean_min(ref_j->sample_i).

    One batched program replacing the reference's O(S*R) python double loop
    (evaluation_utils.py:143-200).
    """

    @jax.jit
    def one_sample(s):
        d2 = square_distance(jnp.broadcast_to(s[None], ref.shape), ref)  # (R, N, N)
        return jnp.min(d2, axis=2).mean(axis=1) + jnp.min(d2, axis=1).mean(axis=1)

    return jax.lax.map(one_sample, sample)
