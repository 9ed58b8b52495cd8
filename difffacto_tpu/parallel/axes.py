"""Point-axis (sequence-parallel) context for the training loss.

The reference has no sequence parallelism (SURVEY.md §2.6): its scaling
axis is points-per-cloud (npoints=8192 for car, reference
configs/gen_car.py:90), handled by xformers attention + gradient
checkpointing on one GPU. On TPU the natural scale-out is a 2-D
('data', 'points') mesh: generation already shards the reverse chain over
both axes with zero collectives (models/anchor_diff.decode). Training,
however, REDUCES over the point axis in a few places (masked max-pool in
the PointNet stylizer, per-point fit/diffusion losses), so a point-sharded
train step needs collectives exactly there.

This module is the chokepoint: model code calls the helpers below wherever
it reduces over the point axis. Outside a sequence-parallel shard_map they
are identity/no-ops, so the single-device and flat-DP paths are untouched.

Gradient semantics (pinned by tests/test_parallel.py): every point-axis
reduction inside the loss goes through ``psum``/``all_gather`` so each
device's loss VALUE is the global one; under shard_map the collective
transpose multiplies cotangents by the axis size, so the train step
combines per-device grads with ``pmean`` over the 'points' axis — which is
also exactly right for the replicated (non-point) loss terms. See
parallel/train.py:make_train_step.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp

# Trace-time state: set (only) while tracing a sequence-parallel train step.
_POINT_AXIS: Optional[str] = None


def point_axis() -> Optional[str]:
    return _POINT_AXIS


@contextmanager
def points_sharded(axis_name: Optional[str]):
    """Activate the point axis for the duration of a trace."""
    global _POINT_AXIS
    prev = _POINT_AXIS
    _POINT_AXIS = axis_name
    try:
        yield
    finally:
        _POINT_AXIS = prev


def sp_size():
    """Number of point shards (1 outside a sequence-parallel trace)."""
    if _POINT_AXIS is None:
        return 1
    return jax.lax.psum(1, _POINT_AXIS)


def psum_points(x):
    """Sum a partial point-axis reduction over all point shards."""
    if _POINT_AXIS is None:
        return x
    return jax.lax.psum(x, _POINT_AXIS)


def allmax_points(x):
    """Elementwise max over point shards of an already locally-maxed value
    (the masked max-pools in models/pointnet.py). Implemented as
    all_gather + max rather than ``pmax`` so the subgradient routes to the
    argmax shard under reverse-mode AD."""
    if _POINT_AXIS is None:
        return x
    g = jax.lax.all_gather(x, _POINT_AXIS, axis=0)
    return jnp.max(g, axis=0)


def fold_points(rng):
    """Decorrelate a per-point rng stream across point shards (q_sample
    noise, per-point fit-loss samples). Replicated draws — part codes,
    timesteps, aligner noise — must NOT be folded."""
    if _POINT_AXIS is None:
        return rng
    return jax.random.fold_in(rng, jax.lax.axis_index(_POINT_AXIS))
