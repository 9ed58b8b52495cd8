"""Training step: one jitted SPMD program (loss + grads + clip + update).

Replaces the reference's per-iteration python train step (reference:
python/difffacto/runner/runner.py:299-347): zero_grad -> model loss dict ->
parse_losses -> clip_grad_norm -> Adam.step becomes a single pjit'ed function
over the data mesh. ``parse_losses`` keeps the reference semantics: the total
is the sum of every entry whose key contains 'loss' (utils/misc.py:120-132).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.anchor_diff import AnchorDiffAE, ensure_attn_maps


# Batch keys whose second dimension is the point axis (shardable over a
# ('data', 'points') mesh). Everything else is per-shape and shards on
# 'data' only.
POINT_AXIS_BATCH_KEYS = frozenset(
    {"input", "ref", "seg_mask", "ref_seg_mask", "attn_map", "ref_attn_map", "diffusion_noise"}
)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def parse_losses(losses: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    means = {k: jnp.mean(v) for k, v in losses.items()}
    total = sum(v for k, v in means.items() if "loss" in k)
    return total, means


def unpack_batch(packed: Dict, spec) -> Dict:
    """Inverse of ``runner.pack_batch`` — inside jit, so the column slices
    and reshapes are free layout views, not copies.  Seg masks come back as
    int32 and the one-hot attn maps are rebuilt if the spec dropped them."""
    f_entries, _, i_entries, _ = spec
    f = packed["f32"]
    B = f.shape[0]
    out = {}
    for k, off, shp in f_entries:
        n = 1
        for d in shp:
            n *= d
        out[k] = jax.lax.slice_in_dim(f, off, off + n, axis=1).reshape((B,) + shp)
    if i_entries:
        i8 = packed["i8"]
        for k, off, shp in i_entries:
            n = 1
            for d in shp:
                n *= d
            out[k] = (
                jax.lax.slice_in_dim(i8, off, off + n, axis=1)
                .reshape((B,) + shp)
                .astype(jnp.int32)
            )
    return ensure_attn_maps(out)


def make_train_step(
    model: AnchorDiffAE,
    tx: optax.GradientTransformation,
    trainable_filter: Optional[Callable[[Tuple[str, ...]], bool]] = None,
    donate: bool = True,
    mesh=None,
    pack_spec=None,
    skip_grad_norm: Optional[float] = None,
):
    """Build the jitted train step.

    ``trainable_filter(path) -> bool`` freezes parameters outside the filter
    (reference's train_aligner / train_cvae param groups, runner.py:76-94) by
    zeroing their UPDATES after the optimizer transform — the full gradients
    still flow through the clip so its global norm matches the reference's
    clip_grad_norm_ over ALL parameters (runner.py:313-316); optimizer state
    stays uniform so checkpoints are interchangeable between stages.

    ``skip_grad_norm`` extends the non-finite guard to finite-but-huge
    gradients: a step whose global grad norm exceeds the threshold is skipped
    entirely (params/opt-state/stats unchanged, counted in the
    ``skipped_nonfinite`` metric). Motivated by a measured failure mode the
    reference shares (it only clips, runner.py:214): a late-training spike to
    grad_norm ~1e6 permanently degraded a long run even though every update
    was clipped — clipping bounds the step size, not the damage of many
    consecutive steps in a pathological direction, and it poisons Adam's
    second-moment estimate.

    With ``mesh`` (>1 device), the step runs under ``shard_map`` over the
    'data' axis: the batch is device-local, gradients are ``psum``-averaged
    over ICI, batch-norm statistics are ``pmean``-synced (SyncBN semantics),
    and the parameter update replays identically on every device. This is
    the multi-chip path — Pallas kernels inside the step see only their
    device-local shard, so no GSPMD partitioning of the custom calls is
    needed (a pallas_call under plain GSPMD would be gathered/replicated).
    """

    def step_fn(state: TrainState, batch, rng, epoch, axis_name=None, reduce_axes=None):
        if pack_spec is not None:
            batch = unpack_batch(batch, pack_spec)
        else:
            batch = ensure_attn_maps(batch)
        if reduce_axes is None:
            reduce_axes = axis_name
        if axis_name is not None:
            # per-DATA-shard noise streams; point shards of the same sample
            # share the stream (replicated draws — part codes, timesteps —
            # must agree across them; per-point draws are decorrelated at the
            # draw site via parallel.axes.fold_points). Params stay
            # replicated because the reduced grads make the update identical
            # everywhere.
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        rng_sample, rng_dropout = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            outs, mutated = model.apply(
                variables,
                batch,
                epoch,
                method=AnchorDiffAE.loss,
                rngs={"sample": rng_sample, "dropout": rng_dropout},
                mutable=["batch_stats"],
            )
            total, means = parse_losses(outs)
            return total, (means, mutated.get("batch_stats", {}))

        (total, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if reduce_axes is not None:
            # 'data': average of per-shard local-batch grads (DDP semantics).
            # 'points': the loss VALUE is already global on every point shard
            # (assembled via psum/all_gather in parallel.axes), and the
            # collective transposes scale cotangents by the axis size, so the
            # pmean over 'points' recovers exact gradients for both the
            # point-sharded and the replicated loss terms (pinned by
            # tests/test_parallel.py::test_sp_loss_grads_match_single_device).
            grads = jax.lax.pmean(grads, reduce_axes)
            total = jax.lax.pmean(total, reduce_axes)
            metrics = jax.lax.pmean(metrics, reduce_axes)
            if new_stats:
                new_stats = jax.lax.pmean(new_stats, reduce_axes)
        # Non-finite guard: one bad batch/step must not poison a multi-day
        # run — if the loss or any grad is non-finite, skip the whole update
        # (params, optimizer state, batch stats all keep their old values)
        # and surface it via the 'skipped_nonfinite' metric. The reference
        # has no such guard and a single overflow kills the run.
        finite = jnp.isfinite(total) & jax.tree_util.tree_reduce(
            lambda a, g: a & jnp.isfinite(g).all(), grads, jnp.bool_(True)
        )
        gnorm = optax.global_norm(grads)
        if skip_grad_norm is not None:
            finite = finite & jnp.isfinite(gnorm) & (gnorm < skip_grad_norm)
        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt = tx.update(safe_grads, state.opt_state, state.params)
        if trainable_filter is not None:
            # Reference train_aligner semantics (runner.py:75-94, 313-316):
            # backward fills grads for EVERY param, clip_grad_norm_ scales by
            # the global norm over ALL of them, and only the selected group
            # is stepped. So the FULL grads go through tx (the clip inside tx
            # sees the reference-faithful global norm) and the frozen params'
            # UPDATES are zeroed here — not their grads (zeroing grads first
            # shrank the clip norm, a measured delta vs the reference's own
            # loop, tests/test_reference_parity_trainloop.py).
            updates = jax.tree_util.tree_map_with_path(
                lambda path, u: u
                if trainable_filter(tuple(getattr(p, "key", str(p)) for p in path))
                else jnp.zeros_like(u),
                updates,
            )
        new_params = optax.apply_updates(state.params, updates)
        keep_old = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new, old
        )
        new_params = keep_old(new_params, state.params)
        new_opt = keep_old(new_opt, state.opt_state)
        metrics["total_loss"] = total
        metrics["grad_norm"] = gnorm
        metrics["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
        if new_stats:
            new_stats = keep_old(new_stats, state.batch_stats)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats if new_stats else state.batch_stats,
            opt_state=new_opt,
        )
        return new_state, metrics

    if mesh is None or getattr(mesh, "size", 1) <= 1:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from .axes import points_sharded

    axis = mesh.axis_names[0]
    point_axis = None
    if len(mesh.axis_names) > 1 and mesh.shape[mesh.axis_names[1]] > 1:
        point_axis = mesh.axis_names[1]
    data = P(axis)
    rep = P()

    if point_axis is None:

        def local_step(state, batch, rng, epoch):
            return step_fn(state, batch, rng, epoch, axis_name=axis)

        sharded = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(rep, data, rep, rep),
            out_specs=(rep, rep),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0,) if donate else ())

    # --- sequence-parallel training: 2-D ('data', 'points') mesh ----------
    # Point-axis batch arrays shard on BOTH axes; per-shape arrays on 'data'
    # only. The loss collectives live in parallel.axes (masked max-pool,
    # per-point loss reductions); grads/metrics pmean over both axes.
    if pack_spec is not None:
        raise ValueError(
            "packed batches cannot shard the point axis (the pack flattens "
            "per-sample features); use unpacked batches with a points mesh"
        )

    reduce_axes = (axis, point_axis)

    def sp_local_step(state, batch, rng, epoch):
        with points_sharded(point_axis):
            return step_fn(
                state, batch, rng, epoch, axis_name=axis, reduce_axes=reduce_axes
            )

    def batch_spec(key):
        if key in POINT_AXIS_BATCH_KEYS:
            return P(axis, point_axis)
        return P(axis)

    cache = {}

    def step(state, batch, rng, epoch):
        keys = tuple(sorted(batch))
        fn = cache.get(keys)
        if fn is None:
            in_specs = (rep, {k: batch_spec(k) for k in keys}, rep, rep)
            fn = cache[keys] = jax.jit(
                shard_map(
                    sp_local_step,
                    mesh=mesh,
                    in_specs=in_specs,
                    out_specs=(rep, rep),
                    check_vma=False,
                ),
                donate_argnums=(0,) if donate else (),
            )
        return fn(state, batch, rng, epoch)

    return step


def init_train_state(model: AnchorDiffAE, tx, batch, seed: int = 0) -> TrainState:
    rngs = {
        "params": jax.random.PRNGKey(seed),
        "sample": jax.random.PRNGKey(seed + 1),
        "dropout": jax.random.PRNGKey(seed + 2),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, 0, method=AnchorDiffAE.loss))(
        rngs, batch
    )
    return TrainState.create(variables, tx)
