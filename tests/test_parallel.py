"""Data-parallel training over a virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difffacto_tpu.parallel import (
    build_optimizer_from_cfg,
    init_train_state,
    make_mesh,
    make_train_step,
    replicate,
    shard_batch,
)

from test_model import init_model, tiny_batch, tiny_model_cfg
from difffacto_tpu.models import AnchorDiffAE


def test_eight_device_mesh_exists():
    assert len(jax.devices()) == 8


def test_train_step_single_device():
    model, variables, batch = init_model()
    tx = build_optimizer_from_cfg(
        dict(type="Adam", lr=1e-3, weight_decay=0.0),
        scheduler_cfg=dict(type="LinearLR", start_lr=1e-3, end_lr=1e-4, start_epoch=2, end_epoch=4),
        iters_per_epoch=2,
        max_norm=10.0,
    )
    from difffacto_tpu.parallel.train import TrainState

    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, donate=False)
    rng = jax.random.PRNGKey(0)
    state1, metrics = step(state, batch, rng, 0)
    assert int(state1.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))
    # params actually moved
    d = jax.tree_util.tree_map(lambda a, b: jnp.abs(a - b).sum(), state.params, state1.params)
    assert sum(float(x) for x in jax.tree_util.tree_leaves(d)) > 0


def test_train_step_sharded_batch():
    """Same step, batch sharded over 8 devices; loss finite and params update."""
    mesh = make_mesh()
    model, variables, _ = init_model(B=8)
    batch = tiny_batch(B=8)
    tx = build_optimizer_from_cfg(dict(type="Adam", lr=1e-3), max_norm=10.0)
    from difffacto_tpu.parallel.train import TrainState

    state = TrainState.create(variables, tx)
    state = jax.tree_util.tree_map(lambda x: replicate(mesh, x), state)
    sbatch = shard_batch(mesh, batch)
    step = make_train_step(model, tx, donate=False)
    state1, metrics = step(state, sbatch, jax.random.PRNGKey(0), 0)
    assert np.isfinite(float(metrics["total_loss"]))
    # result of a replicated-params computation stays replicated
    assert int(state1.step) == 1


def test_train_step_shard_map():
    """mesh path: shard_map step with device-local batch, psum'd grads.

    This is the multi-chip structure that keeps Pallas kernels device-local
    (a pallas_call under plain GSPMD would not partition)."""
    mesh = make_mesh()
    model, variables, _ = init_model(B=8)
    batch = tiny_batch(B=8)
    tx = build_optimizer_from_cfg(dict(type="Adam", lr=1e-3), max_norm=10.0)
    from difffacto_tpu.parallel.train import TrainState

    state = TrainState.create(variables, tx)
    state = jax.tree_util.tree_map(lambda x: replicate(mesh, x), state)
    sbatch = shard_batch(mesh, batch)
    step = make_train_step(model, tx, donate=False, mesh=mesh)
    state1, metrics = step(state, sbatch, jax.random.PRNGKey(0), 0)
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state1.step) == 1
    d = jax.tree_util.tree_map(
        lambda a, b: jnp.abs(a - b).sum(), state.params, state1.params
    )
    assert sum(float(x) for x in jax.tree_util.tree_leaves(d)) > 0


def test_train_step_shard_map_with_kernel(monkeypatch):
    """shard_map + the REAL Pallas train-kernel pair (interpret mode):
    proves the custom-VJP trunk runs device-local under the mesh."""
    monkeypatch.setenv("DIFFFACTO_PALLAS_INTERPRET", "1")
    mesh = make_mesh()
    # d_head=16 x n_heads=8 -> inner=128: kernel-eligible
    cfg = tiny_model_cfg()
    cfg["diffusion"]["net"]["n_heads"] = 8
    cfg["diffusion"]["net"]["d_head"] = 16
    model = AnchorDiffAE(**cfg)
    batch = tiny_batch(B=8)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.jit(
        lambda r, b: model.init(r, b, 0, method=AnchorDiffAE.loss)
    )(rngs, batch)
    tx = build_optimizer_from_cfg(dict(type="Adam", lr=1e-3), max_norm=10.0)
    from difffacto_tpu.parallel.train import TrainState

    state = TrainState.create(variables, tx)
    state = jax.tree_util.tree_map(lambda x: replicate(mesh, x), state)
    sbatch = shard_batch(mesh, batch)
    step = make_train_step(model, tx, donate=False, mesh=mesh)
    state1, metrics = step(state, sbatch, jax.random.PRNGKey(0), 0)
    assert np.isfinite(float(metrics["total_loss"]))

    # sharded generation through the decode shard_map path + eval kernel
    from difffacto_tpu.models import sample_generation

    out = sample_generation(
        model, state1.variables(), jax.random.PRNGKey(3), 8,
        valid_id=jnp.ones((8, 4)), mesh=mesh,
    )
    assert out["pred"].shape[0] == 8 * model.cimle_sample_num
    assert np.isfinite(np.asarray(out["pred"])).all()


@pytest.mark.slow
def test_shard_map_step_matches_manual_dp_math():
    """shard_map step == hand-computed data-parallel math (heterogeneous shards).

    Reference DDP semantics (reference runner.py:61-73): same model, split
    batch, allreduce-averaged grads, one identical update everywhere. Here we
    recompute each device's grads by hand with the same folded rng streams,
    average them, apply one optimizer update, and require the shard_map step
    to reproduce loss, grad-norm, params, and batch-stats numerically."""
    import optax

    from difffacto_tpu.parallel.train import TrainState, parse_losses

    mesh = make_mesh()
    model, variables, _ = init_model(B=8)
    batch = tiny_batch(B=8, rng=np.random.RandomState(7))  # all 8 shards differ
    tx = build_optimizer_from_cfg(dict(type="Adam", lr=1e-3), max_norm=10.0)
    state = TrainState.create(variables, tx)
    rstate = jax.tree_util.tree_map(lambda x: replicate(mesh, x), state)
    sbatch = shard_batch(mesh, batch)
    step = make_train_step(model, tx, donate=False, mesh=mesh)
    state_s, metrics_s = step(rstate, sbatch, jax.random.PRNGKey(0), 0)

    # Manual per-device replay of the exact step_fn semantics.
    def local_loss(params, lbatch, rng_d):
        rng_sample, rng_dropout = jax.random.split(
            jax.random.fold_in(rng_d, state.step)
        )
        variables_d = {"params": params}
        if state.batch_stats:
            variables_d["batch_stats"] = state.batch_stats
        outs, mutated = model.apply(
            variables_d,
            lbatch,
            0,
            method=AnchorDiffAE.loss,
            rngs={"sample": rng_sample, "dropout": rng_dropout},
            mutable=["batch_stats"],
        )
        total, means = parse_losses(outs)
        return total, (means, mutated.get("batch_stats", {}))

    grad_fn = jax.jit(jax.value_and_grad(local_loss, has_aux=True))
    totals, all_grads, all_stats = [], [], []
    for d in range(8):
        lbatch = {k: v[d : d + 1] for k, v in batch.items()}
        rng_d = jax.random.fold_in(jax.random.PRNGKey(0), d)
        (tot, (_, stats)), grads = grad_fn(state.params, lbatch, rng_d)
        totals.append(float(tot))
        all_grads.append(grads)
        all_stats.append(stats)

    avg = lambda trees: jax.tree_util.tree_map(lambda *a: sum(a) / len(a), *trees)
    grads_m = avg(all_grads)
    total_m = float(np.mean(totals))
    updates, _ = tx.update(grads_m, state.opt_state, state.params)
    params_m = optax.apply_updates(state.params, updates)

    assert np.isclose(float(metrics_s["total_loss"]), total_m, rtol=1e-5)
    assert np.isclose(
        float(metrics_s["grad_norm"]), float(optax.global_norm(grads_m)), rtol=1e-5
    )
    flat_s = jax.tree_util.tree_flatten_with_path(state_s.params)[0]
    flat_m = jax.tree_util.tree_flatten_with_path(params_m)[0]
    for (path, a), (_, b) in zip(flat_s, flat_m):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7,
            err_msg=jax.tree_util.keystr(path),
        )
    if all_stats[0]:
        stats_m = avg(all_stats)
        flat_ss = jax.tree_util.tree_flatten_with_path(state_s.batch_stats)[0]
        flat_sm = jax.tree_util.tree_flatten_with_path(stats_m)[0]
        for (path, a), (_, b) in zip(flat_ss, flat_sm):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7,
                err_msg=jax.tree_util.keystr(path),
            )


def test_decode_sharded_equals_unsharded():
    """Sharded decode == unsharded decode, bit-comparable.

    DDIM with eta=0 plus an explicit x_T makes the reverse chain fully
    deterministic, so the per-device rng fold in the shard_map path is
    irrelevant and the two paths must agree numerically."""
    from difffacto_tpu.models import sample_generation
    from difffacto_tpu.models.anchor_diff import decode

    mesh = make_mesh()
    cfg = tiny_model_cfg()
    cfg["diffusion"]["ddim_sampling"] = True
    cfg["diffusion"]["ddim_eta"] = 0.0
    cfg["diffusion"]["ddim_nsteps"] = 5  # == tiny T
    model = AnchorDiffAE(**cfg)
    batch = tiny_batch(B=2)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sample": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = jax.jit(
        lambda r, b: model.init(r, b, 0, method=AnchorDiffAE.loss)
    )(rngs, batch)

    # Real latents from the generation path; cimle_sample_num=2 -> B=8.
    fixed_id = jnp.zeros((model.num_anchors,), jnp.float32)
    ctx, mean_pp, var_pp, seg_mask, vid, _ = model.apply(
        variables, 4, fixed_id, jnp.ones((4, 4), jnp.float32), 0,
        method=AnchorDiffAE.prepare_generation,
        rngs={"sample": jax.random.PRNGKey(5)},
    )
    x_T = jax.random.normal(jax.random.PRNGKey(6), mean_pp.shape, jnp.float32)

    kw = dict(
        ctx=ctx, variance=var_pp, seg_mask=seg_mask, valid_id=vid,
        noise=x_T, ret_traj=False,
    )
    out1 = decode(model, variables, jax.random.PRNGKey(7), mean_pp, **kw)
    out8 = decode(
        model, variables, jax.random.PRNGKey(8), mean_pp, mesh=mesh, **kw
    )
    a, b = np.asarray(out1["pred"]), np.asarray(out8["pred"])
    assert np.isfinite(a).all() and np.isfinite(b).all()
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_decode_points_sharded_equals_unsharded():
    """dp x sp decode == unsharded decode, bit-comparable.

    The 2-D ('data', 'points') mesh shards the reverse chain over BOTH the
    batch and the point-token axis (the denoiser cross-attends each point
    token to 4 replicated ctx tokens, so a point shard needs no
    collectives). DDIM eta=0 + explicit x_T removes the rng from the chain,
    so every mesh layout must agree numerically with the single-device run.
    """
    from difffacto_tpu.models.anchor_diff import decode

    cfg = tiny_model_cfg()
    cfg["diffusion"]["ddim_sampling"] = True
    cfg["diffusion"]["ddim_eta"] = 0.0
    cfg["diffusion"]["ddim_nsteps"] = 5
    model = AnchorDiffAE(**cfg)
    batch = tiny_batch(B=2)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sample": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = jax.jit(
        lambda r, b: model.init(r, b, 0, method=AnchorDiffAE.loss)
    )(rngs, batch)
    fixed_id = jnp.zeros((model.num_anchors,), jnp.float32)
    ctx, mean_pp, var_pp, seg_mask, vid, _ = model.apply(
        variables, 4, fixed_id, jnp.ones((4, 4), jnp.float32), 0,
        method=AnchorDiffAE.prepare_generation,
        rngs={"sample": jax.random.PRNGKey(5)},
    )
    x_T = jax.random.normal(jax.random.PRNGKey(6), mean_pp.shape, jnp.float32)
    kw = dict(
        ctx=ctx, variance=var_pp, seg_mask=seg_mask, valid_id=vid,
        noise=x_T, ret_traj=False,
    )
    ref = np.asarray(decode(model, variables, jax.random.PRNGKey(7), mean_pp, **kw)["pred"])
    for shape in ((2, 4), (1, 8), (4, 2)):
        mesh = make_mesh(axis_names=("data", "points"), mesh_shape=shape)
        out = decode(
            model, variables, jax.random.PRNGKey(8), mean_pp, mesh=mesh, **kw
        )
        got = np.asarray(out["pred"])
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6, err_msg=str(shape))


def test_mesh_2d_constructor():
    mesh = make_mesh(axis_names=("data", "points"), mesh_shape=(2, 4))
    assert mesh.shape["data"] == 2 and mesh.shape["points"] == 4
    # default points-only layout
    mesh = make_mesh(axis_names=("data", "points"))
    assert mesh.shape["data"] == 1 and mesh.shape["points"] == 8
    import pytest

    with pytest.raises(NotImplementedError):
        make_mesh(axis_names=("data", "model"))
    with pytest.raises(ValueError):
        make_mesh(axis_names=("data", "points"), mesh_shape=(3, 2))


def test_launcher_flag_and_initialize_distributed():
    """--launcher wiring (reference run_net.py:11-15): single-process init is
    a logged no-op, and the CLI accepts the launcher/sync_bn/local_rank
    surface."""
    import os
    import subprocess
    import sys

    from difffacto_tpu.parallel import initialize_distributed

    # Explicit single-process: early-out, no jax.distributed call.
    assert initialize_distributed(num_processes=1) is False
    # No coordinator in this environment: must not raise, returns False.
    assert initialize_distributed() is False

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/run_net.py"), "--help"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0
    for flag in ("--launcher", "--sync_bn", "--local_rank", "--save_dir"):
        assert flag in out.stdout


def test_trainable_filter_freezes():
    """train_aligner mode: only aligner params move (runner.py:76-94)."""
    model, variables, batch = init_model()
    tx = build_optimizer_from_cfg(dict(type="Adam", lr=1e-2))
    from difffacto_tpu.parallel.train import TrainState

    state = TrainState.create(variables, tx)
    is_aligner = lambda path: any("aligner" in p for p in path)
    step = make_train_step(model, tx, trainable_filter=is_aligner, donate=False)
    state1, _ = step(state, batch, jax.random.PRNGKey(0), 0)

    moved_non_aligner = 0.0
    moved_aligner = 0.0
    flat0 = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(state1.params)[0]
    for (p0, a), (p1, b) in zip(flat0, flat1):
        delta = float(jnp.abs(a - b).sum())
        path = tuple(getattr(k, "key", str(k)) for k in p0)
        if any("aligner" in s for s in path):
            moved_aligner += delta
        else:
            moved_non_aligner += delta
    assert moved_aligner > 0
    assert moved_non_aligner == 0.0


def test_slim_batch_matches_full_batch():
    """device_batch(slim_attn=True) + on-device one-hot expansion is
    bit-identical to shipping the host-built attn maps (the reference always
    ships host maps, datasets/shapenet_seg.py:526-543)."""
    from difffacto_tpu.models.anchor_diff import ensure_attn_maps
    from difffacto_tpu.runner.runner import device_batch

    model, variables, batch = init_model()
    host = {k: np.asarray(v) for k, v in batch.items()}
    slim = device_batch(host, slim_attn=True)
    assert "attn_map" not in slim and "ref_attn_map" not in slim
    assert slim["seg_mask"].dtype == jnp.int8

    expanded = ensure_attn_maps(slim)
    np.testing.assert_array_equal(np.asarray(expanded["attn_map"]), host["attn_map"])
    np.testing.assert_array_equal(
        np.asarray(expanded["ref_attn_map"]), host["ref_attn_map"]
    )
    assert expanded["seg_mask"].dtype == jnp.int32

    tx = build_optimizer_from_cfg(
        dict(type="Adam", lr=1e-3, weight_decay=0.0),
        iters_per_epoch=1,
        max_norm=10.0,
    )
    from difffacto_tpu.parallel.train import TrainState

    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, donate=False)
    rng = jax.random.PRNGKey(0)
    s_full, m_full = step(state, device_batch(host, slim_attn=False), rng, 0)
    s_slim, m_slim = step(state, slim, rng, 0)
    for k in m_full:
        np.testing.assert_allclose(
            np.asarray(m_full[k]), np.asarray(m_slim[k]), rtol=1e-6, err_msg=k
        )
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_full.params, s_slim.params
    )
    assert max(jax.tree_util.tree_leaves(deltas)) == 0.0


def test_packed_batch_matches_full_batch():
    """pack_batch (2 transfers) + in-jit unpack == per-array transfers."""
    from difffacto_tpu.runner.runner import device_batch, make_pack_spec, pack_batch
    from difffacto_tpu.parallel.train import unpack_batch

    model, variables, batch = init_model()
    host = {k: np.asarray(v) for k, v in batch.items()}
    spec = make_pack_spec(host, slim_attn=True)
    assert spec is not None
    packed = pack_batch(host, spec)
    assert set(packed) == {"f32", "i8"}
    assert packed["f32"].dtype == jnp.float32 and packed["i8"].dtype == jnp.int8

    # roundtrip: unpack reproduces every field (incl. rebuilt one-hot maps)
    un = jax.jit(lambda p: unpack_batch(p, spec))(packed)
    for k, v in host.items():
        np.testing.assert_array_equal(np.asarray(un[k]), v, err_msg=k)

    # un-packable batches (e.g. language token ids) are rejected
    assert make_pack_spec({**host, "text": np.zeros((2, 5), np.int32)}) is None

    tx = build_optimizer_from_cfg(
        dict(type="Adam", lr=1e-3, weight_decay=0.0), iters_per_epoch=1, max_norm=10.0
    )
    from difffacto_tpu.parallel.train import TrainState

    state = TrainState.create(variables, tx)
    rng = jax.random.PRNGKey(0)
    step_full = make_train_step(model, tx, donate=False)
    step_pack = make_train_step(model, tx, donate=False, pack_spec=spec)
    s1, m1 = step_full(state, device_batch(host), rng, 0)
    s2, m2 = step_pack(state, packed, rng, 0)
    for k in m1:
        np.testing.assert_allclose(
            np.asarray(m1[k]), np.asarray(m2[k]), rtol=1e-6, err_msg=k
        )
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s1.params, s2.params
    )
    assert max(jax.tree_util.tree_leaves(deltas)) == 0.0


def test_packed_batch_shard_map_runs():
    """Packed batches shard over the data axis like any other batch."""
    from difffacto_tpu.runner.runner import make_pack_spec, pack_batch

    model, variables, batch = init_model(B=8)
    host = {k: np.asarray(v) for k, v in batch.items()}
    spec = make_pack_spec(host, slim_attn=True)
    packed = pack_batch(host, spec)
    mesh = make_mesh(jax.devices())
    tx = build_optimizer_from_cfg(
        dict(type="Adam", lr=1e-3, weight_decay=0.0), iters_per_epoch=1, max_norm=10.0
    )
    from difffacto_tpu.parallel.train import TrainState

    state = TrainState.create(variables, tx)
    state = jax.tree_util.tree_map(lambda x: replicate(mesh, x), state)
    sb = shard_batch(mesh, packed)
    step = make_train_step(model, tx, donate=False, mesh=mesh, pack_spec=spec)
    s1, metrics = step(state, sb, jax.random.PRNGKey(0), 0)
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(s1.step) == 1


def _deterministic_sp_batch(B=2):
    """Batch with explicit diffusion t/noise overrides: removes the only
    per-point randomness from the loss so sequence-parallel layouts are
    numerically comparable to the single-device step."""
    batch = tiny_batch(B=B, rng=np.random.RandomState(11))
    N = batch["ref"].shape[1]
    batch["diffusion_t"] = jnp.asarray(np.random.RandomState(12).randint(0, 5, (B,)), jnp.int32)
    batch["diffusion_noise"] = jnp.asarray(
        np.random.RandomState(13).randn(B, N, 3).astype(np.float32)
    )
    return batch


def _sp_batch_specs(mesh, batch):
    from jax.sharding import PartitionSpec as P

    from difffacto_tpu.parallel.train import POINT_AXIS_BATCH_KEYS

    return {
        k: P("data", "points") if k in POINT_AXIS_BATCH_KEYS else P("data")
        for k in batch
    }


def _eval_loss_fn(model, variables):
    """value_and_grad-able eval-mode (train=False) loss: BN running stats,
    fixed rngs — deterministic per-sample math, so sharded layouts must
    reproduce it to f32 rounding."""
    from difffacto_tpu.parallel.train import parse_losses

    def loss_fn(params, lbatch):
        v = {"params": params}
        if "batch_stats" in variables:
            v["batch_stats"] = variables["batch_stats"]
        outs = model.apply(
            v, lbatch, 0, train=False,
            method=AnchorDiffAE.loss,
            rngs={"sample": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(6)},
        )
        total, _ = parse_losses(outs)
        return total

    return loss_fn


def test_sp_loss_grads_match_single_device():
    """Point-axis collectives and their TRANSPOSES are exact: eval-mode
    loss + grads on a (1, 8) 'data' x 'points' mesh == single device, tight.

    Covers the masked max-pool (all_gather + max, subgradient through the
    transpose), the per-point loss psums, and the pmean-of-grads combination
    in parallel/train.py. Eval-mode BN (train=False) keeps the comparison
    deterministic — train-mode BN batch statistics at B=2 amplify f32
    reduction-order noise ~300x per layer (var ~ eps in (x-mean)/sqrt(var+eps)),
    which is conditioning, not a sharding bug; the train-mode step is pinned
    loosely by test_sp_train_step_layout_smoke and BN stat sync tightly by
    test_bn_point_axis_sync. The reference has no sequence parallelism at all
    (SURVEY.md §2.6); this pins OUR sharding design."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from difffacto_tpu.models.anchor_diff import ensure_attn_maps
    from difffacto_tpu.parallel.axes import points_sharded

    model, variables, _ = init_model()
    batch = ensure_attn_maps(_deterministic_sp_batch(B=2))
    loss_fn = _eval_loss_fn(model, variables)

    total_ref, grads_ref = jax.jit(jax.value_and_grad(loss_fn))(
        variables["params"], batch
    )

    mesh = make_mesh(axis_names=("data", "points"), mesh_shape=(1, 8))

    def sp_local(params, lbatch):
        with points_sharded("points"):
            total, grads = jax.value_and_grad(loss_fn)(params, lbatch)
        axes = ("data", "points")
        return jax.lax.pmean(total, axes), jax.lax.pmean(grads, axes)

    sp_fn = jax.jit(
        shard_map(
            sp_local, mesh=mesh,
            in_specs=(P(), _sp_batch_specs(mesh, batch)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    total_sp, grads_sp = sp_fn(variables["params"], batch)

    assert np.isclose(float(total_sp), float(total_ref), rtol=1e-5)
    flat_a = jax.tree_util.tree_flatten_with_path(grads_sp)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(grads_ref)[0]
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_dp_sp_loss_grads_match_flat_dp():
    """(2, 4) dp x sp mesh == flat 2-device dp mesh on eval-mode loss+grads."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from difffacto_tpu.models.anchor_diff import ensure_attn_maps
    from difffacto_tpu.parallel.axes import points_sharded

    model, variables, _ = init_model(B=4)
    batch = ensure_attn_maps(_deterministic_sp_batch(B=4))
    loss_fn = _eval_loss_fn(model, variables)

    mesh_dp = make_mesh(jax.devices()[:2], axis_names=("data",))

    def dp_local(params, lbatch):
        total, grads = jax.value_and_grad(loss_fn)(params, lbatch)
        return jax.lax.pmean(total, "data"), jax.lax.pmean(grads, "data")

    total_dp, grads_dp = jax.jit(
        shard_map(
            dp_local, mesh=mesh_dp,
            in_specs=(P(), {k: P("data") for k in batch}),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )(variables["params"], batch)

    mesh_2d = make_mesh(axis_names=("data", "points"), mesh_shape=(2, 4))

    def sp_local(params, lbatch):
        with points_sharded("points"):
            total, grads = jax.value_and_grad(loss_fn)(params, lbatch)
        axes = ("data", "points")
        return jax.lax.pmean(total, axes), jax.lax.pmean(grads, axes)

    total_sp, grads_sp = jax.jit(
        shard_map(
            sp_local, mesh=mesh_2d,
            in_specs=(P(), _sp_batch_specs(mesh_2d, batch)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )(variables["params"], batch)

    assert np.isclose(float(total_sp), float(total_dp), rtol=1e-5)
    flat_a = jax.tree_util.tree_flatten_with_path(grads_sp)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(grads_dp)[0]
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_bn_point_axis_sync():
    """TorchBatchNorm under a point-sharded trace: train-mode outputs and
    the pmean-synced batch stats match the global-batch computation, and the
    gradients (combined with pmean over 'points') match the unsharded ones.

    This is the one train-mode-only collective (flax BN axis_name pmean of
    [mean, mean-of-squares]) not covered by the eval-mode grad tests above."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from difffacto_tpu.nn.layers import TorchBatchNorm
    from difffacto_tpu.parallel.axes import points_sharded

    x = np.random.RandomState(0).randn(2, 32, 8).astype(np.float32)
    bn = TorchBatchNorm(use_running_average=False)
    variables = bn.init(jax.random.PRNGKey(0), x)

    def fwd(params, xx):
        y, mut = bn.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xx, mutable=["batch_stats"],
        )
        return (y ** 2).sum(), (y, mut["batch_stats"])

    (l_ref, (y_ref, bs_ref)), g_ref = jax.jit(
        jax.value_and_grad(fwd, has_aux=True)
    )(variables["params"], x)

    mesh = make_mesh(axis_names=("data", "points"), mesh_shape=(1, 8))

    def local(params, xx):
        with points_sharded("points"):
            def f(p):
                loss, (y, bs) = fwd(p, xx)
                # per-point loss term: assemble the global value on every shard
                return jax.lax.psum(loss, "points"), (y, bs)

            (loss, (y, bs)), g = jax.value_and_grad(f, has_aux=True)(params)
        axes = ("data", "points")
        return (
            jax.lax.pmean(loss, axes),
            y,
            jax.lax.pmean(bs, axes),
            jax.lax.pmean(g, axes),
        )

    l_sp, y_sp, bs_sp, g_sp = jax.jit(
        shard_map(
            local, mesh=mesh,
            in_specs=(P(), P("data", "points")),
            out_specs=(P(), P("data", "points"), P(), P()),
            check_vma=False,
        )
    )(variables["params"], x)

    assert np.isclose(float(l_sp), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref), atol=2e-6)
    # atol 1e-5: the bias grad is analytically ZERO for this loss
    # (d/d(bias) sum(y^2) = 2*sum(y-normalized) ~ 0), so both paths return
    # f32 rounding residue around 0 and a pure-relative check is meaningless.
    for tree_a, tree_b in ((bs_sp, bs_ref), (g_sp, g_ref)):
        fa = jax.tree_util.tree_flatten_with_path(tree_a)[0]
        fb = jax.tree_util.tree_flatten_with_path(tree_b)[0]
        for (path, a), (_, b) in zip(fa, fb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
                err_msg=jax.tree_util.keystr(path),
            )


def test_sp_train_step_layout_smoke():
    """Full train-mode sp step vs single device: LOOSE tolerances by design.

    Train-mode BN at batch size 2 has per-feature variances near eps, so
    (x-mean)/sqrt(var+eps) amplifies the f32 reduction-order noise of the
    point-sharded stack (~4e-6 on h) by ~300x per BN layer — measured 1.8e-3
    relative on total_loss for a CORRECT implementation. A missing collective
    moves the loss orders of magnitude more (e.g. an unsummed fit-loss
    denominator is 8x off). The tight gates are
    test_sp_loss_grads_match_single_device and test_bn_point_axis_sync."""
    from difffacto_tpu.parallel.train import TrainState

    model, variables, _ = init_model()
    batch = _deterministic_sp_batch(B=2)
    tx = build_optimizer_from_cfg(dict(type="Adam", lr=1e-3), max_norm=10.0)
    state = TrainState.create(variables, tx)

    # Single-device reference: pre-fold the data-axis index the sharded
    # path will fold (axis_index('data') == 0 on a 1-wide data axis).
    step1 = make_train_step(model, tx, donate=False)
    rng0 = jax.random.fold_in(jax.random.PRNGKey(0), 0)
    s_ref, m_ref = step1(state, batch, rng0, 0)

    mesh = make_mesh(axis_names=("data", "points"), mesh_shape=(1, 8))
    rstate = jax.tree_util.tree_map(lambda x: replicate(mesh, x), state)
    sbatch = shard_batch(mesh, batch)
    step8 = make_train_step(model, tx, donate=False, mesh=mesh)
    s_sp, m_sp = step8(rstate, sbatch, jax.random.PRNGKey(0), 0)

    assert int(s_sp.step) == 1
    assert np.isclose(float(m_sp["total_loss"]), float(m_ref["total_loss"]), rtol=1e-2)
    for k in m_ref:
        assert np.isfinite(float(m_sp[k])), k
    # updated params stay within the Adam step envelope of the reference
    # (first-step updates are +-lr per weight; BN noise can flip signs on
    # near-zero grads, so the bound is 2*lr + slack, asserted elementwise).
    flat_a = jax.tree_util.tree_flatten_with_path(s_sp.params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(s_ref.params)[0]
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2.5e-3, rtol=0,
            err_msg=jax.tree_util.keystr(path),
        )


def test_sp_step_rejects_packed_batches():
    from difffacto_tpu.runner.runner import make_pack_spec

    import pytest

    model, variables, batch = init_model()
    host = {k: np.asarray(v) for k, v in batch.items()}
    spec = make_pack_spec(host, slim_attn=True)
    tx = build_optimizer_from_cfg(dict(type="Adam", lr=1e-3))
    mesh = make_mesh(axis_names=("data", "points"), mesh_shape=(2, 4))
    with pytest.raises(ValueError, match="pack"):
        make_train_step(model, tx, donate=False, mesh=mesh, pack_spec=spec)


def test_nonfinite_guard_skips_update():
    """A batch that produces non-finite loss/grads must leave params,
    optimizer state, and batch stats untouched (skipped_nonfinite=1); a
    healthy batch still updates (skipped_nonfinite=0)."""
    model, variables, batch = init_model()
    tx = build_optimizer_from_cfg(
        dict(type="Adam", lr=1e-3, weight_decay=0.0), iters_per_epoch=1, max_norm=10.0
    )
    from difffacto_tpu.parallel.train import TrainState

    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, donate=False)
    rng = jax.random.PRNGKey(0)

    bad = dict(batch)
    bad["input"] = batch["input"].at[0, 0, 0].set(jnp.nan)
    bad["ref"] = bad["input"]
    s_bad, m_bad = step(state, bad, rng, 0)
    assert float(m_bad["skipped_nonfinite"]) == 1.0
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, s_bad.params
    )
    assert max(jax.tree_util.tree_leaves(deltas)) == 0.0
    assert int(s_bad.step) == 1  # step counter still advances

    s_ok, m_ok = step(s_bad, batch, rng, 0)
    assert float(m_ok["skipped_nonfinite"]) == 0.0
    assert np.isfinite(float(m_ok["total_loss"]))
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_bad.params, s_ok.params
    )
    assert max(jax.tree_util.tree_leaves(deltas)) > 0.0


def test_grad_norm_spike_guard_skips_update():
    """skip_grad_norm extends the guard to finite-but-huge gradients: with a
    threshold below a healthy batch's grad norm the step is skipped (params
    untouched, skipped_nonfinite=1); with a generous threshold it updates."""
    from difffacto_tpu.parallel.train import TrainState

    model, variables, batch = init_model()
    tx = build_optimizer_from_cfg(dict(type="Adam", lr=1e-3), max_norm=10.0)
    state = TrainState.create(variables, tx)
    rng = jax.random.PRNGKey(0)

    tight = make_train_step(model, tx, donate=False, skip_grad_norm=1e-8)
    s1, m1 = tight(state, batch, rng, 0)
    assert float(m1["skipped_nonfinite"]) == 1.0
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, s1.params
    )
    assert max(jax.tree_util.tree_leaves(deltas)) == 0.0

    loose = make_train_step(model, tx, donate=False, skip_grad_norm=1e9)
    s2, m2 = loose(state, batch, rng, 0)
    assert float(m2["skipped_nonfinite"]) == 0.0
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, s2.params
    )
    assert max(jax.tree_util.tree_leaves(deltas)) > 0.0
