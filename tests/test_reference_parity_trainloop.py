"""COMPOSED training-dynamics golden vs the reference's OWN train loop.

Piecewise goldens (model forward, optimizer trajectories, schedulers) can
miss integration drift: loss-key parsing, grad-clip placement, lr stepping at
epoch boundaries, param-group selection. This file runs N COUPLED steps of
the reference's verbatim loop (runner.py:299-347: ``model(pcds) ->
parse_losses -> backward -> clip_grad_norm_(max_norm) -> Adam.step`` with the
scheduler stepped per epoch, utils/misc.py:120-132) against our production
``make_train_step`` + ``build_optimizer_from_cfg``, under identical ingested
weights and injected draws, and asserts the coupled trajectories agree.

Precision protocol (every delta below was isolated by measurement):
* both sides run float64 (``jax.enable_x64`` + ``.double()``) —
  in f32, train-mode BN batch statistics at B=2 amplify reduction-order noise
  through Adam's sign-normalizing updates and the trajectories decorrelate in
  3 steps regardless of correctness;
* the sinusoidal time embedding is injected as ONE shared f64 numpy function
  on both sides — f32 cos/sin of ~100-radian arguments differ ~3e-6 between
  libm and XLA;
* torch's F.gelu is patched to approximate='tanh' — our GEGLU uses jax's
  tanh-approximate gelu (documented delta, PARITY.md "Known deltas"), and in
  f64 the two tanh flavors agree to machine precision;
* dropout is zeroed in both configs (framework RNG cannot be matched).

With those aligned, step-0 losses agree to ~1e-14 and the first parameter
update to ~1e-12; later steps diverge EXPONENTIALLY (~x100/step, measured)
because the coupled step map is chaotic — near-zero-gradient parameters take
Adam updates whose sign is set by machine-level noise. The tolerance ladder
below encodes that: exactness where the map is still contracting, bounded
drift after. A clip-placement, loss-parsing, or lr-boundary bug fails the
step-0/1 assertions immediately (verified by mutating each during
development).
"""

import math
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_reference_parity import (  # noqa: E402
    REF_CFG,
    REF_ROOT,
    B,
    K,
    N,
    NOISE_DIM,
    _install_reference,
    _load_model_cfg,
    _make_pair,
    _zero_dropout,
)

pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REF_ROOT), reason="reference tree not present"),
    pytest.mark.slow,
]

LR = 2e-3
IPE = 2  # iters per epoch — small so 8 steps cross two scheduler milestones
SCHED = dict(type="CustomStepLR", milestone=[1, 3], gamma=0.5)


def _shared_temb_np(t_np, dim, max_period=10000.0):
    half = dim // 2
    freqs = np.exp(-math.log(max_period) * np.arange(half, dtype=np.float64) / half)
    args = t_np.astype(np.float64)[:, None] * freqs[None]
    emb = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    if dim % 2:
        emb = np.concatenate([emb, np.zeros_like(emb[:, :1])], axis=-1)
    return emb


class _F64Alignment:
    """Patches that make both frameworks compute identical f64 math
    (see module docstring); restores everything on exit."""

    def __enter__(self):
        _install_reference()
        import jax.numpy as jnp
        import torch.nn.functional as F

        import difffacto.models.diffusions.nets.attention as ref_attn
        import difffacto_tpu.models.denoiser as our_dn

        self._saved = (
            F.gelu, ref_attn.timestep_embedding, our_dn.timestep_embedding,
            torch.get_default_dtype(),
        )
        orig_gelu = F.gelu
        F.gelu = lambda x, approximate="none": orig_gelu(x, approximate="tanh")
        ref_attn.timestep_embedding = lambda t, dim, max_period=10000: torch.from_numpy(
            _shared_temb_np(t.detach().cpu().numpy(), dim, max_period)
        ).to(torch.get_default_dtype())
        orig_our_temb = our_dn.timestep_embedding

        def our_temb(t, dim, max_period=10000.0):
            try:
                tn = np.asarray(t)
            except Exception:
                # traced (model.init under jit in _make_pair) — the shared
                # embedding only matters for the eager coupled loop
                return orig_our_temb(t, dim, max_period)
            return jnp.asarray(_shared_temb_np(tn, dim, max_period))

        our_dn.timestep_embedding = our_temb
        return self

    def __exit__(self, *exc):
        import torch.nn.functional as F

        import difffacto.models.diffusions.nets.attention as ref_attn
        import difffacto_tpu.models.denoiser as our_dn

        (F.gelu, ref_attn.timestep_embedding, our_dn.timestep_embedding, dt) = self._saved
        torch.set_default_dtype(dt)
        return False


def _torch_params_in_our_layout(rm, params_tpl, stats_tpl):
    import jax

    from difffacto_tpu.utils.torch_ingest import convert_state_dict

    # .numpy() returns VIEWS aliasing the live torch parameters — without the
    # copy a mid-loop snapshot silently tracks later opt.step() mutations
    sd = {k: v.detach().numpy().copy() for k, v in rm.state_dict().items()}
    tparams, _, _, _ = convert_state_dict(
        sd, jax.device_get(params_tpl), jax.device_get(stats_tpl)
    )
    return tparams


def _max_param_diff(tree_a, tree_b):
    import jax

    fa = dict(jax.tree_util.tree_leaves_with_path(tree_a))
    worst = 0.0
    for path, b in jax.tree_util.tree_leaves_with_path(tree_b):
        worst = max(worst, float(np.abs(np.asarray(fa[path]) - np.asarray(b)).max()))
    return worst


def _run_coupled(model_cfg, steps, trainable_filter=None, torch_param_group=None,
                 max_norm=10.0, seed=21):
    """Run ``steps`` coupled iterations of both loops; return per-step records
    plus final param trees (torch converted into our layout)."""
    import jax
    import jax.numpy as jnp

    # build the pair under torch's default f32 — both sides then share
    # identical f32-representable weights (building under f64 default gives
    # torch f64-fresh inits whose f32-rounded copies on our side already
    # differ at 1e-8, visible as ~1e-4 grad-norm noise)
    pair = _make_pair(model_cfg, seed=seed)
    rm = pair["ref_model"].double().train()
    torch.set_default_dtype(torch.float64)
    model = pair["model"]
    seg, onehot = pair["seg"], pair["onehot"]
    Z = int(model_cfg["encoder"]["encoder"]["zdim"])
    T = int(rm.diffusion.num_timesteps)

    import difffacto.models.encoders.part_encoders as ref_pe
    from difffacto.utils.misc import parse_losses as ref_parse_losses
    from difffacto.utils.registry import OPTIMS as REF_OPTIMS
    from difffacto.utils.registry import SCHEDULERS as REF_SCHEDULERS
    from difffacto.utils.registry import build_from_cfg as ref_build

    from difffacto_tpu.models import part_encoder as our_pe
    from difffacto_tpu.parallel import build_optimizer_from_cfg, make_train_step
    from difffacto_tpu.parallel.train import TrainState

    # torch loop pieces, built exactly as the reference runner does
    # (runner.py:75-97): optimizer over the selected param group, scheduler
    # over the optimizer, clip over ALL model params.
    t_params = rm.parameters() if torch_param_group is None else torch_param_group(rm)
    opt = ref_build(dict(type="Adam", lr=LR, weight_decay=0.0), REF_OPTIMS, params=t_params)
    sch = ref_build(dict(SCHED), REF_SCHEDULERS, optimizer=opt)

    tx = build_optimizer_from_cfg(
        dict(type="Adam", lr=LR, weight_decay=0.0),
        scheduler_cfg=dict(SCHED), iters_per_epoch=IPE, max_norm=max_norm,
    )
    V64 = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float64)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        dict(pair["V"]),
    )
    init_params = jax.device_get(V64["params"])
    state = TrainState.create(V64, tx)
    step = make_train_step(model, tx, donate=False, trainable_filter=trainable_filter)

    rng = np.random.RandomState(seed + 10)
    t_all = rng.randint(0, T, size=(steps, B)).astype(np.int64)
    saved_j = our_pe.reparameterize_gaussian
    records = []
    params_after_first = torch_after_first = None
    for s in range(steps):
        inp = (rng.randn(B, N, 3) * 0.3).astype(np.float32)
        part_shift = (rng.randn(B, K, 3) * 0.1).astype(np.float32)
        part_scale = (np.abs(rng.randn(B, K, 3)) * 0.2 + 0.8).astype(np.float32)
        qnoise = rng.randn(B, N, 3).astype(np.float32)
        eps = rng.randn(B, K, Z).astype(np.float32)
        cnoise = rng.randn(B, NOISE_DIM).astype(np.float32)
        epoch = s // IPE

        pcds = {
            "input": torch.from_numpy(inp), "ref": torch.from_numpy(inp),
            "ref_seg_mask": torch.from_numpy(seg.astype(np.int64)),
            "seg_mask": torch.from_numpy(seg.astype(np.int64)),
            "ref_attn_map": torch.from_numpy(onehot), "attn_map": torch.from_numpy(onehot),
            "present": torch.ones(B, K), "dp_present": torch.ones(B, K),
            "part_shift": torch.from_numpy(part_shift.transpose(0, 2, 1).copy()),
            "part_scale": torch.from_numpy(part_scale.transpose(0, 2, 1).copy()),
            "noise": torch.from_numpy(cnoise),
        }
        pcds = {k: (v.double() if v.is_floating_point() else v) for k, v in pcds.items()}
        qn_queue = iter([torch.from_numpy(qnoise.transpose(0, 2, 1).copy())])
        saved = (rm.sampler.sample, ref_pe.reparameterize_gaussian, torch.randn_like)
        t_s = t_all[s]
        rm.sampler.sample = lambda bs, device=None: (torch.from_numpy(t_s), None)
        ref_pe.reparameterize_gaussian = lambda mean, logvar: (
            mean + torch.exp(0.5 * logvar) * torch.from_numpy(eps))
        torch.randn_like = lambda ten, **k: next(qn_queue).to(ten)
        try:
            # the reference loop, verbatim (runner.py:308-318, 345-347)
            opt.zero_grad()
            tloss = rm(pcds, "cpu", iter=s, epoch=epoch)
            all_loss, _ = ref_parse_losses(tloss)
            all_loss.backward()
            tnorm = torch.nn.utils.clip_grad_norm_(rm.parameters(), max_norm)
            used_lr = opt.param_groups[0]["lr"]
            opt.step()
        finally:
            rm.sampler.sample, ref_pe.reparameterize_gaussian, torch.randn_like = saved
        assert next(qn_queue, None) is None, "reference consumed != 1 q-noise draw"
        if (s + 1) % IPE == 0:
            sch.step()

        batch = {
            "input": jnp.asarray(inp, jnp.float64), "ref": jnp.asarray(inp, jnp.float64),
            "ref_seg_mask": jnp.asarray(seg, jnp.int32),
            "seg_mask": jnp.asarray(seg, jnp.int32),
            "ref_attn_map": jnp.asarray(onehot, jnp.float64),
            "attn_map": jnp.asarray(onehot, jnp.float64),
            "present": jnp.ones((B, K), jnp.float64),
            "dp_present": jnp.ones((B, K), jnp.float64),
            "part_shift": jnp.asarray(part_shift, jnp.float64),
            "part_scale": jnp.asarray(part_scale, jnp.float64),
            "noise": jnp.asarray(cnoise, jnp.float64),
            "diffusion_t": jnp.asarray(t_s, jnp.int32),
            "diffusion_noise": jnp.asarray(qnoise, jnp.float64),
        }
        our_pe.reparameterize_gaussian = lambda r, mean, logvar: (
            mean + jnp.exp(0.5 * logvar) * jnp.asarray(eps))
        try:
            with jax.disable_jit():
                state, metrics = step(state, batch, jax.random.PRNGKey(0), epoch)
        finally:
            our_pe.reparameterize_gaussian = saved_j

        records.append({
            "torch_loss": float(all_loss.detach()),
            "our_loss": float(metrics["total_loss"]),
            "torch_grad_norm": float(tnorm),
            "our_grad_norm": float(metrics["grad_norm"]),
            "torch_lr": float(used_lr),
            "skipped": float(metrics["skipped_nonfinite"]),
        })
        if s == 0:
            params_after_first = jax.device_get(state.params)
            torch_after_first = _torch_params_in_our_layout(
                rm, state.params, state.batch_stats
            )

    tfinal = _torch_params_in_our_layout(rm, state.params, state.batch_stats)
    return {
        "records": records,
        "our_final": jax.device_get(state.params),
        "torch_final": tfinal,
        "our_after_first": params_after_first,
        "torch_after_first": torch_after_first,
        "rm": rm,
        "init_params": init_params,
        "stats_tpl": jax.device_get(state.batch_stats),
    }


# Divergence ladder (see module docstring): measured step-k agreement was
# {0: ~1e-14, 1: ~1e-9, 2: ~1e-7, 3: ~2e-5, 4+: <=5e-3}; bounds carry x50+
# margin. A real integration bug (clip placement, loss parsing, lr boundary)
# breaks step 0 or 1 outright.
LOSS_TOL = {0: 1e-9, 1: 1e-6, 2: 1e-4, 3: 1e-2}
LOSS_TOL_LATE = 0.1
# grad norms amplify param noise harder than losses (sums of near-cancelling
# elements; observed ~6e-6 at step 1 from ~1e-12 param noise) — step 0 is the
# clip-placement/loss-parsing gate and stays near-exact
NORM_TOL = {0: 1e-8, 1: 1e-4, 2: 1e-2, 3: 0.1}


def _lr_expected(step_idx):
    """Our optimizer's lr at step s: LR * schedule(floor(s / IPE))."""
    from difffacto_tpu.utils.registry import SCHEDULERS

    fn = SCHEDULERS.get(SCHED["type"])(**{k: v for k, v in SCHED.items() if k != "type"})
    return LR * float(fn(step_idx // IPE))


def test_trainloop_stage1_coupled_dynamics():
    """8 coupled steps of the verbatim stage-1 config (all params, clip 10,
    CustomStepLR crossing two epoch milestones)."""
    import jax
    from jax import enable_x64

    cfg = _zero_dropout(_load_model_cfg(os.path.join(REF_CFG, "train_chair_stage1.py")))
    cfg["npoints"] = N
    with enable_x64(), _F64Alignment():
        out = _run_coupled(cfg, steps=8)

    for s, r in enumerate(out["records"]):
        assert r["skipped"] == 0.0
        rel = abs(r["torch_loss"] - r["our_loss"]) / abs(r["torch_loss"])
        assert rel < LOSS_TOL.get(s, LOSS_TOL_LATE), (s, r)
        # the grad norm is a spiky chaotic observable (measured 87% apart by
        # step 5 while losses still track within 10%) — only the first steps
        # are meaningful; step 0 is the clip-placement gate
        if s in NORM_TOL:
            nrel = abs(r["torch_grad_norm"] - r["our_grad_norm"]) / abs(r["torch_grad_norm"])
            assert nrel < NORM_TOL[s], (s, r)
        # lr trajectory: the torch scheduler stepping per epoch must equal our
        # floor(step/iters_per_epoch) schedule at every step
        assert abs(r["torch_lr"] - _lr_expected(s)) < 1e-12, (s, r)

    # the FIRST coupled update (grads -> clip(10) -> Adam) is the
    # integration contract and must match to ~f64 precision
    first = _max_param_diff(out["torch_after_first"], out["our_after_first"])
    # measured ~1.3e-8 (f64 roundoff through the clip-norm sqrt at ~274
    # global norm); an integration bug shows at >=1e-4
    assert first < 5e-8, f"first composed update diverged: {first}"
    moved = _max_param_diff(out["torch_after_first"], out["init_params"])
    assert moved > 1e-5, "first update vacuously empty"

    # final params: bounded chaotic drift (Adam per-step updates are
    # lr-bounded, so divergence cannot exceed ~2 * sum(lr_t))
    worst = _max_param_diff(out["torch_final"], out["our_final"])
    assert worst < 0.05, f"final param trajectories diverged: {worst}"



def test_trainloop_aligner_group_clip_semantics():
    """Stage-2-style train_aligner loop (gen_chair config): torch optimizer
    holds ONLY encoder.part_aligner params while clip_grad_norm_ spans ALL
    params (runner.py:75-94,313-316). max_norm=1.0 guarantees the clip is
    ACTIVE, so this fails if the clip norm were computed over the filtered
    grads instead (the pre-r5 behavior of make_train_step)."""
    from jax import enable_x64

    cfg = _zero_dropout(_load_model_cfg(os.path.join(REF_CFG, "gen_chair.py")))
    cfg["npoints"] = N
    is_aligner = lambda path: any("aligner" in p for p in path)
    with enable_x64(), _F64Alignment():
        out = _run_coupled(
            cfg, steps=3,
            trainable_filter=is_aligner,
            torch_param_group=lambda rm: rm.encoder.part_aligner.parameters(),
            max_norm=1.0,
        )

    # the clip must actually be active, or this test proves nothing
    assert out["records"][0]["torch_grad_norm"] > 1.0
    for s, r in enumerate(out["records"]):
        rel = abs(r["torch_loss"] - r["our_loss"]) / abs(r["torch_loss"])
        assert rel < LOSS_TOL.get(s, LOSS_TOL_LATE), (s, r)

    # frozen params: bit-frozen on our side
    import jax

    fa = dict(jax.tree_util.tree_leaves_with_path(out["init_params"]))
    for path, v in jax.tree_util.tree_leaves_with_path(out["our_final"]):
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        if not is_aligner(keys):
            assert np.array_equal(np.asarray(fa[path]), np.asarray(v)), keys

    # aligner params: coupled trajectory matches the reference's
    tfin = dict(jax.tree_util.tree_leaves_with_path(out["torch_final"]))
    worst = 0.0
    for path, v in jax.tree_util.tree_leaves_with_path(out["our_final"]):
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        if is_aligner(keys):
            worst = max(worst, float(np.abs(np.asarray(tfin[path]) - np.asarray(v)).max()))
    # measured: ~1.6e-6 chaotic drift over 3 coupled steps with the correct
    # full-norm clip; computing the clip from the FILTERED grads instead
    # (the pre-r5 behavior) shifts the update scale by O(1) and fails this
    # at ~1e-3+
    assert worst < 1e-4, f"aligner trajectory diverged under full-norm clip: {worst}"
