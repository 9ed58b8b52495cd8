"""Golden numerical parity against the REFERENCE'S OWN torch code.

Every other parity test in this suite compares the JAX model against
builder-rewritten torch replicas (tests/test_torch_ingest.py); a
transcription error made twice passes those. This file instead imports the
reference's actual classes from ``/root/reference/python`` — the real
``PartEncoderForTransformerDecoder`` (part_encoders.py:1308),
``PartAlignerTransformer`` (part_encoders.py:20), ``AnchoredDiffusion``
(anchored_diffusion.py:13), ``TransformerNet`` (nets/attention.py:309),
``PointNetV2`` (pointnet.py:124) and the coupling flows (flow.py) — built
verbatim from ``configs/gen_chair.py`` / ``configs/train_chair_stage1.py``,
runs them on CPU, and asserts f32 agreement with this repo's model under the
SAME ingested weights and injected noise.

CPU enablement (the only CUDA dependency in the reference forward path is
``pointnet2_ops.pointnet2_utils.gather_operation`` — a pure index gather):

* ``pointnet2_ops`` is stubbed with a pure-torch ``gather_operation`` /
  ``furthest_point_sample`` (semantics of pointnet2_ops_lib/_ext-src/src/
  sampling_gpu.cu:8-37,70-229);
* the unused CUDA extension modules ``chamfer``/``emd`` and the absent
  ``torchdiffeq``/``plyfile`` are stubbed empty (imported at package import
  time, never called here);
* ``torch.Tensor.cuda`` is patched to a no-op — the reference hardcodes
  ``.cuda()`` in loss bookkeeping (part_encoders.py:1137,1176) even when the
  math runs on CPU.

Also cross-checks the metric suite against the reference's pure-torch
``distChamfer``/``knn``/``lgan_mmd_cov`` (datasets/evaluation_utils.py:
93-103, 205-285).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference/python"
REF_CFG = "/root/reference/configs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not present"
)

K, B, N, Z, NOISE_DIM = 4, 2, 64, 256, 32


def _install_reference():
    """Stub the CUDA-only imports and put the reference package on the path."""
    if "difffacto" in sys.modules:
        return
    p2 = types.ModuleType("pointnet2_ops")
    pu = types.ModuleType("pointnet2_ops.pointnet2_utils")

    def gather_operation(features, idx):
        # (B, C, N) gathered by (B, m) int -> (B, C, m); matches
        # pointnet2_ops_lib/_ext-src/src/sampling_gpu.cu:8-37.
        idx = idx.long().unsqueeze(1).expand(-1, features.shape[1], -1)
        return torch.gather(features, 2, idx)

    def furthest_point_sample(xyz, npoint):
        # Pure-torch FPS (sampling_gpu.cu:70-229 semantics, first point = 0).
        Bn, Nn, _ = xyz.shape
        out = torch.zeros(Bn, npoint, dtype=torch.int32)
        dist = torch.full((Bn, Nn), 1e10)
        far = torch.zeros(Bn, dtype=torch.long)
        ib = torch.arange(Bn)
        for i in range(npoint):
            out[:, i] = far.int()
            d = ((xyz - xyz[ib, far][:, None]) ** 2).sum(-1)
            dist = torch.minimum(dist, d)
            far = dist.argmax(-1)
        return out

    pu.gather_operation = gather_operation
    pu.furthest_point_sample = furthest_point_sample

    def grouping_operation(features, idx):
        # (B, C, N) grouped by (B, S, K) -> (B, C, S, K); semantics of
        # pointnet2_ops_lib/_ext-src/src/group_points_gpu.cu.
        B, C, _ = features.shape
        S, Kn = idx.shape[1], idx.shape[2]
        flat = idx.reshape(B, 1, S * Kn).expand(-1, C, -1).long()
        return torch.gather(features, 2, flat).reshape(B, C, S, Kn)

    def ball_query(radius, nsample, xyz, new_xyz):
        # The reference's OWN pure-torch spec for the CUDA ball query
        # (python/difffacto/models/encoders/pointnet2_utils.py:84-105):
        # first nsample in-radius indices in ascending index order, empty
        # slots filled with the first hit.
        B, N, _ = xyz.shape
        S = new_xyz.shape[1]
        group_idx = torch.arange(N, dtype=torch.long).view(1, 1, N).repeat(B, S, 1)
        sqrdists = ((new_xyz[:, :, None] - xyz[:, None]) ** 2).sum(-1)
        group_idx[sqrdists > radius ** 2] = N
        group_idx = group_idx.sort(dim=-1)[0][:, :, :nsample]
        group_first = group_idx[:, :, 0].view(B, S, 1).repeat(1, 1, nsample)
        mask = group_idx == N
        group_idx[mask] = group_first[mask]
        return group_idx.int()

    pu.grouping_operation = grouping_operation
    pu.ball_query = ball_query

    class QueryAndGroup(torch.nn.Module):
        """pointnet2_ops/pointnet2_utils.py:279-333, over the pure-torch ops."""

        def __init__(self, radius, nsample, use_xyz=True):
            super().__init__()
            self.radius, self.nsample, self.use_xyz = radius, nsample, use_xyz

        def forward(self, xyz, new_xyz, features=None):
            idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
            grouped_xyz = grouping_operation(xyz.transpose(1, 2).contiguous(), idx)
            grouped_xyz = grouped_xyz - new_xyz.transpose(1, 2).unsqueeze(-1)
            if features is not None:
                grouped_features = grouping_operation(features, idx)
                if self.use_xyz:
                    return torch.cat([grouped_xyz, grouped_features], dim=1)
                return grouped_features
            assert self.use_xyz
            return grouped_xyz

    class GroupAll(torch.nn.Module):
        """pointnet2_ops/pointnet2_utils.py:336-371."""

        def __init__(self, use_xyz=True):
            super().__init__()
            self.use_xyz = use_xyz

        def forward(self, xyz, new_xyz, features=None):
            grouped_xyz = xyz.transpose(1, 2).unsqueeze(2)
            if features is not None:
                grouped_features = features.unsqueeze(2)
                if self.use_xyz:
                    return torch.cat([grouped_xyz, grouped_features], dim=1)
                return grouped_features
            return grouped_xyz

    pu.QueryAndGroup = QueryAndGroup
    pu.GroupAll = GroupAll
    p2.pointnet2_utils = pu
    sys.modules["pointnet2_ops"] = p2
    sys.modules["pointnet2_ops.pointnet2_utils"] = pu
    # The REAL SA-module code (pointnet2_ops_lib/pointnet2_ops/
    # pointnet2_modules.py) over the pure-torch geometry above — its only
    # import is `from pointnet2_ops import pointnet2_utils`, satisfied by
    # the stub, so PointNet2SSG/MSG run the reference's own composition.
    import importlib.util

    _pm_path = "/root/reference/pointnet2_ops_lib/pointnet2_ops/pointnet2_modules.py"
    if os.path.isfile(_pm_path):
        spec = importlib.util.spec_from_file_location(
            "pointnet2_ops.pointnet2_modules", _pm_path
        )
        pm = importlib.util.module_from_spec(spec)
        sys.modules["pointnet2_ops.pointnet2_modules"] = pm
        spec.loader.exec_module(pm)
    else:  # no reference checkout: keep a buildable stub
        pm = types.ModuleType("pointnet2_ops.pointnet2_modules")

        class _SAStub(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        pm.PointnetSAModuleMSG = _SAStub
        pm.PointnetSAModule = _SAStub
        sys.modules["pointnet2_ops.pointnet2_modules"] = pm
    p2.pointnet2_modules = pm
    for missing in ("chamfer", "emd", "torchdiffeq", "plyfile"):
        sys.modules.setdefault(missing, types.ModuleType(missing))
    sys.modules["torchdiffeq"].odeint_adjoint = None
    sys.modules["torchdiffeq"].odeint = None
    sys.modules["plyfile"].PlyData = None
    # CPU shim: reference loss bookkeeping hardcodes .cuda() on constants.
    torch.Tensor.cuda = lambda self, *a, **k: self
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import difffacto  # noqa: F401  (registers all reference modules)


def _load_model_cfg(path):
    from difffacto_tpu.config import Config

    cfg = Config()
    cfg.load_from_file(path)
    return cfg.model.dump()


def _init_our_model(model_cfg, batch):
    import jax

    from difffacto_tpu.models import AnchorDiffAE
    from difffacto_tpu.utils.registry import MODELS, build_from_cfg

    model = build_from_cfg(dict(model_cfg), MODELS)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sample": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, 0, method=AnchorDiffAE.loss))(
        rngs, batch
    )
    return model, jax.device_get(variables)


def _template_batch(seg, onehot):
    import jax.numpy as jnp

    return {
        "input": jnp.zeros((B, N, 3), jnp.float32),
        "ref": jnp.zeros((B, N, 3), jnp.float32),
        "ref_seg_mask": jnp.asarray(seg, jnp.int32),
        "seg_mask": jnp.asarray(seg, jnp.int32),
        "ref_attn_map": jnp.asarray(onehot),
        "attn_map": jnp.asarray(onehot),
        "present": jnp.ones((B, K), jnp.float32),
        "dp_present": jnp.ones((B, K), jnp.float32),
        "part_shift": jnp.zeros((B, K, 3), jnp.float32),
        "part_scale": jnp.ones((B, K, 3), jnp.float32),
        "noise": jnp.zeros((B, NOISE_DIM), jnp.float32),
    }


def _make_pair(model_cfg, seed=0):
    """Reference model + our model from one cfg dict, SAME ingested weights."""
    _install_reference()
    from difffacto.utils.registry import MODELS as REF_MODELS
    from difffacto.utils.registry import build_from_cfg as ref_build

    from difffacto_tpu.utils.torch_ingest import convert_state_dict

    torch.manual_seed(seed)
    ref_model = ref_build(dict(model_cfg), REF_MODELS)
    ref_model.eval()
    # Non-trivial BN running stats so eval-mode BN parity is actually tested.
    with torch.no_grad():
        for mod in ref_model.modules():
            if isinstance(mod, torch.nn.BatchNorm1d):
                mod.running_mean.normal_(0, 0.02)
                mod.running_var.uniform_(0.9, 1.1)

    seg = np.repeat(np.arange(K), N // K)[None].repeat(B, 0)
    onehot = np.eye(K, dtype=np.float32)[seg]
    model, variables = _init_our_model(model_cfg, _template_batch(seg, onehot))
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params, batch_stats, leftovers, fill = convert_state_dict(
        sd, variables["params"], variables["batch_stats"]
    )
    suspicious = [k for k in leftovers if k.startswith(("encoder.", "diffusion."))]
    assert not suspicious, f"unmapped reference weights: {suspicious[:8]}"
    return {
        "ref_model": ref_model,
        "model": model,
        "V": {"params": params, "batch_stats": batch_stats},
        "seg": seg,
        "onehot": onehot,
        "model_cfg": model_cfg,
    }


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    """Reference gen_chair model + our model with the SAME ingested weights."""
    return _make_pair(_load_model_cfg(os.path.join(REF_CFG, "gen_chair.py")))


def _V(ref):
    return ref["V"]


def test_part_code_parity(ref):
    """PointNetV2 masked part codes, eval-mode BN (pointnet.py:187-213)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    pts = (rng.randn(B, N, 3) * 0.3).astype(np.float32)
    with torch.no_grad():
        tm, tv = ref["ref_model"].encoder.get_part_code(
            torch.from_numpy(pts), torch.from_numpy(ref["onehot"])
        )
    jm, jv = ref["model"].apply(
        _V(ref), jnp.asarray(pts), jnp.asarray(ref["onehot"]),
        method=lambda mod, p, a: mod.encoder_mod.encoder_net(p, a),
    )
    np.testing.assert_allclose(np.asarray(jm), tm.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), atol=1e-4)


def test_aligner_parity(ref):
    """PartAlignerTransformer incl. the pre_norm-skip quirk and part masking
    (part_encoders.py:86-143; cimle cond_noise_type=0, noise_scale=100)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    pc_cf = rng.randn(B, Z, K).astype(np.float32)  # reference is channel-first
    noise = (rng.randn(B, NOISE_DIM) * 0.01).astype(np.float32)
    valid = np.ones((B, K), np.float32)
    valid[1, 3] = 0.0  # dropped part: attention masking must match
    with torch.no_grad():
        tm, tv = ref["ref_model"].encoder.part_aligner(
            torch.from_numpy(pc_cf), torch.from_numpy(valid), noise=torch.from_numpy(noise)
        )
    jm, jv = ref["model"].apply(
        _V(ref), jnp.asarray(pc_cf.transpose(0, 2, 1)), jnp.asarray(valid),
        jnp.asarray(noise),
        method=lambda mod, p, v, n: mod.encoder_mod.aligner(p, v, noise=n),
    )
    np.testing.assert_allclose(np.asarray(jm), tm.numpy().transpose(0, 2, 1), atol=5e-4)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy().transpose(0, 2, 1), atol=5e-4)


def test_flow_parity(ref):
    """14-layer coupling flows: forward WITH logdet, and reverse
    (flow.py:7-72, wired per part at part_encoders.py:386-387)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    x = rng.randn(B, Z).astype(np.float32)
    xk = np.stack([x] * K, 1)
    jw, jdl = ref["model"].apply(
        _V(ref), jnp.asarray(xk), jnp.zeros((B, K, 1)),
        method=lambda mod, a, l: mod.encoder_mod.flow(a, l),
    )
    jxr = ref["model"].apply(
        _V(ref), jnp.asarray(xk),
        method=lambda mod, a: mod.encoder_mod.flow(a, reverse=True),
    )
    for i in range(K):
        with torch.no_grad():
            tw, tdl = ref["ref_model"].encoder.flow[i](
                torch.from_numpy(x), torch.zeros(B, 1), reverse=False
            )
            txr = ref["ref_model"].encoder.flow[i](torch.from_numpy(x), reverse=True)
        np.testing.assert_allclose(np.asarray(jw[:, i]), tw.numpy(), atol=1e-4)
        # |logdet| is O(200) with random init: relative comparison
        np.testing.assert_allclose(
            np.asarray(jdl[:, i]), tdl.numpy(), rtol=1e-5, atol=1e-3
        )
        np.testing.assert_allclose(np.asarray(jxr[:, i]), txr.numpy(), atol=1e-4)


def test_prior_loss_parity(ref):
    """Flow prior loss pieces (part_encoders.py:1143-1183). gen_chair has
    kl_weight=0, so also assert the per-part log-prob/entropy summaries."""
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    pc_means = (rng.randn(B, K, Z) * 0.1).astype(np.float32)
    pc_logvars = (rng.randn(B, K, Z) * 0.1 - 1).astype(np.float32)
    valid = np.ones((B, K), np.float32)
    with torch.no_grad():
        tp = ref["ref_model"].encoder.get_prior_loss(
            torch.from_numpy(pc_means.transpose(0, 2, 1)),
            torch.from_numpy(pc_means),
            torch.from_numpy(pc_logvars),
            torch.from_numpy(valid),
        )
    jp = ref["model"].apply(
        _V(ref), jnp.asarray(pc_means), jnp.asarray(pc_means),
        jnp.asarray(pc_logvars), jnp.asarray(valid),
        method=lambda mod, a, b, c, d: mod.encoder_mod.get_prior_loss(a, b, c, d),
    )
    for i in range(K):
        np.testing.assert_allclose(
            float(jp[f"log_p_part_{i}"]),
            float(tp[f"log_p_part_{i}"]),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            float(jp[f"entropy_{i}"]), float(tp[f"entropy_{i}"]), rtol=1e-5
        )
    np.testing.assert_allclose(float(jp["prior_loss"]), float(tp["prior_loss"]), atol=1e-6)


def _shared_diffusion_inputs(ref):
    """Deterministic mid-pipeline tensors shared by both sides."""
    rng = np.random.RandomState(4)
    seg = ref["seg"]
    part_code = rng.randn(B, K, Z).astype(np.float32)
    mean = (rng.randn(B, K, 3) * 0.1).astype(np.float32)
    logvar = (rng.randn(B, K, 3) * 0.2 - 1).astype(np.float32)
    valid = np.ones((B, K), np.float32)
    x = rng.randn(B, N, 3).astype(np.float32)
    t = np.array([0, 42], np.int64)  # covers the t==0 no-noise branch
    return seg, part_code, mean, logvar, valid, x, t, rng


def _ref_ctx_and_pp(ref, seg, part_code, mean, logvar, valid):
    segt = torch.from_numpy(seg.astype(np.int32))
    mean_cf = torch.from_numpy(mean.transpose(0, 2, 1))
    logvar_cf = torch.from_numpy(logvar.transpose(0, 2, 1))
    with torch.no_grad():
        mean_pp, logvar_pp, flag_pp = ref["ref_model"].encoder.gather_all(
            segt, anchors=mean_cf, variances=logvar_cf, valid_id=torch.from_numpy(valid)
        )
        ctx = ref["ref_model"].encoder.prepare_ctx(
            torch.from_numpy(part_code.transpose(0, 2, 1)), mean_cf, logvar_cf,
            anchor_assignments=segt,
        )
    return segt, ctx, mean_pp, logvar_pp, flag_pp


def _our_ctx_and_pp(ref, seg, part_code, mean, logvar, valid):
    import jax.numpy as jnp

    seg_j = jnp.asarray(seg, jnp.int32)
    mean_pp, logvar_pp, flag_pp = ref["model"].apply(
        _V(ref), seg_j, jnp.asarray(mean), jnp.asarray(logvar), jnp.asarray(valid),
        method=lambda mod, s, a, vv, f: mod.encoder_mod.gather_all(
            s, anchors=a, variances=vv, valid_id=f
        ),
    )
    ctx = ref["model"].apply(
        _V(ref), jnp.asarray(part_code), jnp.asarray(mean), jnp.asarray(logvar),
        method=lambda mod, a, b, c: mod.encoder_mod.prepare_ctx(a, b, c, seg_mask=seg_j),
    )
    return seg_j, ctx, mean_pp, logvar_pp, flag_pp


def test_ctx_and_fit_loss_parity(ref):
    """Token-context assembly (part_encoders.py:1317-1326) + fit loss type 4
    (part_encoders.py:514-519)."""
    seg, part_code, mean, logvar, valid, x, t, rng = _shared_diffusion_inputs(ref)
    segt, tctx, tmean_pp, tlogvar_pp, tflag_pp = _ref_ctx_and_pp(
        ref, seg, part_code, mean, logvar, valid
    )
    seg_j, jctx, jmean_pp, jlogvar_pp, jflag_pp = _our_ctx_and_pp(
        ref, seg, part_code, mean, logvar, valid
    )
    np.testing.assert_allclose(
        np.asarray(jctx), torch.cat(tctx, 1).transpose(1, 2).numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jmean_pp), tmean_pp.transpose(1, 2).numpy(), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(jflag_pp), tflag_pp[:, 0].numpy(), atol=0)

    import jax.numpy as jnp

    gt_shift = (rng.randn(B, K, 3) * 0.1).astype(np.float32)
    gt_var = (np.abs(rng.randn(B, K, 3)) * 0.3 + 0.5).astype(np.float32)
    ref_pts = rng.randn(B, N, 3).astype(np.float32)
    with torch.no_grad():
        tfl = ref["ref_model"].encoder.get_fit_loss(
            torch.from_numpy(ref_pts.transpose(0, 2, 1)),
            torch.from_numpy(mean.transpose(0, 2, 1)),
            torch.from_numpy(logvar.transpose(0, 2, 1)),
            torch.from_numpy(valid),
            tmean_pp, tlogvar_pp, tflag_pp,
            torch.from_numpy(gt_shift.transpose(0, 2, 1)),
            torch.from_numpy(gt_var.transpose(0, 2, 1)),
            segt,
        )
    jfl = ref["model"].apply(
        _V(ref), jnp.asarray(ref_pts), jnp.asarray(mean), jnp.asarray(logvar),
        jnp.asarray(valid), jmean_pp, jlogvar_pp, jflag_pp,
        jnp.asarray(gt_shift), jnp.asarray(gt_var), seg_j,
        method=lambda mod, *a: mod.encoder_mod.get_fit_loss(*a),
    )
    np.testing.assert_allclose(np.asarray(jfl), tfl.numpy(), rtol=1e-5, atol=1e-6)


def test_p_mean_variance_and_p_sample_parity(ref):
    """Full denoiser (TransformerNet, attention.py:385-440) through the
    reverse posterior (anchored_diffusion.py:227-395) and one p_sample step
    with injected noise (anchored_diffusion.py:450-484)."""
    import jax

    from difffacto_tpu.models.anchor_diff import _model_fn

    seg, part_code, mean, logvar, valid, x, t, rng = _shared_diffusion_inputs(ref)
    segt, tctx, tmean_pp, tlogvar_pp, _ = _ref_ctx_and_pp(
        ref, seg, part_code, mean, logvar, valid
    )
    seg_j, jctx, jmean_pp, jlogvar_pp, _ = _our_ctx_and_pp(
        ref, seg, part_code, mean, logvar, valid
    )
    import jax.numpy as jnp

    tvar_pp = torch.exp(tlogvar_pp)
    jvar_pp = jnp.exp(jlogvar_pp)
    x_cf = torch.from_numpy(x.transpose(0, 2, 1))
    tt = torch.from_numpy(t)
    with torch.no_grad():
        tout = ref["ref_model"].diffusion.p_mean_variance(
            x_cf, tt, tmean_pp, ctx=tctx, variance=tvar_pp,
            anchor_assignment=segt, valid_id=torch.from_numpy(valid),
        )
    mf = _model_fn(ref["model"], _V(ref))
    jdiff = ref["model"].apply(_V(ref), method=lambda mod: mod.diff)
    jout = jdiff.p_mean_variance(
        mf, jnp.asarray(x), jnp.asarray(t, jnp.int32), jmean_pp, ctx=jctx,
        variance=jvar_pp, seg_mask=seg_j, valid_id=jnp.asarray(valid),
    )
    for key in ("mean", "variance", "log_variance", "pred_xstart"):
        np.testing.assert_allclose(
            np.asarray(jout[key]), tout[key].transpose(1, 2).numpy(),
            atol=3e-4,
            err_msg=key,
        )

    # one reverse step, identical Gaussian draw on both sides
    eps = rng.randn(B, N, 3).astype(np.float32)
    randn_like = torch.randn_like
    torch.randn_like = lambda ten, **k: torch.from_numpy(eps.transpose(0, 2, 1)).to(ten)
    try:
        with torch.no_grad():
            tps = ref["ref_model"].diffusion.p_sample(
                x_cf, tt, tmean_pp, ctx=tctx, variance=tvar_pp,
                anchor_assignment=segt, valid_id=torch.from_numpy(valid),
            )
    finally:
        torch.randn_like = randn_like
    jps = jdiff.p_sample(
        mf, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t, jnp.int32),
        jmean_pp, ctx=jctx, variance=jvar_pp, seg_mask=seg_j,
        valid_id=jnp.asarray(valid), noise=jnp.asarray(eps),
    )
    np.testing.assert_allclose(
        np.asarray(jps["sample"]), tps["sample"].transpose(1, 2).numpy(), atol=3e-4
    )
    # t==0 row must be noise-free on both sides: equal to the posterior mean
    np.testing.assert_allclose(
        np.asarray(jps["sample"][0]), np.asarray(jout["mean"][0]), atol=1e-6
    )


def test_training_losses_parity(ref):
    """training_losses with injected q-noise, per-point flags from a dropped
    part (anchored_diffusion.py:760-852; gen_chair: epsilon target,
    fixed_small var, anchored per-point variance)."""
    from difffacto_tpu.models.anchor_diff import _model_fn

    seg, part_code, mean, logvar, valid, x, t, rng = _shared_diffusion_inputs(ref)
    dp_valid = np.ones((B, K), np.float32)
    dp_valid[0, 2] = 0.0
    segt, tctx, tmean_pp, tlogvar_pp, _ = _ref_ctx_and_pp(
        ref, seg, part_code, mean, logvar, valid
    )
    seg_j, jctx, jmean_pp, jlogvar_pp, _ = _our_ctx_and_pp(
        ref, seg, part_code, mean, logvar, valid
    )
    import jax.numpy as jnp

    noise = rng.randn(B, N, 3).astype(np.float32)
    tflags = torch.from_numpy(
        np.take_along_axis(dp_valid, seg, axis=1)[:, None, :].astype(np.float32)
    )
    with torch.no_grad():
        ttl = ref["ref_model"].diffusion.training_losses(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(t),
            anchors=tmean_pp,
            variance=torch.exp(tlogvar_pp),
            ctx=tctx,
            anchor_assignment=segt,
            valid_id=torch.from_numpy(dp_valid),
            flags=tflags,
            noise=torch.from_numpy(noise.transpose(0, 2, 1)),
        )
    jdiff = ref["model"].apply(_V(ref), method=lambda mod: mod.diff)
    jtl = jdiff.training_losses(
        _model_fn(ref["model"], _V(ref)),
        None,
        jnp.asarray(x),
        jnp.asarray(t, jnp.int32),
        anchors=jmean_pp,
        variance=jnp.exp(jlogvar_pp),
        ctx=jctx,
        seg_mask=seg_j,
        valid_id=jnp.asarray(dp_valid),
        flags=jnp.asarray(np.take_along_axis(dp_valid, seg, axis=1)),
        noise=jnp.asarray(noise),
    )
    np.testing.assert_allclose(
        float(jtl["mse_loss"]), float(ttl["mse_loss"]), rtol=1e-4
    )
    # gen_chair runs fixed_small variance: the reference must NOT emit a vb
    # term (learn_variance only scales the anchored kernel), and neither do we
    assert "vb_loss" not in ttl and "vb_loss" not in jtl


def test_ddim_p_sample_parity(ref):
    """DDIM branch (anchored_diffusion.py:114-126, 368-377, 480-481) at the
    gen_chair option values (nsteps=25, quad, eta=1): step subset, xt_dir
    coefficient, and one injected-noise DDIM p_sample step."""
    import jax

    from difffacto.utils.registry import DIFFUSIONS as REF_DIFFUSIONS
    from difffacto.utils.registry import build_from_cfg as ref_build

    from difffacto_tpu.models.anchor_diff import _model_fn
    from difffacto_tpu.utils.registry import DIFFUSIONS as OUR_DIFFUSIONS
    from difffacto_tpu.utils.registry import build_from_cfg as our_build

    dcfg = dict(ref["model_cfg"]["diffusion"], ddim_sampling=True)
    ref_diff = ref_build(dict(dcfg), REF_DIFFUSIONS, num_timesteps=100).eval()
    # share the trained denoiser weights with the fixture's model
    ref_diff.model.load_state_dict(ref["ref_model"].diffusion.model.state_dict())
    our_diff = our_build(dict(dcfg), OUR_DIFFUSIONS, num_timesteps=100)

    np.testing.assert_array_equal(
        np.asarray(our_diff.steps), np.asarray(ref_diff.steps)
    )
    np.testing.assert_allclose(
        np.asarray(our_diff.xt_dir_coeff),
        np.asarray(ref_diff.xt_dir_coeff, np.float32),
        rtol=1e-6,
    )

    seg, part_code, mean, logvar, valid, x, _, rng = _shared_diffusion_inputs(ref)
    t = np.array([ref_diff.steps[3], ref_diff.steps[20]], np.int64)
    segt, tctx, tmean_pp, tlogvar_pp, _ = _ref_ctx_and_pp(
        ref, seg, part_code, mean, logvar, valid
    )
    seg_j, jctx, jmean_pp, jlogvar_pp, _ = _our_ctx_and_pp(
        ref, seg, part_code, mean, logvar, valid
    )
    import jax.numpy as jnp

    eps = rng.randn(B, N, 3).astype(np.float32)
    randn_like = torch.randn_like
    torch.randn_like = lambda ten, **k: torch.from_numpy(eps.transpose(0, 2, 1)).to(ten)
    try:
        with torch.no_grad():
            tps = ref_diff.p_sample(
                torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(t),
                tmean_pp, ctx=tctx, variance=torch.exp(tlogvar_pp),
                anchor_assignment=segt, valid_id=torch.from_numpy(valid),
            )
    finally:
        torch.randn_like = randn_like
    jps = our_diff.p_sample(
        _model_fn(ref["model"], _V(ref)), jax.random.PRNGKey(0), jnp.asarray(x),
        jnp.asarray(t, jnp.int32), jmean_pp, ctx=jctx,
        variance=jnp.exp(jlogvar_pp), seg_mask=seg_j,
        valid_id=jnp.asarray(valid), noise=jnp.asarray(eps),
    )
    np.testing.assert_allclose(
        np.asarray(jps["sample"]), tps["sample"].transpose(1, 2).numpy(), atol=3e-4
    )


def _zero_dropout(node):
    """Recursively zero every ``dropout`` knob in a cfg dict (train-mode
    dropout masks are framework RNG and cannot be matched across torch/jax;
    everything else — train-mode BN batch stats, reparameterized prior,
    fit/prior/diffusion losses — is compared exactly)."""
    if isinstance(node, dict):
        return {
            k: (0.0 if k == "dropout" else _zero_dropout(v)) for k, v in node.items()
        }
    if isinstance(node, (list, tuple)):
        return type(node)(_zero_dropout(v) for v in node)
    return node


def test_whole_forward_train_parity(ref):
    """The COMPOSED training forward: reference ``AnchorDiffAE.forward``
    train branch (anchor_gen.py:970-1023) against our ``AnchorDiffAE.loss``
    — encoder reparameterization, flow prior loss, fit loss, per-point
    gather, variance-before-detach quirk, dp-flag masking, and the weighted
    diffusion MSE all composed in one call, with identical injected t /
    q-noise / reparameterization draws. Dropout is zeroed in BOTH models'
    cfgs (see _zero_dropout); all other train-mode behavior is live."""
    import copy

    import jax
    import jax.numpy as jnp

    import difffacto.models.encoders.part_encoders as ref_pe
    from difffacto_tpu.models import AnchorDiffAE
    from difffacto_tpu.models import part_encoder as our_pe

    cfg = _zero_dropout(copy.deepcopy(dict(ref["model_cfg"])))
    # The reference's dp-flag reshape hardcodes self.npoints
    # (anchor_gen.py:1017); align the model-level npoints with the test N.
    cfg["npoints"] = N
    pair = _make_pair(cfg, seed=5)
    rm = pair["ref_model"].train()
    seg, onehot = pair["seg"], pair["onehot"]
    Z_ = int(ref["model_cfg"]["encoder"]["encoder"]["zdim"])

    rng = np.random.RandomState(11)
    inp = (rng.randn(B, N, 3) * 0.3).astype(np.float32)
    refp = (rng.randn(B, N, 3) * 0.3).astype(np.float32)
    part_shift = (rng.randn(B, K, 3) * 0.1).astype(np.float32)
    part_scale = (np.abs(rng.randn(B, K, 3)) * 0.2 + 0.8).astype(np.float32)
    cimle_noise = rng.randn(B, NOISE_DIM).astype(np.float32)
    dp_present = np.ones((B, K), np.float32)
    dp_present[1, 0] = 0.0
    t_np = np.array([7, 93], np.int64)
    qnoise = rng.randn(B, N, 3).astype(np.float32)
    eps_reparam = rng.randn(B, K, Z_).astype(np.float32)

    pcds = {
        "input": torch.from_numpy(inp),
        "ref": torch.from_numpy(refp),
        "ref_seg_mask": torch.from_numpy(seg),
        "seg_mask": torch.from_numpy(seg),
        "ref_attn_map": torch.from_numpy(onehot),
        "attn_map": torch.from_numpy(onehot),
        "present": torch.from_numpy(np.ones((B, K), np.float32)),
        "dp_present": torch.from_numpy(dp_present),
        "part_shift": torch.from_numpy(part_shift.transpose(0, 2, 1).copy()),
        "part_scale": torch.from_numpy(part_scale.transpose(0, 2, 1).copy()),
        "noise": torch.from_numpy(cimle_noise),
    }

    qn_queue = iter([torch.from_numpy(qnoise.transpose(0, 2, 1).copy())])
    saved = (rm.sampler.sample, ref_pe.reparameterize_gaussian, torch.randn_like)
    rm.sampler.sample = lambda bs, device=None: (torch.from_numpy(t_np), None)
    ref_pe.reparameterize_gaussian = lambda mean, logvar: (
        mean + torch.exp(0.5 * logvar) * torch.from_numpy(eps_reparam)
    )
    torch.randn_like = lambda ten, **k: next(qn_queue).to(ten)
    try:
        tloss = rm(pcds, device="cpu", epoch=0)
    finally:
        rm.sampler.sample, ref_pe.reparameterize_gaussian, torch.randn_like = saved
    assert next(qn_queue, None) is None, "reference consumed != 1 q-noise draw"

    batch = {
        "input": jnp.asarray(inp),
        "ref": jnp.asarray(refp),
        "ref_seg_mask": jnp.asarray(seg, jnp.int32),
        "seg_mask": jnp.asarray(seg, jnp.int32),
        "ref_attn_map": jnp.asarray(onehot),
        "attn_map": jnp.asarray(onehot),
        "present": jnp.ones((B, K), jnp.float32),
        "dp_present": jnp.asarray(dp_present),
        "part_shift": jnp.asarray(part_shift),
        "part_scale": jnp.asarray(part_scale),
        "noise": jnp.asarray(cimle_noise),
        "diffusion_t": jnp.asarray(t_np, jnp.int32),
        "diffusion_noise": jnp.asarray(qnoise),
    }
    saved_j = our_pe.reparameterize_gaussian
    our_pe.reparameterize_gaussian = lambda r, mean, logvar: (
        mean + jnp.exp(0.5 * logvar) * jnp.asarray(eps_reparam)
    )
    try:
        jloss, _ = pair["model"].apply(
            pair["V"],
            batch,
            0,
            True,
            method=AnchorDiffAE.loss,
            rngs={
                "sample": jax.random.PRNGKey(3),
                "dropout": jax.random.PRNGKey(4),
            },
            mutable=["batch_stats"],
        )
    finally:
        our_pe.reparameterize_gaussian = saved_j

    common = sorted(set(tloss) & set(jloss))
    assert {"mse_loss", "fit_loss", "prior_loss"} <= set(common), common
    for key in common:
        tv = torch.as_tensor(tloss[key]).detach().numpy()
        jv = np.asarray(jloss[key])
        # Train-mode BN normalizes by batch statistics whose cross-framework
        # reduction order differs; the tiny test batch amplifies that f32
        # noise through every 1/sqrt(var) (see CLAUDE.md), so the composed
        # tolerance is looser than the eval-mode piecewise tests' 1e-5.
        np.testing.assert_allclose(
            jv.reshape(-1),
            tv.reshape(-1),
            rtol=1e-3,
            atol=1e-5,
            err_msg=key,
        )


def test_reverse_chain_decode_parity(ref):
    """FULL 100-step reverse chain through the reference's model-level
    ``decode`` glue (anchor_gen.py:145-169 over
    anchored_diffusion.py:529-588): identical x_T and per-step Gaussian
    draws on both sides -> the whole trajectory agrees, not just one step.
    This is the strongest sampling-path parity obtainable without weights:
    any drift in schedule coefficients, posterior math, or the denoiser
    compounds over 100 steps and would blow past the tolerance."""
    import jax
    import jax.numpy as jnp

    from difffacto_tpu.models.anchor_diff import _model_fn

    seg, part_code, mean, logvar, valid, _, _, rng = _shared_diffusion_inputs(ref)
    segt, tctx, tmean_pp, tlogvar_pp, _ = _ref_ctx_and_pp(
        ref, seg, part_code, mean, logvar, valid
    )
    seg_j, jctx, jmean_pp, jlogvar_pp, _ = _our_ctx_and_pp(
        ref, seg, part_code, mean, logvar, valid
    )

    T = int(ref["ref_model"].diffusion.num_timesteps)
    x_T = rng.randn(B, N, 3).astype(np.float32)
    draws = rng.randn(T, B, N, 3).astype(np.float32)

    queue = iter(
        torch.from_numpy(draws[i].transpose(0, 2, 1).copy()) for i in range(T)
    )
    randn_like = torch.randn_like
    torch.randn_like = lambda ten, **k: next(queue).to(ten)
    try:
        with torch.no_grad():
            tout = ref["ref_model"].decode(
                tmean_pp,
                ctx=tctx,
                noise=torch.from_numpy(x_T.transpose(0, 2, 1)),
                variance=torch.exp(tlogvar_pp),
                anchor_assignments=segt,
                valid_id=torch.from_numpy(valid),
                device="cpu",
            )
    finally:
        torch.randn_like = randn_like
    assert next(queue, None) is None, "reference chain consumed != T draws"

    jdiff = ref["model"].apply(_V(ref), method=lambda mod: mod.diff)
    mf = _model_fn(ref["model"], _V(ref))
    jout = jax.jit(
        lambda xT, eps: jdiff.p_sample_loop(
            mf,
            jax.random.PRNGKey(0),
            jmean_pp,
            ctx=jctx,
            variance=jnp.exp(jlogvar_pp),
            seg_mask=seg_j,
            valid_id=jnp.asarray(valid),
            noise=xT,
            step_noise=eps,
            ret_traj=True,
            ret_interval=int(ref["ref_model"].ret_interval),
        )
    )(jnp.asarray(x_T), jnp.asarray(draws))

    # gen_chair ships ret_traj=True/ret_interval=10: the reference decode dict
    # carries every 10th intermediate; compare each against our scanned traj.
    traj = np.asarray(jout["traj"])
    traj_t = [int(t) for t in jout["traj_t"]]
    checked = 0
    for tkey, tsnap in tout.items():
        if tkey == "pred" or int(tkey) >= T:
            continue
        j = traj[traj_t.index(int(tkey))]
        np.testing.assert_allclose(
            j, tsnap.numpy(), atol=3e-4, err_msg=f"traj t={tkey}"
        )
        checked += 1
    assert checked >= 9  # t = 90, 80, ..., 10
    np.testing.assert_allclose(
        np.asarray(jout["pred"]), tout["pred"].numpy(), atol=3e-4
    )


def test_reference_vb_branch_unrunnable_as_shipped(ref):
    """Pin the reference defect our _vb_terms deliberately deviates from:
    with model_var_type='learned_range' the reference's _vb_terms_bpd
    permutes a 3-D posterior variance with 4 indices
    (anchored_diffusion.py:656) and raises. No shipped config enables it.
    If a fixed reference ever lands, this test fails and the vb math should
    then be cross-checked directly (difffacto_tpu/models/diffusion.py:416)."""
    from difffacto.utils.registry import DIFFUSIONS as REF_DIFFUSIONS
    from difffacto.utils.registry import build_from_cfg as ref_build

    dcfg = dict(ref["model_cfg"]["diffusion"])
    dcfg["net"] = dict(dcfg["net"], out_channels=6)
    dcfg["model_var_type"] = "learned_range"
    torch.manual_seed(3)
    ref_diff = ref_build(dcfg, REF_DIFFUSIONS, num_timesteps=16).eval()
    seg, part_code, mean, logvar, valid, x, t, rng = _shared_diffusion_inputs(ref)
    segt, tctx, tmean_pp, tlogvar_pp, _ = _ref_ctx_and_pp(
        ref, seg, part_code, mean, logvar, valid
    )
    with pytest.raises(RuntimeError, match="permute"):
        with torch.no_grad():
            ref_diff.training_losses(
                torch.from_numpy(x.transpose(0, 2, 1)),
                torch.from_numpy(np.array([0, 5], np.int64)),
                anchors=tmean_pp,
                variance=torch.exp(tlogvar_pp),
                ctx=tctx,
                anchor_assignment=segt,
                valid_id=torch.from_numpy(valid),
                noise=torch.from_numpy(rng.randn(B, 3, N).astype(np.float32)),
            )


def test_stage1_encoder_loss_parity(ref):
    """Stage-1 config (train_chair_stage1.py): NO aligner, use_gt_params,
    kl annealing 1e-7 -> 5e-4. Compare the full encoder forward's losses and
    outputs under injected reparameterization noise."""
    _install_reference()
    import jax.numpy as jnp

    from difffacto.utils.registry import MODELS as REF_MODELS
    from difffacto.utils.registry import build_from_cfg as ref_build

    from difffacto_tpu.utils.torch_ingest import convert_state_dict

    model_cfg = _load_model_cfg(os.path.join(REF_CFG, "train_chair_stage1.py"))
    torch.manual_seed(7)
    ref_model = ref_build(dict(model_cfg), REF_MODELS).eval()
    seg = ref["seg"]
    onehot = ref["onehot"]
    model, variables = _init_our_model(model_cfg, _template_batch(seg, onehot))
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params, batch_stats, leftovers, _ = convert_state_dict(
        sd, variables["params"], variables["batch_stats"]
    )
    assert not [k for k in leftovers if k.startswith(("encoder.", "diffusion."))]
    V = {"params": params, "batch_stats": batch_stats}

    rng = np.random.RandomState(9)
    pts = (rng.randn(B, N, 3) * 0.3).astype(np.float32)
    gt_shift = (rng.randn(B, K, 3) * 0.1).astype(np.float32)
    gt_scale = (np.abs(rng.randn(B, K, 3)) * 0.3 + 0.5).astype(np.float32)
    reparam_eps = rng.randn(B, K, Z).astype(np.float32)
    pcds = {
        "input": torch.from_numpy(pts),
        "ref": torch.from_numpy(pts),
        "ref_seg_mask": torch.from_numpy(seg.astype(np.int64)),
        "ref_attn_map": torch.from_numpy(onehot),
        "attn_map": torch.from_numpy(onehot),
        "present": torch.ones(B, K),
        "part_shift": torch.from_numpy(gt_shift.transpose(0, 2, 1)),
        "part_scale": torch.from_numpy(gt_scale.transpose(0, 2, 1)),
        "noise": torch.zeros(B, NOISE_DIM),
    }
    randn_like = torch.randn_like
    torch.randn_like = lambda ten, **k: torch.from_numpy(reparam_eps).to(ten)
    try:
        with torch.no_grad():
            tctx, tmean_pp, tlogvar_pp, tflag_pp, tloss, _ = ref_model.encoder(
                pcds, "cpu", epoch=1000
            )
    finally:
        torch.randn_like = randn_like

    # our encoder: inject the identical reparameterization draw by overriding
    # the part-code sample (gen=True path draws eps via the 'sample' rng) —
    # recompute part_code = mean + std * eps from the part-code stats.
    jm, jlv = model.apply(
        V, jnp.asarray(pts), jnp.asarray(onehot),
        method=lambda mod, p, a: mod.encoder_mod.encoder_net(p, a),
    )
    part_code = np.asarray(jm) + np.exp(0.5 * np.asarray(jlv)) * reparam_eps
    jp = model.apply(
        V, jnp.asarray(part_code), jm, jlv, jnp.ones((B, K)),
        method=lambda mod, a, b, c, d: mod.encoder_mod.get_prior_loss(
            a, b, c, d, epoch=1000
        ),
    )
    np.testing.assert_allclose(
        float(jp["prior_loss"]), float(tloss["prior_loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(jp["kl_weight"]), float(tloss["kl_weight"]), rtol=1e-6
    )
    # stage-1 uses gt params: per-point anchors must be the gathered gt stats
    seg_j = jnp.asarray(seg, jnp.int32)
    jmean_pp, jlogvar_pp, _ = model.apply(
        V, seg_j, jnp.asarray(gt_shift), jnp.asarray(np.log(gt_scale**2)),
        jnp.ones((B, K)),
        method=lambda mod, s, a, vv, f: mod.encoder_mod.gather_all(
            s, anchors=a, variances=vv, valid_id=f
        ),
    )
    np.testing.assert_allclose(
        np.asarray(jmean_pp), tmean_pp.transpose(1, 2).numpy(), atol=1e-6
    )
    # reference returns logvar_pp + log_scale_var (scale_var=1 -> +0)
    np.testing.assert_allclose(
        np.asarray(jlogvar_pp), tlogvar_pp.transpose(1, 2).numpy(), atol=1e-5
    )


# --------------------------------------------------------------------------
# Mean-type / variance-type sweeps: every reverse-posterior branch of the
# reference's p_mean_variance (anchored_diffusion.py:227-395) and every
# training target (:828-838), exercised via frozen_out / a pinned model
# output so no extra weight transfer is needed.
# --------------------------------------------------------------------------

MEAN_TYPES = [
    "x_0", "prev_x", "epsilon", "drifted_epsilon1", "drifted_epsilon2",
    "drifted_epsilon3", "drifted_epsilon4", "drifted_epsilon5",
    "scaled_epsilon", "epsilon_and_anchor",
]


def _diff_pair(ref, **over):
    from difffacto.utils.registry import DIFFUSIONS as REF_DIFFUSIONS
    from difffacto.utils.registry import build_from_cfg as ref_build

    from difffacto_tpu.utils.registry import DIFFUSIONS as OUR_DIFFUSIONS
    from difffacto_tpu.utils.registry import build_from_cfg as our_build

    dcfg = dict(ref["model_cfg"]["diffusion"], **over)
    torch.manual_seed(11)
    rd = ref_build(dict(dcfg), REF_DIFFUSIONS, num_timesteps=100).eval()
    od = our_build(dict(dcfg), OUR_DIFFUSIONS, num_timesteps=100)
    return rd, od


def _pp_inputs(ref):
    """Per-point anchors/variance + shared x/t on both sides."""
    import jax.numpy as jnp

    seg, part_code, mean, logvar, valid, x, t, rng = _shared_diffusion_inputs(ref)
    segt, _, tmean_pp, tlogvar_pp, _ = _ref_ctx_and_pp(
        ref, seg, part_code, mean, logvar, valid
    )
    _, _, jmean_pp, jlogvar_pp, _ = _our_ctx_and_pp(
        ref, seg, part_code, mean, logvar, valid
    )
    return {
        "rng": rng,
        "x_cf": torch.from_numpy(x.transpose(0, 2, 1)),
        "x": jnp.asarray(x),
        "tt": torch.from_numpy(t),
        "t": jnp.asarray(t, jnp.int32),
        "tanch": tmean_pp,
        "tvar": torch.exp(tlogvar_pp),
        "janch": jmean_pp,
        "jvar": jnp.exp(jlogvar_pp),
    }


@pytest.mark.parametrize("mean_type", MEAN_TYPES)
def test_mean_type_sweep(ref, mean_type):
    """p_mean_variance branch parity for all 10 mean parameterizations —
    including the drifted_epsilon5 fallthrough QUIRK: its transform at
    anchored_diffusion.py:347-348 is dead code (the enclosing elif at :340
    only admits DR1-DR4), so DR5 samples exactly like plain epsilon."""
    rd, od = _diff_pair(ref, model_mean_type=mean_type)
    s = _pp_inputs(ref)
    C = 6 if mean_type == "epsilon_and_anchor" else 3
    frozen = s["rng"].randn(B, N, C).astype(np.float32)
    import jax.numpy as jnp

    if mean_type == "prev_x":
        # Reference QUIRK: the PREVIOUS_X branch never assigns xt_dir
        # (anchored_diffusion.py:322-326 vs :368-377), so prev_x sampling
        # CRASHES as shipped. Pin the crash; our branch returns xt_dir=None
        # and stays runnable (a fix, with no reference golden possible).
        with pytest.raises(UnboundLocalError):
            with torch.no_grad():
                rd.p_mean_variance(
                    s["x_cf"], s["tt"], s["tanch"], variance=s["tvar"],
                    frozen_out=torch.from_numpy(frozen.transpose(0, 2, 1)),
                )
        jout = od.p_mean_variance(
            None, s["x"], s["t"], s["janch"], variance=s["jvar"],
            frozen_out=jnp.asarray(frozen),
        )
        assert all(
            np.isfinite(np.asarray(jout[k])).all()
            for k in ("mean", "variance", "log_variance", "pred_xstart")
        )
        return
    with torch.no_grad():
        tout = rd.p_mean_variance(
            s["x_cf"], s["tt"], s["tanch"], variance=s["tvar"],
            frozen_out=torch.from_numpy(frozen.transpose(0, 2, 1)),
        )

    jout = od.p_mean_variance(
        None, s["x"], s["t"], s["janch"], variance=s["jvar"],
        frozen_out=jnp.asarray(frozen),
    )
    for key in ("mean", "variance", "log_variance", "pred_xstart"):
        np.testing.assert_allclose(
            np.asarray(jout[key]), tout[key].transpose(1, 2).numpy(),
            atol=1e-5, err_msg=f"{mean_type}:{key}",
        )
    if mean_type == "drifted_epsilon5":
        ep, _ = _diff_pair(ref, model_mean_type="epsilon")
        with torch.no_grad():
            eout = ep.p_mean_variance(
                s["x_cf"], s["tt"], s["tanch"], variance=s["tvar"],
                frozen_out=torch.from_numpy(frozen.transpose(0, 2, 1)),
            )
        np.testing.assert_allclose(  # the quirk itself, pinned on the ref side
            tout["pred_xstart"].numpy(), eout["pred_xstart"].numpy(), atol=0
        )


@pytest.mark.parametrize("var_type,ch", [
    ("fixed_large", 3), ("learned", 6), ("learned_range", 6),
])
def test_var_type_sweep(ref, var_type, ch):
    """Variance-mode parity: fixed_large's append(post_var[1], betas[1:])
    table and the learned/learned_range output-split scaling
    (anchored_diffusion.py:270-314)."""
    rd, od = _diff_pair(ref, model_var_type=var_type)
    s = _pp_inputs(ref)
    frozen = (s["rng"].randn(B, N, ch) * 0.3).astype(np.float32)
    with torch.no_grad():
        tout = rd.p_mean_variance(
            s["x_cf"], s["tt"], s["tanch"], variance=s["tvar"],
            frozen_out=torch.from_numpy(frozen.transpose(0, 2, 1)),
        )
    import jax.numpy as jnp

    jout = od.p_mean_variance(
        None, s["x"], s["t"], s["janch"], variance=s["jvar"],
        frozen_out=jnp.asarray(frozen),
    )
    for key in ("mean", "variance", "log_variance", "pred_xstart", "sqrt_log_variance"):
        np.testing.assert_allclose(
            np.asarray(jout[key]), tout[key].transpose(1, 2).numpy(),
            atol=1e-5, err_msg=f"{var_type}:{key}",
        )


@pytest.mark.parametrize(
    "mean_type", [m for m in MEAN_TYPES if m != "prev_x"]
)  # prev_x has no training target in the reference dict (:828-838) -> KeyError
def test_training_target_sweep(ref, mean_type):
    """training_losses target formula parity for all 9 trainable mean types
    (anchored_diffusion.py:828-847), model output pinned on both sides."""
    import jax.numpy as jnp

    rd, od = _diff_pair(ref, model_mean_type=mean_type)
    s = _pp_inputs(ref)
    C = 6 if mean_type == "epsilon_and_anchor" else 3
    fixed = (s["rng"].randn(B, N, C) * 0.1).astype(np.float32)
    noise = s["rng"].randn(B, N, 3).astype(np.float32)
    fixed_cf = torch.from_numpy(fixed.transpose(0, 2, 1))
    rd.__dict__["model"] = lambda *a, **k: fixed_cf  # bypass the net
    with torch.no_grad():
        ttl = rd.training_losses(
            s["x_cf"], s["tt"], anchors=s["tanch"],
            variance=s["tvar"], noise=torch.from_numpy(noise.transpose(0, 2, 1)),
        )
    jtl = od.training_losses(
        lambda *a, **k: jnp.asarray(fixed), None, s["x"], s["t"],
        anchors=s["janch"], variance=s["jvar"], noise=jnp.asarray(noise),
    )
    np.testing.assert_allclose(
        float(jtl["mse_loss"]), float(ttl["mse_loss"]), rtol=1e-5,
        err_msg=mean_type,
    )


@pytest.mark.parametrize("t", [0, 1, 2, 3])
def test_fit_loss_variants_parity(ref, t):
    """Fit-loss types 0-3 (part_encoders.py:489-522; type 4 is covered by
    test_ctx_and_fit_loss_parity). The sampled variants are made
    deterministic by collapsing the sampling variance: type 2 with
    logvar=-80 (sample == mean), type 3 with gt_var=1e-30 (sample ==
    gathered gt mean)."""
    import jax
    import jax.numpy as jnp

    from difffacto_tpu.utils.registry import ENCODERS as OUR_ENCODERS
    from difffacto_tpu.utils.registry import build_from_cfg as our_build

    seg, part_code, mean, logvar, valid, x, _, rng = _shared_diffusion_inputs(ref)
    segt, _, tmean_pp, tlogvar_pp, tflag_pp = _ref_ctx_and_pp(
        ref, seg, part_code, mean, logvar, valid
    )
    _, _, jmean_pp, jlogvar_pp, jflag_pp = _our_ctx_and_pp(
        ref, seg, part_code, mean, logvar, valid
    )
    if t == 2:
        logvar = np.full_like(logvar, -80.0)  # sample == mean on both sides
    gt_shift = (rng.randn(B, K, 3) * 0.1).astype(np.float32)
    gt_var = (np.abs(rng.randn(B, K, 3)) * 0.3 + 0.5).astype(np.float32)
    if t == 3:
        gt_var = np.full_like(gt_var, 1e-30)  # sample == gathered gt mean
    ref_pts = rng.randn(B, N, 3).astype(np.float32)

    renc = ref["ref_model"].encoder
    old_t = renc.fit_loss_type
    renc.fit_loss_type = t
    try:
        with torch.no_grad():
            tfl = renc.get_fit_loss(
                torch.from_numpy(ref_pts.transpose(0, 2, 1)),
                torch.from_numpy(mean.transpose(0, 2, 1)),
                torch.from_numpy(logvar.transpose(0, 2, 1)),
                torch.from_numpy(valid),
                tmean_pp, tlogvar_pp, tflag_pp,
                torch.from_numpy(gt_shift.transpose(0, 2, 1)),
                torch.from_numpy(gt_var.transpose(0, 2, 1)),
                segt,
            )
    finally:
        renc.fit_loss_type = old_t

    oenc = our_build(
        dict(ref["model_cfg"]["encoder"], fit_loss_type=t), OUR_ENCODERS
    )
    args = (
        jnp.asarray(ref_pts), jnp.asarray(mean), jnp.asarray(logvar),
        jnp.asarray(valid), jmean_pp, jlogvar_pp, jflag_pp,
        jnp.asarray(gt_shift), jnp.asarray(gt_var),
        jnp.asarray(seg, jnp.int32),
    )
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = oenc.init(rngs, *args, method="get_fit_loss")
    jfl = oenc.apply(
        variables, *args, method="get_fit_loss",
        rngs={"sample": jax.random.PRNGKey(2)},
    )
    np.testing.assert_allclose(
        np.asarray(jfl), tfl.numpy(), rtol=1e-4, atol=1e-6, err_msg=f"type {t}"
    )


def test_guidance_parity(ref):
    """Classifier-free guidance mixing (anchored_diffusion.py:263-268) with
    the real gen_chair denoiser at classifier_weight=2."""
    from difffacto_tpu.models.anchor_diff import _model_fn

    rd, od = _diff_pair(ref, guidance=True, classifier_weight=2.0)
    rd.model.load_state_dict(ref["ref_model"].diffusion.model.state_dict())
    seg, part_code, mean, logvar, valid, x, t, rng = _shared_diffusion_inputs(ref)
    segt, tctx, tmean_pp, tlogvar_pp, _ = _ref_ctx_and_pp(
        ref, seg, part_code, mean, logvar, valid
    )
    seg_j, jctx, jmean_pp, jlogvar_pp, _ = _our_ctx_and_pp(
        ref, seg, part_code, mean, logvar, valid
    )
    import jax.numpy as jnp

    with torch.no_grad():
        tout = rd.p_mean_variance(
            torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(t),
            tmean_pp, ctx=tctx, variance=torch.exp(tlogvar_pp),
            anchor_assignment=segt, valid_id=torch.from_numpy(valid),
        )
    jout = od.p_mean_variance(
        _model_fn(ref["model"], _V(ref)), jnp.asarray(x),
        jnp.asarray(t, jnp.int32), jmean_pp, ctx=jctx,
        variance=jnp.exp(jlogvar_pp), seg_mask=seg_j,
        valid_id=jnp.asarray(valid),
    )
    for key in ("mean", "pred_xstart"):
        np.testing.assert_allclose(
            np.asarray(jout[key]), tout[key].transpose(1, 2).numpy(),
            atol=6e-4, err_msg=key,
        )


# --------------------------------------------------------------------------
# Metric-suite cross-checks against the reference's pure-torch implementations
# --------------------------------------------------------------------------


def test_pairwise_chamfer_matches_reference_distchamfer(ref):
    """Our batched pairwise CD == reference distChamfer double loop
    (evaluation_utils.py:93-103, pairwise assembly :143-200)."""
    import jax.numpy as jnp

    from difffacto.datasets.evaluation_utils import distChamfer

    from difffacto_tpu.ops.chamfer import pairwise_chamfer

    rng = np.random.RandomState(11)
    S, R, Np = 5, 7, 96
    sample = rng.randn(S, Np, 3).astype(np.float32)
    refs = rng.randn(R, Np, 3).astype(np.float32)
    tmat = np.zeros((S, R), np.float32)
    with torch.no_grad():
        for i in range(S):
            for j in range(R):
                dl, dr = distChamfer(
                    torch.from_numpy(sample[i : i + 1]), torch.from_numpy(refs[j : j + 1])
                )
                tmat[i, j] = float(dl.mean() + dr.mean())
    jmat = np.asarray(pairwise_chamfer(jnp.asarray(sample), jnp.asarray(refs)))
    np.testing.assert_allclose(jmat, tmat, rtol=1e-4, atol=1e-5)


def test_knn_matches_reference(ref):
    """1-NNA accuracy: ours vs the reference's torch knn on the same
    distance matrices (evaluation_utils.py:205-242)."""
    from difffacto.datasets import evaluation_utils as ref_eval

    from difffacto_tpu.metrics.eval import knn as our_knn

    rng = np.random.RandomState(12)
    n0, n1 = 9, 11
    Mxx = rng.rand(n0, n0).astype(np.float32)
    Mxx = (Mxx + Mxx.T) / 2
    Myy = rng.rand(n1, n1).astype(np.float32)
    Myy = (Myy + Myy.T) / 2
    Mxy = rng.rand(n0, n1).astype(np.float32)
    for k in (1, 3):
        with torch.no_grad():
            tr = ref_eval.knn(
                torch.from_numpy(Mxx), torch.from_numpy(Mxy), torch.from_numpy(Myy), k
            )
        jr = our_knn(Mxx, Mxy, Myy, k=k)
        for key in ("acc", "acc_t", "acc_f", "precision", "recall"):
            np.testing.assert_allclose(jr[key], float(tr[key]), atol=1e-6, err_msg=key)


def test_lgan_mmd_cov_matches_reference(ref):
    """MMD/COV incl. the outlier-threshold quirk
    (evaluation_utils.py:245-270)."""
    from difffacto.datasets import evaluation_utils as ref_eval

    from difffacto_tpu.metrics.eval import lgan_mmd_cov as our_lgan

    rng = np.random.RandomState(13)
    dist = rng.rand(10, 12).astype(np.float32)
    dist[3, :] += 5.0
    for thresh in (1000.0, 0.5):
        with torch.no_grad():
            tr = ref_eval.lgan_mmd_cov(torch.from_numpy(dist), thresh=thresh)
        jr = our_lgan(dist, thresh=thresh)
        for key in ("lgan_mmd", "lgan_cov", "lgan_mmd_smp"):
            np.testing.assert_allclose(
                jr[key], float(tr[key]), rtol=1e-6, err_msg=f"{key}@{thresh}"
            )


def test_cimle_sample_noise_selection_parity(ref):
    """CIMLE noise caching: the reference's own ``encoder.sample_noise``
    (part_encoders.py:389-415 — best-of-num by fit loss over reparameterized
    codes and aligner outputs) and the model-level ``cache_noise`` gather
    (anchor_gen.py:805-811) vs our ``sample_noise_candidates`` +
    ``select_best_noise`` under identical injected draws. This is the
    mechanism the Runner replays every cimle_cache_interval epochs — the
    selection ids must agree, not just the scores."""
    import jax
    import jax.numpy as jnp

    import difffacto.models.encoders.part_encoders as ref_pe
    from difffacto_tpu.models import part_encoder as our_pe
    from difffacto_tpu.models.anchor_diff import AnchorDiffAE, select_best_noise

    rm = ref["ref_model"].eval()
    seg, onehot = ref["seg"], ref["onehot"]
    Z_ = int(ref["model_cfg"]["encoder"]["encoder"]["zdim"])
    noise_dim = int(rm.encoder.part_aligner.noise_dim)
    num = 6

    rng = np.random.RandomState(23)
    inp = (rng.randn(B, N, 3) * 0.3).astype(np.float32)
    part_shift = (rng.randn(B, K, 3) * 0.1).astype(np.float32)
    part_scale = (np.abs(rng.randn(B, K, 3)) * 0.2 + 0.8).astype(np.float32)
    eps_reparam = rng.randn(B, K, Z_).astype(np.float32)
    noise_inj = rng.randn(B * num, noise_dim).astype(np.float32)

    pcds = {
        "input": torch.from_numpy(inp),
        "ref": torch.from_numpy(inp),
        "ref_seg_mask": torch.from_numpy(seg.astype(np.int64)),
        "attn_map": torch.from_numpy(onehot),
        "present": torch.ones(B, K),
        "part_shift": torch.from_numpy(part_shift.transpose(0, 2, 1).copy()),
        "part_scale": torch.from_numpy(part_scale.transpose(0, 2, 1).copy()),
    }
    saved = (ref_pe.reparameterize_gaussian, torch.randn)
    ref_pe.reparameterize_gaussian = lambda mean, logvar: (
        mean + torch.exp(0.5 * logvar) * torch.from_numpy(eps_reparam)
    )
    torch.randn = lambda *shape, **k: torch.from_numpy(noise_inj.reshape(shape))
    saved_num = rm.sample_noise_num
    rm.sample_noise_num = num  # cache_noise draws self.sample_noise_num
    try:
        with torch.no_grad():
            tnoise, tid = rm.encoder.sample_noise(pcds, "cpu", num)
            tselected = rm.cache_noise(pcds, "cpu", eval_whole=False)
    finally:
        ref_pe.reparameterize_gaussian, torch.randn = saved
        rm.sample_noise_num = saved_num
    assert tnoise.shape == (B, num, noise_dim)

    batch = {
        "input": jnp.asarray(inp),
        "ref": jnp.asarray(inp),
        "ref_seg_mask": jnp.asarray(seg, jnp.int32),
        "seg_mask": jnp.asarray(seg, jnp.int32),
        "ref_attn_map": jnp.asarray(onehot),
        "attn_map": jnp.asarray(onehot),
        "present": jnp.ones((B, K), jnp.float32),
        "part_shift": jnp.asarray(part_shift),
        "part_scale": jnp.asarray(part_scale),
    }
    saved_j = (our_pe.reparameterize_gaussian, jax.random.normal)
    orig_normal = jax.random.normal
    our_pe.reparameterize_gaussian = lambda r, mean, logvar: (
        mean + jnp.exp(0.5 * logvar) * jnp.asarray(eps_reparam)
    )

    def fake_normal(key, shape, *a, **k):
        if tuple(shape) == (B * num, noise_dim):
            return jnp.asarray(noise_inj)
        return orig_normal(key, shape, *a, **k)

    jax.random.normal = fake_normal
    try:
        jnoise, jfit = ref["model"].apply(
            _V(ref), batch, num,
            method=AnchorDiffAE.sample_noise_candidates,
            rngs={"sample": jax.random.PRNGKey(0)},
        )
        _, jbest, jselected = select_best_noise(
            ref["model"], _V(ref), jax.random.PRNGKey(0), batch, num=num
        )
    finally:
        our_pe.reparameterize_gaussian, jax.random.normal = saved_j

    np.testing.assert_allclose(np.asarray(jnoise), tnoise.numpy(), atol=1e-6)
    # selection ids must match exactly; the fit scores to f32 tolerance
    np.testing.assert_array_equal(np.asarray(jbest), tid.numpy())
    np.testing.assert_allclose(
        np.asarray(jselected), tselected.numpy(), atol=1e-6,
        err_msg="cache_noise selected-noise gather diverged",
    )
