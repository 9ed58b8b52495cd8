"""Golden parity for the supseg/completion encoder family against the
reference's OWN torch classes: Pnet2Stage (encoders/pnet.py), the PCN part
encoder (encoders/PCN.py), SupSegsEncoder (encoders/super_seg_encoder.py),
MeanVarianceRegressor (encoders/mean_variance_regressor.py), the PCN
completion network (networks/PCN.py), CoarsePCN (networks/coarsePCN.py),
and ConditionalBatchNorm1d's delta-prediction path (modules/cbn.py).

Also pins three reference defects executed here:
* cbn.py:89 — CBN.forward crashes for any batch: in-place
  ``betas_cloned += delta_betas`` broadcasts (C,) += (B, C); the tuple
  return at cbn.py:104 (the lost ``*`` in ``x_hat * gamma + beta``) is
  unreachable dead code behind it;
* super_seg_encoder.py:96 — PartglotSupSegsEncoderWithCBN.forward's first
  line passes ``t`` to F.relu instead of bn1, so bn1 is called without its
  required cond argument;
* part_editing.py:60 — PartLatentEditor unconditionally loads a pickle from
  a hardcoded absolute /mnt/disk3/... path, so it cannot be built as
  shipped (its submodules are golden-tested individually in
  test_reference_parity_modules.py).
"""

import copy
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_parity import REF_ROOT, _install_reference
from test_reference_parity_modules import _params_from, _sd

from difffacto_tpu.utils.torch_ingest import TreeFiller, _conv1d_to_dense, _map_linear

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not present"
)

B, NSEG, NPT = 3, 6, 32


def _seed_bn_stats(mod):
    with torch.no_grad():
        for m in mod.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)


def _map_bn(sd, fill, tkey, jpath):
    for tname, jname, col in (
        ("weight", "scale", "params"),
        ("bias", "bias", "params"),
        ("running_mean", "mean", "batch_stats"),
        ("running_var", "var", "batch_stats"),
    ):
        fill.put(col, f"{jpath}/BatchNorm_0/{jname}", np.asarray(sd.pop(f"{tkey}.{tname}")))
    sd.pop(f"{tkey}.num_batches_tracked", None)


def _map_conv(sd, fill, tkey, jpath):
    fill.put("params", f"{jpath}/kernel", _conv1d_to_dense(sd.pop(f"{tkey}.weight")))
    fill.put("params", f"{jpath}/bias", np.asarray(sd.pop(f"{tkey}.bias")))


def _map_two_stage(sd, fill, tp_first, tp_second, jp):
    """first_conv/second_conv Sequential(Conv,BN,ReLU,Conv) pairs ->
    _TwoStage{Dense_0,BN_0,Dense_1,Dense_2,BN_1,Dense_3}."""
    _map_conv(sd, fill, f"{tp_first}.0", f"{jp}/Dense_0")
    _map_bn(sd, fill, f"{tp_first}.1", f"{jp}/TorchBatchNorm_0")
    _map_conv(sd, fill, f"{tp_first}.3", f"{jp}/Dense_1")
    _map_conv(sd, fill, f"{tp_second}.0", f"{jp}/Dense_2")
    _map_bn(sd, fill, f"{tp_second}.1", f"{jp}/TorchBatchNorm_1")
    _map_conv(sd, fill, f"{tp_second}.3", f"{jp}/Dense_3")


def _map_latent_mlp(sd, fill, tp, jp, idxs=(0, 2, 4), dense_start=0):
    for di, ti in enumerate(idxs):
        _map_linear(sd, fill, f"{tp}.{ti}", f"{jp}/Dense_{dense_start + di}")


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_pnet2stage_parity():
    """encoders/pnet.py:5-33 — incl. the GLOBAL-FIRST concat order of the
    second stage (pnet.py:31), opposite to super_seg_encoder.py:47."""
    _install_reference()
    from difffacto.models.encoders.pnet import Pnet2Stage as RefPnet

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto_tpu.models import Pnet2Stage

    torch.manual_seed(0)
    ref = RefPnet(latent_dim=64, point_dim=3).eval()
    _seed_bn_stats(ref)

    ours = Pnet2Stage(latent_dim=64, point_dim=3)
    x = _rand((B, NPT, 3), 1)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def mapper(sd, fill):
        _map_two_stage(sd, fill, "first_conv", "second_conv", "_TwoStage_0")

    V = _params_from(variables, mapper, _sd(ref))
    got = np.asarray(ours.apply(V, jnp.asarray(x)))
    want = ref(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("normalize", [False, True])
def test_pcn_part_encoder_parity(normalize):
    """encoders/PCN.py:6-67 (ENCODERS 'PCN'): per-part latents + optional
    F.normalize."""
    _install_reference()
    from difffacto.models.encoders.PCN import PCN as RefPCNEnc

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto_tpu.models.supseg_encoders import PCNPartEncoder

    torch.manual_seed(1)
    ref = RefPCNEnc(point_dim=3, part_latent_dim=32, num_anchors=4,
                    normalize_latent=normalize).eval()
    _seed_bn_stats(ref)

    ours = PCNPartEncoder(point_dim=3, part_latent_dim=32, num_anchors=4,
                          normalize_latent=normalize)
    x = _rand((B, NPT, 3), 2)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def mapper(sd, fill):
        _map_two_stage(sd, fill, "first_conv", "second_conv", "_TwoStage_0")
        _map_latent_mlp(sd, fill, "latent_mlp", "", idxs=(0, 2, 4))

    V = _params_from(variables, mapper, _sd(ref))
    got = np.asarray(ours.apply(V, jnp.asarray(x)))
    want = ref(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_supsegs_encoder_parity():
    """super_seg_encoder.py:8-77 — per-segment PointNet pooling, masked
    two-stage (LOCAL-first concat, super_seg_encoder.py:47), latent MLP."""
    _install_reference()
    from difffacto.models.encoders.super_seg_encoder import SupSegsEncoder as RefSup

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto_tpu.models import SupSegsEncoder

    torch.manual_seed(2)
    ref = RefSup(sup_segs_dim=16, part_latent_dim=24, num_anchors=4).eval()
    _seed_bn_stats(ref)

    ours = SupSegsEncoder(sup_segs_dim=16, part_latent_dim=24, num_anchors=4)
    x = _rand((B, NSEG, NPT, 3), 3)
    mask = (np.arange(NSEG)[None] < np.asarray([6, 4, 3])[:, None])
    variables = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask, np.float32)
    )

    def mapper(sd, fill):
        for i in range(4):
            _map_conv(sd, fill, f"sup_seg_enc.conv{i + 1}.0",
                      f"PartglotSupSegsEncoderBase_0/Dense_{i}")
            _map_bn(sd, fill, f"sup_seg_enc.conv{i + 1}.1",
                    f"PartglotSupSegsEncoderBase_0/TorchBatchNorm_{i}")
        _map_conv(sd, fill, "sup_seg_enc.fc", "PartglotSupSegsEncoderBase_0/Dense_4")
        _map_two_stage(sd, fill, "first_conv", "second_conv", "_TwoStage_0")
        _map_latent_mlp(sd, fill, "latent_mlp", "", idxs=(0, 2, 4))

    V = _params_from(variables, mapper, _sd(ref))
    got = np.asarray(ours.apply(V, jnp.asarray(x), jnp.asarray(mask, np.float32)))
    want = ref(torch.from_numpy(x), torch.from_numpy(mask)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_mean_variance_regressor_parity():
    """encoders/mean_variance_regressor.py:6-41 — shared Dense stacks with
    PER-CLASS BatchNorms, separate mean/var towers."""
    _install_reference()
    from difffacto.models.encoders.mean_variance_regressor import (
        MeanVarianceRegressor as RefMVR,
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto_tpu.models import MeanVarianceRegressor

    K = 4
    torch.manual_seed(3)
    ref = RefMVR(latent_dim=32, num_class=K).eval()
    _seed_bn_stats(ref)

    ours = MeanVarianceRegressor(latent_dim=32, num_class=K)
    x = _rand((B, K, 32), 4)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def mapper(sd, fill):
        for side, jside in (("m", "mean"), ("v", "var")):
            for li in range(3):
                _map_linear(sd, fill, f"fc{li + 1}_{side}", f"{jside}/Dense_{li}")
                for k in range(K):
                    _map_bn(sd, fill, f"fc_bn{li + 1}_{side}.{k}",
                            f"{jside}/TorchBatchNorm_{li * K + k}")
            _map_linear(sd, fill, f"fc4_{side}", f"{jside}/Dense_3")

    V = _params_from(variables, mapper, _sd(ref))
    got_m, got_v = ours.apply(V, jnp.asarray(x))
    want_m, want_v = ref(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(got_m), want_m.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_v), want_v.detach().numpy(), atol=2e-5)


def test_pcn_completion_network_parity():
    """networks/PCN.py:5-80 (MODELS 'PCN'): coarse MLP + folding decoder,
    incl. the fast/slow folding-seed channel order (PCN.py:43-45) and the
    [feat, seed, point_feat] concat (PCN.py:71)."""
    _install_reference()
    from difffacto.models.networks.PCN import PCN as RefPCN

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto_tpu.models.completion import PCN

    # reference defect pinned below: final_conv hardcodes 1024+3+2 input
    # channels (PCN.py:36), so the reference only runs at encoder_channel=1024
    torch.manual_seed(4)
    ref = RefPCN(num_pred=64, encoder_channel=1024, loss=dict(type="L2Loss")).eval()
    _seed_bn_stats(ref)

    ours = PCN(num_pred=64, encoder_channel=1024)
    x = _rand((B, NPT, 3), 5)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def mapper(sd, fill):
        _map_two_stage(sd, fill, "first_conv", "second_conv", "PCNEncoder_0/_TwoStage_0")
        _map_latent_mlp(sd, fill, "mlp", "", idxs=(0, 2, 4))
        _map_conv(sd, fill, "final_conv.0", "Dense_3")
        _map_bn(sd, fill, "final_conv.1", "TorchBatchNorm_0")
        _map_conv(sd, fill, "final_conv.3", "Dense_4")
        _map_bn(sd, fill, "final_conv.4", "TorchBatchNorm_1")
        _map_conv(sd, fill, "final_conv.6", "Dense_5")

    V = _params_from(variables, mapper, _sd(ref))
    got_coarse, got_fine = ours.apply(V, jnp.asarray(x))
    out = ref(None, torch.from_numpy(x), "cpu")
    np.testing.assert_allclose(
        np.asarray(got_coarse), out["coarse_pred"].detach().numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_fine), out["pred"].detach().numpy(), atol=2e-5
    )


def test_reference_pcn_encoder_channel_defect_pinned():
    """networks/PCN.py:36 hardcodes Conv1d(1024+3+2, ...) for final_conv, so
    any encoder_channel != 1024 crashes the reference forward. Ours infers
    the width; if a fixed reference lands, cross-check non-1024 widths."""
    _install_reference()
    from difffacto.models.networks.PCN import PCN as RefPCN

    torch.manual_seed(4)
    ref = RefPCN(num_pred=64, encoder_channel=128, loss=dict(type="L2Loss")).eval()
    with pytest.raises(RuntimeError):
        ref(None, torch.randn(2, NPT, 3), "cpu")


def test_coarse_pcn_parity():
    """networks/coarsePCN.py:5-49 — and its quirk: gt AND encoder input are
    BOTH pcds['pointcloud'] (coarsePCN.py:33-34), an anchor-pretrainer."""
    _install_reference()
    from difffacto.models.networks.coarsePCN import CoarsePCN as RefCoarse

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto_tpu.models import CoarsePCN

    torch.manual_seed(5)
    ref = RefCoarse(num_anchors=8, encoder_channel=128, loss=dict(type="L2Loss")).eval()
    _seed_bn_stats(ref)

    ours = CoarsePCN(num_anchors=8, encoder_channel=128)
    x = _rand((B, NPT, 3), 6)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def mapper(sd, fill):
        _map_two_stage(sd, fill, "first_conv", "second_conv", "PCNEncoder_0/_TwoStage_0")
        _map_latent_mlp(sd, fill, "mlp", "", idxs=(0, 2, 4))

    V = _params_from(variables, mapper, _sd(ref))
    got = np.asarray(ours.apply(V, jnp.asarray(x)))
    out = ref({"pointcloud": torch.from_numpy(x)}, "cpu")
    np.testing.assert_allclose(got, out["pred"].detach().numpy(), atol=2e-5)


def test_component_mixer_global_type1_parity():
    """mixer.py:228-246,283-286 — the global_mlp_type=1 aggregator (BN+ReLU
    conv stack over tokens, max-pool, BN'd MLP head). Only C == 256
    typechecks in the reference: aggregator_mlp declares its first BN as
    BatchNorm1d(part_latent_dim) on a 256-wide tensor (quirk inherited)."""
    _install_reference()
    from difffacto.models.decomposers.mixer import ComponentMixer as RefMixer

    import jax
    import jax.numpy as jnp

    from test_reference_parity_modules import (
        _map_feedforward_glu,
        _map_layernorm,
        _map_linear,
        _randomize_bn,
    )
    from difffacto_tpu.models.decomposers import ComponentMixer as OurMixer

    C = 256
    kw = dict(
        num_anchors=4, part_latent_dim=C, include_attention=True, nheads=4,
        use_graph_attention=False, include_global_feature=True,
        global_mlp_type=1, normalize_latent=False, mlp_type=0,
    )
    torch.manual_seed(20)
    rm = RefMixer(**kw).eval()
    _randomize_bn(rm, 20)
    om = OurMixer(**kw)
    lat = np.random.RandomState(21).randn(2, 4, C).astype(np.float32)
    variables = jax.jit(lambda: om.init(jax.random.PRNGKey(0), jnp.asarray(lat)))()

    def mapper(sd, fill):
        for i, ci in enumerate((0, 3, 6)):
            _map_linear(sd, fill, f"mlp.{ci}", f"mlp/Dense_{i}")
        for n in ("Wq", "Wk", "Wv"):
            _map_linear(sd, fill, f"attention.{n}", f"attention/{n}")
        _map_feedforward_glu(sd, fill, "ff", "ff")
        _map_layernorm(sd, fill, "norm1", "norm1")
        _map_layernorm(sd, fill, "norm2", "norm2")
        _map_bn(sd, fill, "aggregator.0", "agg_bn0")
        _map_conv(sd, fill, "aggregator.2", "agg_c1")
        _map_bn(sd, fill, "aggregator.3", "agg_bn1")
        _map_conv(sd, fill, "aggregator.5", "agg_c2")
        _map_linear(sd, fill, "aggregator_mlp.0", "agg_m1")
        _map_bn(sd, fill, "aggregator_mlp.1", "agg_mbn1")
        _map_linear(sd, fill, "aggregator_mlp.3", "agg_m2")
        _map_bn(sd, fill, "aggregator_mlp.4", "agg_mbn2")
        _map_linear(sd, fill, "aggregator_mlp.6", "agg_m3")

    V = _params_from(variables, mapper, _sd(rm))
    with torch.no_grad():
        tg, tc, tl = rm(torch.from_numpy(lat))
    jg, jc, jl = om.apply(V, jnp.asarray(lat))
    np.testing.assert_allclose(np.asarray(jg), tg.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(jl), tl.numpy(), atol=2e-4)


def test_cbn_delta_prediction_parity_and_forward_defect():
    """modules/cbn.py: the delta-beta/gamma MLPs ARE runnable — golden-test
    them under ingested weights — while forward itself returns a tuple
    (cbn.py:104, the lost ``*``), pinned here."""
    _install_reference()
    from difffacto.models.modules.cbn import ConditionalBatchNorm1d as RefCBN

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto_tpu.models.segmentor import ConditionalBatchNorm1d
    from difffacto_tpu.nn.layers import timestep_embedding

    C, ET, EM = 12, 16, 24
    torch.manual_seed(6)
    ref = RefCBN(C, embed_t_size=ET, emb_size=EM).eval()

    ours = ConditionalBatchNorm1d(C, embed_t_size=ET, emb_size=EM)
    t = np.asarray([3.0, 17.0, 40.0], np.float32)
    x = _rand((3, NPT, C), 7)
    cond = timestep_embedding(jnp.asarray(t), ET)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), cond)

    params = copy.deepcopy(jax.device_get(variables["params"]))
    fill = TreeFiller(params, {})
    sd = _sd(ref)
    for tp, jp in (("fc_gamma", "fc_gamma"), ("fc_beta", "fc_beta")):
        _map_linear(sd, fill, f"{tp}.0", f"{jp}_0")
        _map_linear(sd, fill, f"{tp}.2", f"{jp}_1")
    params["betas"] = np.asarray(sd.pop("betas"))
    params["gammas"] = np.asarray(sd.pop("gammas"))
    assert not sd, f"unmapped: {sorted(sd)}"

    # delta-prediction parity (create_cbn_input, cbn.py:57-68)
    d_beta, d_gamma = ref.create_cbn_input(torch.from_numpy(t))
    got = ours.apply({"params": params}, jnp.asarray(x), cond)
    # rebuild the intended output from the reference's own deltas
    xt = torch.from_numpy(x).transpose(2, 1)  # reference layout (B, C, N)
    mu = xt.mean(dim=(0, 2), keepdim=True)
    var = xt.var(dim=(0, 2), keepdim=True)
    xhat = (xt - mu) / torch.sqrt(var + ref.eps)
    gamma = (ref.gammas + d_gamma).unsqueeze(2)
    beta = (ref.betas + d_beta).unsqueeze(2)
    want = (xhat * gamma + beta).transpose(2, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)

    # the defect: reference forward crashes at cbn.py:89 — the in-place
    # ``betas_cloned += delta_betas`` broadcasts (C,) += (B, C), which torch
    # rejects for ANY batch size; the tuple-return at cbn.py:104 (the lost
    # ``*``) is therefore unreachable dead code.
    with pytest.raises(RuntimeError):
        ref(torch.from_numpy(x).transpose(2, 1), torch.from_numpy(t))


def test_reference_cbn_encoder_forward_broken_as_shipped():
    """super_seg_encoder.py:96 — ``F.relu(self.bn1(self.conv1(x)), t)``
    calls bn1 without its required cond argument -> TypeError."""
    _install_reference()
    from difffacto.models.encoders.super_seg_encoder import (
        PartglotSupSegsEncoderWithCBN as RefCBNEnc,
    )

    torch.manual_seed(7)
    ref = RefCBNEnc(sup_segs_dim=8).eval()
    with pytest.raises(TypeError):
        ref(torch.randn(2, 16, 3), torch.tensor([1.0, 2.0]))


def test_aligner_regressor_parity_and_forward_defect():
    """networks/parameter_regressor.py:12-60: golden-test the RUNNABLE
    encoder+regressor path (codes -> per-part 6-dof params) and the evident
    intended fit loss, then pin the defect that makes the reference's own
    forward unrunnable: it feeds channel-last ref (B, N, 3) against
    channel-first per-point params (B, 3, N) (parameter_regressor.py:43),
    a broadcast RuntimeError for any N != 3."""
    _install_reference()
    from difffacto.models.networks.parameter_regressor import Aligner as RefAligner

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from test_reference_parity_modules import _map_fc_head, _map_pointnet_stack
    from difffacto_tpu.models.editors import Aligner

    K, Z, N = 4, 16, NPT
    torch.manual_seed(8)
    ref = RefAligner(
        encoder=dict(type="PointNet", point_dim=3 + K, zdim=Z, num_anchors=K),
        n_class=K,
    ).eval()
    _seed_bn_stats(ref)

    ours = Aligner(encoder=dict(type="PointNet", point_dim=3 + K, zdim=Z), n_class=K)
    rng = np.random.RandomState(9)
    x = rng.randn(B, N, 3).astype(np.float32)
    seg = rng.randint(0, K, (B, N)).astype(np.int32)
    onehot = np.eye(K, dtype=np.float32)[seg]
    present = np.ones((B, K), np.float32)
    batch = {
        "ref": jnp.asarray(x),
        "ref_seg_mask": jnp.asarray(seg),
        "ref_attn_map": jnp.asarray(onehot),
        "present": jnp.asarray(present),
        "id": jnp.arange(B),
    }
    variables = ours.init(
        jax.random.PRNGKey(0), batch, method=Aligner.predict_params
    )

    def mapper(sd, fill):
        enc = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
        for k in list(sd):
            if k.startswith("encoder."):
                sd.pop(k)
        for k in list(enc):  # our PointNet owns only the m head
            if "_v." in k:
                enc.pop(k)
        _map_pointnet_stack(enc, fill, "", "encoder_mod/pnet")
        _map_fc_head(enc, fill, "m", "encoder_mod/mlp_m", linear=True)
        assert not [k for k in enc if not k.endswith("num_batches_tracked")]
        for di, ti in enumerate((0, 2, 4, 6, 8, 10)):
            _map_linear(sd, fill, f"regressor.{ti}", f"regressor/Dense_{di}")

    V = _params_from(variables, mapper, _sd(ref))
    out = ours.apply(V, batch, method=Aligner.predict_params)

    # golden: reference's own encoder + regressor submodules
    with torch.no_grad():
        inp = torch.from_numpy(np.concatenate([x, onehot], -1))
        codes = ref.encoder(inp).reshape(B, K, -1)
        ref_params = ref.regressor(codes)
    np.testing.assert_allclose(
        np.asarray(out["mean"]), ref_params[..., :3].numpy(), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["logvar"]), ref_params[..., 3:].numpy(), atol=3e-5
    )

    # intended fit loss rebuilt from the reference's params (transposed the
    # way parameter_regressor.py:41-44 evidently meant)
    from difffacto.utils.misc import gaussian_log_likelihood as ref_gll

    mean_pp = ref_params[..., :3].numpy()[np.arange(B)[:, None], seg]  # (B,N,3)
    logvar_pp = ref_params[..., 3:].numpy()[np.arange(B)[:, None], seg]
    ll = -ref_gll(
        torch.from_numpy(x), torch.from_numpy(mean_pp), torch.from_numpy(logvar_pp)
    ).mean(-1)
    flag = present[np.arange(B)[:, None], seg]
    want_fit = (ll.numpy() * flag).sum(-1) / flag.sum(-1)
    np.testing.assert_allclose(np.asarray(out["loss"]), want_fit, rtol=1e-4)

    # the defect: the reference's own forward crashes on any real cloud
    ref.train()
    pcds = {
        "ref": torch.from_numpy(x),
        "ref_seg_mask": torch.from_numpy(seg),
        "ref_attn_map": torch.from_numpy(onehot),
        "present": torch.from_numpy(present),
        "id": torch.arange(B),
    }
    with pytest.raises(RuntimeError):
        ref(pcds, device="cpu")


def test_reference_anchored_generation_broken_as_shipped():
    """networks/anchor_gen_uncond.py:12-269 — the unconditional orchestrator
    is unrunnable as shipped, three independent ways:

    1. with ``PointDiffusion`` the constructor itself crashes: the network
       force-passes ``learn_variance=False`` (anchor_gen_uncond.py:42) which
       PointDiffusion.__init__ does not accept;
    2. with ``AnchoredDiffusion`` and latent_dim != num_anchors, the train
       forward crashes at the prior loss: ``gaussian_entropy`` without
       ``dim`` sums over the ANCHOR axis and ``-log_pz - entropy``
       broadcasts (B, K) vs (B, C) (anchor_gen_uncond.py:213-215);
    3. with latent_dim == num_anchors (dodging 2), it crashes at the
       diffusion loss: NO reference diffusion's training_losses accepts the
       kwarg set passed (code= + pointwise_latent= + variance= + reduce=,
       anchor_gen_uncond.py:237).

    Our models/orchestrators_extra.AnchoredGeneration implements the evident
    intent (entropy over the latent axis; global code as ctx token with the
    per-point latent concatenated onto the denoiser input); every submodule
    it composes is individually golden-tested elsewhere in this suite."""
    _install_reference()
    from difffacto.models.networks.anchor_gen_uncond import AnchoredGeneration

    K, C, N, T = 4, 16, 32, 5
    enc = dict(type="PCN", point_dim=3 + K, part_latent_dim=C)
    reg = dict(type="MeanVarianceRegressor", latent_dim=C)
    dec = dict(
        type="ComponentMixer", part_latent_dim=C, include_attention=True,
        include_global_feature=True, nheads=4, mlp_type=0,
    )
    pw_diff = dict(
        type="PointDiffusion",
        net=dict(type="PointwiseNet", in_channels=3, out_channels=3, context_dim=C),
        beta_1=1e-4, beta_T=0.02,
    )

    # 1: unbuildable with PointDiffusion
    with pytest.raises(TypeError):
        AnchoredGeneration(
            encoder=dict(enc), decomposer=dict(dec), parameter_regressor=dict(reg),
            diffusion=dict(pw_diff), sampler=dict(type="Uniform"),
            num_anchors=K, num_timesteps=T, npoints=N, loss=dict(type="L2Loss"),
        )

    anch_diff = dict(
        type="AnchoredDiffusion",
        net=dict(type="TransformerNet", in_channels=3, out_channels=3,
                 n_heads=2, d_head=8, depth=1, context_dim=C),
        beta_1=1e-4, beta_T=0.02, mode="linear",
        model_mean_type="epsilon", model_var_type="fixed_small",
        include_anchors=False,
    )

    def _build(latent_dim):
        torch.manual_seed(9)
        e = dict(enc); e["part_latent_dim"] = latent_dim
        r = dict(reg); r["latent_dim"] = latent_dim
        d = dict(dec); d["part_latent_dim"] = latent_dim
        return AnchoredGeneration(
            encoder=e, decomposer=d, parameter_regressor=r,
            diffusion=dict(anch_diff), sampler=dict(type="Uniform"),
            num_anchors=K, num_timesteps=T, npoints=N, loss=dict(type="L2Loss"),
        ).train()

    rng = np.random.RandomState(10)
    seg = rng.randint(0, K, (2, N))
    pcds = {
        "input": torch.from_numpy(rng.randn(2, N, 3).astype(np.float32)),
        "ref": torch.from_numpy(rng.randn(2, N, 3).astype(np.float32)),
        "attn_map": torch.from_numpy(np.eye(K, dtype=np.float32)[seg]),
        "seg_mask": torch.from_numpy(seg.astype(np.int64)),
    }

    # 2: entropy broadcast crash when latent_dim != num_anchors
    with pytest.raises(RuntimeError):
        _build(latent_dim=C)(pcds, device="cpu")

    # 3: kwarg-mismatch crash at the diffusion loss when latent_dim == K
    with pytest.raises(TypeError):
        _build(latent_dim=K)(pcds, device="cpu")


def test_reference_pdm_forward_broken_as_shipped():
    """networks/point_diff.py:432-462 — PDM's train forward passes
    ``code= + pointwise_latent= + variance= + reduce=`` to
    training_losses, a kwarg set no reference diffusion accepts (same
    family as AnchoredGeneration's defect 3). Executed with
    AnchoredDiffusion; PointDiffusion rejects variance/reduce identically."""
    _install_reference()
    from difffacto.models.networks.point_diff import PDM

    K, N, T = 4, 32, 5
    torch.manual_seed(11)
    pdm = PDM(
        encoder=dict(type="PCN", point_dim=3 + K, part_latent_dim=8),
        diffusion=dict(
            type="AnchoredDiffusion",
            net=dict(type="TransformerNet", in_channels=3, out_channels=3,
                     n_heads=2, d_head=8, depth=1, context_dim=8 * K),
            beta_1=1e-4, beta_T=0.02, mode="linear",
            model_mean_type="epsilon", model_var_type="fixed_small",
            include_anchors=False,
        ),
        sampler=dict(type="Uniform"),
        num_timesteps=T, npoints=N,
    ).train()
    rng = np.random.RandomState(12)
    seg = rng.randint(0, K, (2, N))
    pcds = {
        "input": torch.from_numpy(rng.randn(2, N, 3).astype(np.float32)),
        "ref": torch.from_numpy(rng.randn(2, N, 3).astype(np.float32)),
        "attn_map": torch.from_numpy(np.eye(K, dtype=np.float32)[seg]),
        "seg_mask": torch.from_numpy(seg.astype(np.int64)),
    }
    with pytest.raises(TypeError):
        pdm(pcds, device="cpu")


def test_reference_supseg_orchestrator_forward_broken_as_shipped():
    """networks/anchor_gen_supseg.py:806-809 — AnchorDiffGenSuperSegments'
    train forward passes code= + pointwise_latent= (+variance/reduce/
    anchor_assignment) to training_losses; AnchoredDiffusion accepts none of
    the first two, PointDiffusion none of the last three — unrunnable with
    every shipped diffusion (same family as AnchoredGeneration/PDM)."""
    _install_reference()
    from difffacto.models.networks.anchor_gen_supseg import (
        AnchorDiffGenSuperSegments,
    )

    K, N, T = 4, 32, 5
    torch.manual_seed(13)
    model = AnchorDiffGenSuperSegments(
        encoder=dict(type="PCN", point_dim=3 + K, part_latent_dim=16),
        decomposer=dict(
            type="ComponentMixer", part_latent_dim=16, include_attention=True,
            include_global_feature=True, nheads=4, mlp_type=0,
        ),
        diffusion=dict(
            type="AnchoredDiffusion",
            net=dict(type="TransformerNet", in_channels=3, out_channels=3,
                     n_heads=2, d_head=8, depth=1, context_dim=16),
            beta_1=1e-4, beta_T=0.02, mode="linear",
            model_mean_type="epsilon", model_var_type="fixed_small",
            include_anchors=False,
        ),
        sampler=dict(type="Uniform"),
        num_anchors=K, num_timesteps=T, npoints=N,
        loss=dict(type="NegativeGaussianLogLikelihood"),
    ).train()
    rng = np.random.RandomState(14)
    seg = rng.randint(0, K, (2, N))
    pcds = {
        "input": torch.from_numpy(rng.randn(2, N, 3).astype(np.float32)),
        "ref": torch.from_numpy(rng.randn(2, N, 3).astype(np.float32)),
        "attn_map": torch.from_numpy(np.eye(K, dtype=np.float32)[seg]),
        "seg_mask": torch.from_numpy(seg.astype(np.int64)),
    }
    with pytest.raises(TypeError):
        model(pcds, device="cpu")


def test_reference_supseg_combine_and_drift_branches_broken_as_shipped():
    """anchor_gen_supseg.py:819-823 — the eval forward's combine and
    drift_anchors branches pass a variable ``x`` that forward never defines
    (NameError before any math); combine_latent additionally references
    undefined ``new_params``/``gts`` (anchor_gen_supseg.py:382-388). Our
    models/editors.py implements the evident intents (combine_latent,
    anchor_drift) directly on the batch."""
    _install_reference()
    from difffacto.models.networks.anchor_gen_supseg import (
        AnchorDiffGenSuperSegments,
    )

    K, N, T = 4, 32, 5
    torch.manual_seed(18)
    model = AnchorDiffGenSuperSegments(
        encoder=dict(type="PCN", point_dim=3 + K, part_latent_dim=16),
        decomposer=dict(
            type="ComponentMixer", part_latent_dim=16, include_attention=True,
            include_global_feature=True, nheads=4, mlp_type=0,
        ),
        diffusion=dict(
            type="AnchoredDiffusion",
            net=dict(type="TransformerNet", in_channels=3, out_channels=3,
                     n_heads=2, d_head=8, depth=1, context_dim=16),
            beta_1=1e-4, beta_T=0.02, mode="linear",
            model_mean_type="epsilon", model_var_type="fixed_small",
            include_anchors=False,
        ),
        sampler=dict(type="Uniform"),
        num_anchors=K, num_timesteps=T, npoints=N,
        loss=dict(type="NegativeGaussianLogLikelihood"), combine=True,
    ).eval()
    rng = np.random.RandomState(19)
    seg = rng.randint(0, K, (2, N))
    pcds = {
        "input": torch.from_numpy(rng.randn(2, N, 3).astype(np.float32)),
        "ref": torch.from_numpy(rng.randn(2, N, 3).astype(np.float32)),
        "attn_map": torch.from_numpy(np.eye(K, dtype=np.float32)[seg]),
        "seg_mask": torch.from_numpy(seg.astype(np.int64)),
        "shift": torch.zeros(2, 1, 3), "scale": torch.ones(2, 1, 1),
    }
    with pytest.raises(NameError):
        model(pcds, device="cpu")
    model.combine = False
    model.drift_anchors = True
    with pytest.raises(NameError):
        model(pcds, device="cpu")


def test_reference_partglot_orchestrator_forward_broken_as_shipped():
    """networks/anchor_gen_supseg_partglot.py:183 — AnchorDiffGenPartglot's
    train forward passes code= + pointwise_latent= (+variance/reduce) to
    training_losses, the same impossible kwarg family as the other
    secondary orchestrators."""
    _install_reference()
    from difffacto.models.networks.anchor_gen_supseg_partglot import (
        AnchorDiffGenPartglot,
    )

    K, NSEG, NPT, T = 4, 6, 16, 5
    torch.manual_seed(16)
    model = AnchorDiffGenPartglot(
        encoder=dict(type="SupSegsEncoder", sup_segs_dim=8, part_latent_dim=16),
        decomposer=dict(
            type="ComponentMixer", part_latent_dim=16, include_attention=True,
            include_global_feature=True, nheads=4, mlp_type=0,
        ),
        diffusion=dict(
            type="AnchoredDiffusion",
            net=dict(type="TransformerNet", in_channels=3, out_channels=3,
                     n_heads=2, d_head=8, depth=1, context_dim=16),
            beta_1=1e-4, beta_T=0.02, mode="linear",
            model_mean_type="epsilon", model_var_type="fixed_small",
            include_anchors=False,
        ),
        sampler=dict(type="Uniform"),
        num_anchors=K, num_timesteps=T, npoints=NSEG * NPT,
        loss=dict(type="L2Loss"),
    ).train()
    rng = np.random.RandomState(17)
    pcds = {
        "input": torch.from_numpy(rng.randn(2, NSEG, NPT, 3).astype(np.float32)),
        "ref": torch.from_numpy(rng.randn(2, NSEG, NPT, 3).astype(np.float32)),
        "attn_map": torch.from_numpy(rng.rand(2, K, NSEG).astype(np.float32)),
        "seg_mask": torch.from_numpy(rng.randint(0, K, (2, NSEG)).astype(np.int64)),
        "geo_mask": torch.ones(2, NSEG),
    }
    with pytest.raises(TypeError):
        model(pcds, device="cpu")


def test_reference_tokenizing_unrunnable_as_shipped():
    """networks/language_utils/language_util.py:11 loads word2int.pkl from a
    hardcoded absolute /orion/... path inside EVERY call — the third
    distinct hardcoded-path site in the language stack. Our
    models/language.py tokenizing takes an explicit Vocabulary."""
    _install_reference()
    from difffacto.models.networks.language_utils.language_util import tokenizing

    with pytest.raises((FileNotFoundError, OSError)):
        tokenizing("back of chair")


def test_reference_partglot_classifier_unbuildable_as_shipped():
    """listener.py:14 — PartglotClassifier loads word2int.pkl from the same
    hardcoded absolute /mnt/disk3/... path as PartLatentEditor, so the
    listener cannot be built as shipped either (our models/editors.py
    PartglotClassifier takes the part-name token ids as config instead)."""
    _install_reference()
    from difffacto.models.networks.listener import PartglotClassifier

    with pytest.raises((FileNotFoundError, OSError)):
        PartglotClassifier(
            text_dim=8, embedding_dim=8, classifier_encoder=dict(type="LSTM"),
            pcd_encoder=dict(), pcd_mixer=dict(), cross_attention=dict(),
            loss=dict(type="L2Loss"), num_part_latent=4,
            pcd_encoder_ckpt_path="/nonexistent",
            pcd_mixer_ckpt_path="/nonexistent", out_dim=8,
        )


def test_reference_partglot_finetune_is_empty_stub():
    """networks/partglot_finetune.py:30 — the reference PartglotFinetune's
    forward body is literally ``pass``: it builds submodules then returns
    None for every input. Our models/editors.py PartglotFinetune implements
    the evidently intended listener-guided finetune delegation instead."""
    _install_reference()
    from difffacto.models.networks.partglot_finetune import PartglotFinetune

    torch.manual_seed(15)
    model = PartglotFinetune(
        encoder=dict(type="PCN", point_dim=3, part_latent_dim=8),
        diffusion=dict(
            type="AnchoredDiffusion",
            net=dict(type="TransformerNet", in_channels=3, out_channels=3,
                     n_heads=2, d_head=8, depth=1, context_dim=8),
            beta_1=1e-4, beta_T=0.02, mode="linear",
            model_mean_type="epsilon", model_var_type="fixed_small",
            include_anchors=False,
        ),
        sampler=dict(type="Uniform"),
        num_anchors=4, num_timesteps=5, npoints=32,
    )
    assert model({"input": torch.zeros(2, 32, 3)}, device="cpu") is None


def test_reference_part_latent_editor_unbuildable_as_shipped():
    """part_editing.py:60 loads word2int.pkl from a hardcoded absolute
    /mnt/disk3/... path unconditionally in __init__."""
    _install_reference()
    from difffacto.models.networks.part_editing import PartLatentEditor

    with pytest.raises((FileNotFoundError, OSError)):
        PartLatentEditor(
            text_dim=8, embedding_dim=8, part_latent_dim=8,
            language_encoder=dict(type="LSTM"), latent_language_fuser=dict(),
            classifier_encoder=dict(type="LSTM"), pcd_encoder=dict(),
            pcd_mixer=dict(), cross_attention=dict(), loss=dict(type="L2Loss"),
            num_part_latent=4, pcd_encoder_ckpt_path="/nonexistent",
            pcd_mixer_ckpt_path="/nonexistent", attn_encoder_ckpt_path="/nonexistent",
            classifier_encoder_ckpt_path="/nonexistent",
            listener_mlp_ckpt_path="/nonexistent", out_dim=8,
            direction_loss=dict(type="L2Loss"), magnitude_loss=dict(type="L2Loss"),
            logit_loss=dict(type="L2Loss"),
        )
