"""Golden numerical parity for SECONDARY model families against the
reference's own torch classes (companion to tests/test_reference_parity.py,
which covers the flagship gen_chair path).

Covered here, each built from the reference source and compared under
ingested weights + injected inputs:

* PartAlignerTransformer CIMLE noise modes 0-4 + add_class_cond
  (part_encoders.py:20-143) — the flagship file only exercises mode 0;
* PointwiseNet / PointwiseNetLatent concat-squash denoisers
  (nets/pointwisenet.py:9-100) with global AND per-point contexts;
* LDMNet latent denoiser (nets/attention.py:443-546), time-as-token and
  time-as-bias variants;
* PointDiffusion end to end: training_losses + one injected-noise p_sample
  (point_diffusion.py:17-517) through the shared PointwiseNet weights;
* Generator / Discriminator latent-GAN MLPs (generators/generator.py:18-70,
  discriminators/discriminator.py:7-60) incl. eval-mode BatchNorm;
* the PointNet encoder family (pointnet.py:61-425): VAE/PointNet whole-cloud
  encoders, V2 shared heads (BN + LN flavors), V2Variant, V2VAE, V3;
* decomposers: ComponentMixer with GAT / MultiHeadSelfAttention mixing and
  both anchor-MLP types (mixer.py:88-295, common.py:28-109), and the
  PartCodeTransformer ViT (transformer.py:26-259);
* language stack: LSTM + bilinear word attention, MultiHeadCrossAttention,
  LatentLanguageFuser, PartLanguageSelector (language_encoders.py);
* pinned reference DEFECTS we deliberately deviate from — see PARITY.md
  "Reference defects EXECUTED and pinned".
"""

import copy
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_parity import REF_ROOT, _install_reference

from difffacto_tpu.utils.torch_ingest import (
    TreeFiller,
    _conv1d_to_dense,
    _map_feedforward_glu,
    _map_head_mlp,
    _map_layernorm,
    _map_linear,
    _map_pointnet_stack,
    _map_transformer_like,
    _t,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not present"
)

K, B, Z, ND = 4, 3, 16, 8
HEADS, DH, DEPTH = 2, 8, 2
INNER = HEADS * DH


def _params_from(variables, mapper, sd):
    """Deep-copy our init tree, overwrite it from the torch state dict, and
    assert every torch tensor was consumed."""
    import jax

    variables = jax.device_get(variables)
    params = copy.deepcopy(variables["params"])
    bstats = copy.deepcopy(variables.get("batch_stats", {}))
    fill = TreeFiller(params, bstats)
    sd = dict(sd)
    mapper(sd, fill)
    leftover = [k for k in sd if not k.endswith("num_batches_tracked")]
    assert not leftover, f"unmapped torch weights: {leftover[:8]}"
    out = {"params": params}
    if bstats:
        out["batch_stats"] = bstats
    return out


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _map_block_adaln(sd, fill, tp, jp):
    """BasicTransformerBlock with adaln (attention.py:283-306) — the generic
    (non-fused) layout: attn2/norm2/norm3/emb_layers/ff submodules."""
    _map_layernorm(sd, fill, f"{tp}.norm2", f"{jp}/norm2")
    _map_layernorm(sd, fill, f"{tp}.norm3", f"{jp}/norm3")
    for p in ("to_q", "to_k", "to_v"):
        _map_linear(sd, fill, f"{tp}.attn2.{p}", f"{jp}/attn2/{p}", bias=False)
    _map_linear(sd, fill, f"{tp}.attn2.to_out.0", f"{jp}/attn2/to_out")
    _map_linear(sd, fill, f"{tp}.emb_layers.1", f"{jp}/emb_layers")
    _map_feedforward_glu(sd, fill, f"{tp}.ff", f"{jp}/ff")


# ---------------------------------------------------------------------------
# PartAlignerTransformer CIMLE modes
# ---------------------------------------------------------------------------

ALIGNER_CASES = [
    # (cond_noise_type, add_class_cond, wrong_width_noise)
    (0, False, False),
    (0, False, True),   # wrong-width noise -> zeros (part_encoders.py:93-94)
    (0, True, False),   # class embedding instead of one-hot concat
    (1, False, False),  # noise as an extra masked-in token
    (2, False, False),  # AdaLN shift/scale inside each block
    (3, False, False),  # pre_norm scale-shift from SiLU+Linear
    (4, False, False),  # MLP-embedded noise concat
]


@pytest.mark.parametrize("mode,add_class_cond,wrong_width", ALIGNER_CASES)
def test_aligner_cimle_modes(mode, add_class_cond, wrong_width):
    """Aligner parity per CIMLE conditioning mode (part_encoders.py:86-143),
    incl. the pre_norm-skip quirk for modes 0/2/4."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.models.encoders.part_encoders import (
        PartAlignerTransformer as RefAligner,
    )

    from difffacto_tpu.models.aligner import PartAlignerTransformer as OurAligner

    torch.manual_seed(100 + mode + 10 * add_class_cond)
    kw = dict(
        in_channels=Z, n_heads=HEADS, d_head=DH, out_channels=6, depth=DEPTH,
        n_class=K, single_attn=True, class_cond=True, cimle=True,
        noise_dim=ND, noise_scale=10.0, add_class_cond=add_class_cond,
        cond_noise_type=mode,
    )
    ra = RefAligner(use_linear=True, **kw).eval()
    oa = OurAligner(**kw)

    rng = np.random.RandomState(mode)
    pc = (rng.randn(B, K, Z) * 0.5).astype(np.float32)
    valid = np.ones((B, K), np.float32)
    valid[1, 2] = 0.0
    width = INNER if mode == 1 else ND
    if wrong_width:
        width += 3
    noise = (rng.randn(B, width) * 0.3).astype(np.float32)

    variables = jax.jit(
        lambda: oa.init(jax.random.PRNGKey(0), jnp.asarray(pc), jnp.asarray(valid),
                        jnp.asarray(noise))
    )()

    def mapper(sd, fill):
        depth_map = _map_block_adaln if mode == 2 else None
        if depth_map is None:
            _map_transformer_like(sd, fill, "", "", DEPTH, single_attn=True,
                                  has_class_emb=add_class_cond)
        else:
            _map_linear(sd, fill, "proj_in", "proj_in")
            _map_linear(sd, fill, "proj_out", "proj_out")
            _map_layernorm(sd, fill, "pre_norm", "pre_norm")
            _map_layernorm(sd, fill, "post_norm", "post_norm")
            for d in range(DEPTH):
                depth_map(sd, fill, f"transformer_blocks.{d}", f"block_{d}")
        if mode == 3:
            _map_linear(sd, fill, "emb_layer.1", "emb_layer")
        if mode == 4:
            for i, li in enumerate((0, 2, 4)):
                _map_linear(sd, fill, f"emb_layer.net.{li}", f"emb_layer/Dense_{i}")

    V = _params_from(variables, mapper, _sd(ra))

    with torch.no_grad():
        tm, tv = ra(
            torch.from_numpy(pc.transpose(0, 2, 1)),
            mask=torch.from_numpy(valid),
            noise=torch.from_numpy(noise),
        )
    jm, jv = oa.apply(V, jnp.asarray(pc), jnp.asarray(valid), jnp.asarray(noise))
    np.testing.assert_allclose(
        np.asarray(jm), tm.numpy().transpose(0, 2, 1), atol=5e-4,
        err_msg=f"mode={mode} mean",
    )
    np.testing.assert_allclose(
        np.asarray(jv), tv.numpy().transpose(0, 2, 1), atol=5e-4,
        err_msg=f"mode={mode} logvar",
    )


# ---------------------------------------------------------------------------
# Concat-squash denoisers
# ---------------------------------------------------------------------------


def _map_cs(sd, fill, tp, jp):
    """ConcatSquashLinear (nets/utils.py:27-41)."""
    _map_linear(sd, fill, f"{tp}._layer", f"{jp}/layer")
    _map_linear(sd, fill, f"{tp}._hyper_gate", f"{jp}/hyper_gate")
    fill.put("params", f"{jp}/hyper_bias/kernel", _t(sd.pop(f"{tp}._hyper_bias.weight")))


def _map_cs_stack(sd, fill, n_hidden=5):
    for i in range(n_hidden):
        _map_cs(sd, fill, f"layers.{i}", f"cs_{i}")
    _map_cs(sd, fill, f"layers.{n_hidden}", "cs_out")


@pytest.mark.parametrize("per_point", [False, True])
def test_pointwisenet_parity(per_point):
    """PointwiseNet (pointwisenet.py:62-100) under both context layouts:
    one global (B, 1, F) token and per-point (B, N, F) conditioning."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.models.diffusions.nets.pointwisenet import PointwiseNet as RefPW

    from difffacto_tpu.models.denoiser import PointwiseNet as OurPW

    F, N = 10, 24
    torch.manual_seed(21)
    rp = RefPW(in_channels=3, out_channels=3, context_dim=F, res=True).eval()
    op = OurPW(point_dim=3, context_dim=F, residual=True)

    rng = np.random.RandomState(21)
    x = rng.randn(B, N, 3).astype(np.float32)
    beta = np.asarray([0.01, 0.015, 0.02], np.float32)
    ctx = rng.randn(B, N if per_point else 1, F).astype(np.float32)

    variables = jax.jit(
        lambda: op.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(beta),
                        [jnp.asarray(ctx)])
    )()
    V = _params_from(variables, lambda sd, fill: _map_cs_stack(sd, fill), _sd(rp))

    with torch.no_grad():
        tout = rp(
            torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(beta),
            [torch.from_numpy(ctx)],
        )
    jout = op.apply(V, jnp.asarray(x), jnp.asarray(beta), [jnp.asarray(ctx)])
    np.testing.assert_allclose(
        np.asarray(jout), tout.numpy().transpose(0, 2, 1), atol=2e-5
    )


def test_pointwisenet_latent_parity():
    """PointwiseNetLatent with use_part_ind code gating (pointwisenet.py:9-59)."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.models.diffusions.nets.pointwisenet import (
        PointwiseNetLatent as RefPWL,
    )

    from difffacto_tpu.models.denoiser import PointwiseNetLatent as OurPWL

    P, F = 6, 5  # prior width, code width; context_dim = P + F
    torch.manual_seed(22)
    rp = RefPWL(in_channels=Z, out_channels=Z, context_dim=P + F, res=True,
                use_part_ind=True).eval()
    op = OurPWL(in_channels=Z, out_channels=Z, context_dim=P + F, res=True,
                use_part_ind=True)

    rng = np.random.RandomState(22)
    x = rng.randn(B, K, Z).astype(np.float32)
    beta = np.asarray([0.01, 0.015, 0.02], np.float32)
    prior = rng.randn(B, K, P).astype(np.float32)
    code = rng.randn(B, F).astype(np.float32)
    ind = np.ones((B, K), np.float32)
    ind[0, 1] = 0.0

    variables = jax.jit(
        lambda: op.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(beta),
                        jnp.asarray(prior), jnp.asarray(code), jnp.asarray(ind))
    )()
    V = _params_from(variables, lambda sd, fill: _map_cs_stack(sd, fill), _sd(rp))

    with torch.no_grad():
        tout = rp(
            torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(beta),
            torch.from_numpy(prior.transpose(0, 2, 1)), torch.from_numpy(code),
            torch.from_numpy(ind),
        )
    jout = op.apply(
        V, jnp.asarray(x), jnp.asarray(beta), jnp.asarray(prior),
        jnp.asarray(code), jnp.asarray(ind),
    )
    np.testing.assert_allclose(
        np.asarray(jout), tout.numpy().transpose(0, 2, 1), atol=2e-5
    )


# ---------------------------------------------------------------------------
# LDMNet
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("time_as_token,with_ctx", [
    (True, False), (False, False), (False, True),
])
def test_ldmnet_parity(time_as_token, with_ctx):
    """LDMNet latent denoiser (attention.py:443-546). inner_dim MUST be 256:
    the reference feeds timestep_embedding(t, 256) into FeedForward(inner) and
    only inner=256 typechecks. Masked self-attention over the part tokens
    (ctx=None — the LDM configuration) and unmasked external-ctx
    cross-attention are tested separately: the reference CrossAttention
    asserts mask width == context length (attention.py:193), so
    mask + external ctx is unusable even in the reference."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.models.diffusions.nets.attention import LDMNet as RefLDM

    from difffacto_tpu.models.denoiser import LDMNet as OurLDM

    IN, F, M = 12, 20, 3
    heads, dh, depth = 4, 64, 2
    torch.manual_seed(23)
    kw = dict(
        in_channels=IN, n_heads=heads, d_head=dh, out_channels=IN, depth=depth,
        context_dim=F if with_ctx else None, single_attn=True,
        class_cond=False, n_class=K, cond_time_as_token=time_as_token,
        mask_out_unreferenced_code=not with_ctx,
    )
    rl = RefLDM(use_linear=True, **kw).eval()
    with torch.no_grad():  # proj_out is zero_module'd; randomize for a real test
        rl.proj_out.weight.normal_(0, 0.05)
        rl.proj_out.bias.normal_(0, 0.05)
    ol = OurLDM(**kw)

    rng = np.random.RandomState(23)
    x = rng.randn(B, K, IN).astype(np.float32)
    t = np.asarray([0, 7, 15], np.int64)
    ctx = rng.randn(B, M, F).astype(np.float32) if with_ctx else None
    valid = np.ones((B, K), np.float32)
    valid[2, 0] = 0.0

    variables = jax.jit(
        lambda: ol.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(t, jnp.int32),
                        jnp.asarray(ctx) if with_ctx else None,
                        valid_id=jnp.asarray(valid))
    )()
    V = _params_from(
        variables,
        lambda sd, fill: _map_transformer_like(
            sd, fill, "", "", depth, single_attn=True, has_time_embed=True
        ),
        _sd(rl),
    )

    with torch.no_grad():
        tout = rl(
            torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(t),
            torch.from_numpy(ctx.transpose(0, 2, 1)) if with_ctx else None,
            valid_id=torch.from_numpy(valid),
        )
    jout = ol.apply(
        V, jnp.asarray(x), jnp.asarray(t, jnp.int32),
        jnp.asarray(ctx) if with_ctx else None,
        valid_id=jnp.asarray(valid),
    )
    np.testing.assert_allclose(
        np.asarray(jout), tout.numpy().transpose(0, 2, 1), atol=3e-4
    )


def test_ldmnet_class_cond_reference_bug_pinned():
    """Pin the reference defect our LDMNet deliberately fixes: with
    class_cond=True, `x = x + emb[:, None] if len(emb.shape) == 2 else emb`
    (attention.py:522) REPLACES the projected input with the class embedding
    (python conditional-expression precedence), so the reference output is
    INDEPENDENT of x. Our LDMNet adds the class embedding instead
    (models/denoiser.py:355-360). If a fixed reference lands, this fails and
    the class-cond branch should then be cross-checked numerically."""
    _install_reference()
    from difffacto.models.diffusions.nets.attention import LDMNet as RefLDM

    torch.manual_seed(24)
    rl = RefLDM(
        in_channels=12, n_heads=4, d_head=64, out_channels=12, depth=1,
        context_dim=8, use_linear=True, single_attn=True, class_cond=True,
        n_class=K, cond_time_as_token=False,
    ).eval()
    with torch.no_grad():
        rl.proj_out.weight.normal_(0, 0.05)
    rng = np.random.RandomState(24)
    t = torch.from_numpy(np.asarray([3, 5], np.int64))
    ctx = torch.from_numpy(rng.randn(2, 8, 3).astype(np.float32))
    x1 = torch.from_numpy(rng.randn(2, 12, K).astype(np.float32))
    x2 = torch.from_numpy(rng.randn(2, 12, K).astype(np.float32))
    with torch.no_grad():
        o1 = rl(x1, t, ctx)
        o2 = rl(x2, t, ctx)
    np.testing.assert_allclose(o1.numpy(), o2.numpy(), atol=0)


# ---------------------------------------------------------------------------
# PointDiffusion end to end through PointwiseNet
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def point_diffusion_pair():
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.utils.registry import DIFFUSIONS as REF_DIFFUSIONS
    from difffacto.utils.registry import build_from_cfg as ref_build

    from difffacto_tpu.models.denoiser import PointwiseNet as OurPW
    from difffacto_tpu.utils.registry import DIFFUSIONS as OUR_DIFFUSIONS
    from difffacto_tpu.utils.registry import build_from_cfg as our_build

    F, N, T = 10, 24, 20
    torch.manual_seed(31)
    dcfg = dict(
        type="PointDiffusion",
        net=dict(type="PointwiseNet", in_channels=3, out_channels=3,
                 context_dim=F, res=True),
        num_timesteps=T, beta_1=1e-4, beta_T=0.05, mode="linear",
    )
    rd = ref_build(dict(dcfg), REF_DIFFUSIONS).eval()
    od = our_build(dict(dcfg), OUR_DIFFUSIONS)
    op = OurPW(in_channels=3, out_channels=3, context_dim=F, res=True)

    rng = np.random.RandomState(31)
    x = rng.randn(B, N, 3).astype(np.float32)
    ctx = rng.randn(B, 1, F).astype(np.float32)
    variables = jax.jit(
        lambda: op.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.zeros((B,), jnp.float32), [jnp.asarray(ctx)])
    )()
    V = _params_from(variables, lambda sd, fill: _map_cs_stack(sd, fill),
                     _sd(rd.model))

    def model_fn(inp, ts, c, *rest):
        return op.apply(V, inp, ts, c)

    return {"rd": rd, "od": od, "model_fn": model_fn, "x": x, "ctx": ctx,
            "rng": rng}


def test_point_diffusion_training_losses_parity(point_diffusion_pair):
    """Vanilla DPM loss (point_diffusion.py:484-517) == our anchored process
    with anchors pinned to zero and unit variance."""
    import jax.numpy as jnp

    pp = point_diffusion_pair
    t = np.asarray([0, 7, 19], np.int64)
    noise = pp["rng"].randn(B, 24, 3).astype(np.float32)
    with torch.no_grad():
        ttl = pp["rd"].training_losses(
            torch.from_numpy(pp["x"].transpose(0, 2, 1)), torch.from_numpy(t),
            pointwise_latent=[torch.from_numpy(pp["ctx"])],
            noise=torch.from_numpy(noise.transpose(0, 2, 1)),
        )
    jtl = pp["od"].training_losses(
        pp["model_fn"], None, jnp.asarray(pp["x"]), jnp.asarray(t, jnp.int32),
        anchors=jnp.zeros_like(jnp.asarray(pp["x"])),
        ctx=[jnp.asarray(pp["ctx"])], noise=jnp.asarray(noise),
    )
    np.testing.assert_allclose(
        float(jtl["mse_loss"]), float(ttl["diffusion_loss"]), rtol=1e-5
    )


def test_point_diffusion_p_sample_parity(point_diffusion_pair):
    """One reverse step with injected Gaussian noise (point_diffusion.py:
    287-314), covering the t==0 noise-free row."""
    import jax
    import jax.numpy as jnp

    pp = point_diffusion_pair
    t = np.asarray([0, 7, 19], np.int64)
    eps = pp["rng"].randn(B, 24, 3).astype(np.float32)
    randn_like = torch.randn_like
    torch.randn_like = lambda ten, **k: torch.from_numpy(eps.transpose(0, 2, 1)).to(ten)
    try:
        with torch.no_grad():
            tps = pp["rd"].p_sample(
                torch.from_numpy(pp["x"].transpose(0, 2, 1)), torch.from_numpy(t),
                pointwise_latent=[torch.from_numpy(pp["ctx"])],
            )
    finally:
        torch.randn_like = randn_like
    jps = pp["od"].p_sample(
        pp["model_fn"], jax.random.PRNGKey(0), jnp.asarray(pp["x"]),
        jnp.asarray(t, jnp.int32), jnp.zeros_like(jnp.asarray(pp["x"])),
        ctx=[jnp.asarray(pp["ctx"])], noise=jnp.asarray(eps),
    )
    np.testing.assert_allclose(
        np.asarray(jps["sample"]), tps["sample"].transpose(1, 2).numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(jps["pred_xstart"]), tps["pred_xstart"].transpose(1, 2).numpy(),
        atol=2e-5,
    )


# ---------------------------------------------------------------------------
# Latent-GAN generator / discriminators
# ---------------------------------------------------------------------------


def test_generator_parity():
    """Generator MLP incl. eval-mode BatchNorm and output BN; plain ReLU
    (generator.py:60-70 — the generator is NOT leaky)."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.models.generators.generator import Generator as RefGen

    from difffacto_tpu.models.gan import Generator as OurGen

    dims = (32, 64)
    torch.manual_seed(41)
    rg = RefGen(inp_dim=ND, out_dim=Z, use_bn=True, output_bn=True,
                dims=list(dims)).eval()
    with torch.no_grad():  # non-trivial running stats
        for m in rg.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    og = OurGen(noise_dim=ND, out_dim=Z, hidden=dims, use_bn=True,
                output_bn=True, per_part=False)

    rng = np.random.RandomState(41)
    z = rng.randn(B, ND).astype(np.float32)
    import jax

    variables = jax.jit(lambda: og.init(jax.random.PRNGKey(0), jnp.asarray(z)))()

    def mapper(sd, fill):
        for i in range(len(dims)):
            _map_linear(sd, fill, f"layers.{i}", f"Dense_{i}")
        _map_linear(sd, fill, "out", f"Dense_{len(dims)}")
        bn_names = [f"bns.{i}" for i in range(len(dims))] + ["out_bn"]
        for i, tn in enumerate(bn_names):
            for tname, jname, col in (
                ("weight", "scale", "params"), ("bias", "bias", "params"),
                ("running_mean", "mean", "batch_stats"),
                ("running_var", "var", "batch_stats"),
            ):
                fill.put(col, f"TorchBatchNorm_{i}/BatchNorm_0/{jname}",
                         np.asarray(sd.pop(f"{tn}.{tname}")))
            sd.pop(f"{tn}.num_batches_tracked", None)

    V = _params_from(variables, mapper, _sd(rg))
    with torch.no_grad():
        tout = rg(torch.from_numpy(z))
    jout = og.apply(V, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(jout), tout.numpy(), atol=2e-5)


def test_discriminator_parity():
    """Discriminator MLP with LayerNorm + sigmoid head
    (discriminator.py:38-60)."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.models.discriminators.discriminator import (
        Discriminator as RefDis,
    )

    from difffacto_tpu.models.gan import Discriminator as OurDis

    dims = (32, 16)
    torch.manual_seed(42)
    rd = RefDis(inp_dim=Z, use_bn=False, use_ln=True, use_sigmoid=True,
                dims=list(dims)).eval()
    od = OurDis(in_dim=Z, hidden=dims, use_ln=True, use_sigmoid=True)

    rng = np.random.RandomState(42)
    z = rng.randn(B, Z).astype(np.float32)
    variables = jax.jit(lambda: od.init(jax.random.PRNGKey(0), jnp.asarray(z)))()

    def mapper(sd, fill):
        for i in range(len(dims)):
            _map_linear(sd, fill, f"layers.{i}", f"Dense_{i}")
            _map_layernorm(sd, fill, f"lns.{i}", f"LayerNorm_{i}")
        _map_linear(sd, fill, "out", f"Dense_{len(dims)}")

    V = _params_from(variables, mapper, _sd(rd))
    with torch.no_grad():
        tout = rd(torch.from_numpy(z))
    jout = od.apply(V, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(jout), tout.numpy()[:, 0], atol=2e-5)


# ---------------------------------------------------------------------------
# PointNet encoder family
# ---------------------------------------------------------------------------

_BN_FIELDS = (
    ("weight", "scale", "params"), ("bias", "bias", "params"),
    ("running_mean", "mean", "batch_stats"), ("running_var", "var", "batch_stats"),
)


def _randomize_bn(mod, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in mod.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.05, generator=g)
                m.running_var.uniform_(0.8, 1.2, generator=g)


def _map_fc_head(sd, fill, suffix, jprefix, linear):
    """fc1_x/fc2_x/fc3_x + fc_bn1_x/fc_bn2_x heads (pointnet.py:77-87,
    397-403); ``linear`` False for the Conv1d flavor."""
    tr = _t if linear else _conv1d_to_dense
    for i, fc in enumerate(("fc1", "fc2", "fc3")):
        fill.put("params", f"{jprefix}/Dense_{i}/kernel", tr(sd.pop(f"{fc}_{suffix}.weight")))
        fill.put("params", f"{jprefix}/Dense_{i}/bias", np.asarray(sd.pop(f"{fc}_{suffix}.bias")))
    for i in (1, 2):
        for tname, jname, col in _BN_FIELDS:
            fill.put(
                col, f"{jprefix}/TorchBatchNorm_{i - 1}/BatchNorm_0/{jname}",
                np.asarray(sd.pop(f"fc_bn{i}_{suffix}.{tname}")),
            )
        sd.pop(f"fc_bn{i}_{suffix}.num_batches_tracked", None)


def _map_head_ln(sd, fill, tprefix, jprefix):
    """use_ln head: Sequential Linear/LayerNorm (pointnet.py:142-155)."""
    for i, ci in enumerate((0, 3, 6)):
        _map_linear(sd, fill, f"{tprefix}.{ci}", f"{jprefix}/Dense_{i}")
    for i, ci in enumerate((1, 4)):
        _map_layernorm(sd, fill, f"{tprefix}.{ci}", f"{jprefix}/LayerNorm_{i}")


def _pointnet_pair(ref_cls, our_cls, seed, ref_kw=None, our_kw=None):
    _install_reference()
    torch.manual_seed(seed)
    rm = ref_cls(**(ref_kw or {})).eval()
    _randomize_bn(rm, seed)
    om = our_cls(**(our_kw or {}))
    return rm, om


def test_pointnet_vae_and_pointnet_parity():
    """PointNetVAE whole-cloud encoder + deterministic PointNet subclass
    (pointnet.py:61-119), eval-mode BN with non-trivial running stats."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.models.encoders.pointnet import PointNet as RefPN
    from difffacto.models.encoders.pointnet import PointNetVAE as RefVAE

    from difffacto_tpu.models.pointnet import PointNet as OurPN
    from difffacto_tpu.models.pointnet import PointNetVAE as OurVAE

    rng = np.random.RandomState(61)
    x = rng.randn(B, 32, 7).astype(np.float32)

    def mapper(sd, fill):
        _map_pointnet_stack(sd, fill, "", "pnet")
        _map_fc_head(sd, fill, "m", "mlp_m", linear=True)
        _map_fc_head(sd, fill, "v", "mlp_v", linear=True)

    for RefC, OurC, det in ((RefVAE, OurVAE, False), (RefPN, OurPN, True)):
        torch.manual_seed(61)
        rm = RefC(point_dim=7, zdim=6, num_anchors=K).eval()
        _randomize_bn(rm, 61)
        om = OurC(point_dim=7, zdim=6, num_anchors=K)
        variables = jax.jit(lambda om=om: om.init(jax.random.PRNGKey(0), jnp.asarray(x)))()
        if det:
            # PointNet inherits both heads but returns m only; our PointNet
            # owns only the m head — drop the v weights before mapping.
            V_ = _params_from(
                variables,
                lambda sd, fill: (
                    [sd.pop(k) for k in list(sd) if "_v." in k],
                    _map_pointnet_stack(sd, fill, "", "pnet"),
                    _map_fc_head(sd, fill, "m", "mlp_m", linear=True),
                )[-1],
                _sd(rm),
            )
        else:
            V_ = _params_from(variables, mapper, _sd(rm))
        with torch.no_grad():
            tout = rm(torch.from_numpy(x))
        jout = om.apply(V_, jnp.asarray(x))
        if det:
            np.testing.assert_allclose(np.asarray(jout), tout.numpy(), atol=1e-4)
        else:
            np.testing.assert_allclose(np.asarray(jout[0]), tout[0].numpy(), atol=1e-4)
            np.testing.assert_allclose(np.asarray(jout[1]), tout[1].numpy(), atol=1e-4)


@pytest.mark.parametrize("use_ln", [False, True])
def test_pointnet_v2_shared_head_parity(use_ln):
    """PointNetV2 with the SHARED head (per_part_mlp=False) in both BN and LN
    flavors (pointnet.py:141-170) — the flagship fixture only covers the
    grouped per-part head."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.models.encoders.pointnet import PointNetV2 as RefV2

    from difffacto_tpu.models.pointnet import PointNetV2 as OurV2

    torch.manual_seed(62 + use_ln)
    rm = RefV2(point_dim=3, zdim=6, num_anchors=K, use_ln=use_ln).eval()
    _randomize_bn(rm, 62)
    om = OurV2(point_dim=3, zdim=6, num_anchors=K, use_ln=use_ln)
    rng = np.random.RandomState(62)
    x = rng.randn(B, 32, 3).astype(np.float32)
    seg = rng.randint(0, K, (B, 32))
    aw = np.eye(K, dtype=np.float32)[seg]

    variables = jax.jit(
        lambda: om.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(aw))
    )()

    def mapper(sd, fill):
        _map_pointnet_stack(sd, fill, "", "pnet")
        for s in ("m", "v"):
            if use_ln:
                _map_head_ln(sd, fill, f"mlp_{s}", f"mlp_{s}")
            else:
                _map_head_mlp(sd, fill, f"mlp_{s}", f"mlp_{s}", False, K)

    V_ = _params_from(variables, mapper, _sd(rm))
    with torch.no_grad():
        tm, tv = rm(torch.from_numpy(x), torch.from_numpy(aw))
    jm, jv = om.apply(V_, jnp.asarray(x), jnp.asarray(aw))
    np.testing.assert_allclose(np.asarray(jm), tm.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), atol=1e-4)


def test_pointnet_v2_variant_reference_defects_pinned():
    """Pin TWO reference defects in PointNetV2Variant, which our re-design
    (models/pointnet.py:156-200) implements by intent with no golden possible:

    1. The masked pooling ``h * flag - (1 - flag) * inf`` (pointnet.py:259)
       makes every IN-part entry ``h - 0*inf = nan``, which ``nan_to_num``
       zeroes — the pooled features are identically 0, so the encoder output
       is INDEPENDENT of the input points.
    2. The per-part head path feeds the 2-D (B, 512) slice ``x[..., i]`` to a
       Conv1d (pointnet.py:264-271), which torch reads as an unbatched
       (C=B, L) tensor and rejects — per_part_mlp=True crashes outright."""
    _install_reference()
    from difffacto.models.encoders.pointnet import PointNetV2Variant as RefVar

    torch.manual_seed(63)
    rng = np.random.RandomState(63)
    seg = rng.randint(0, K, (B, 32))
    flags = np.eye(K, dtype=np.float32)[seg]
    x1 = np.concatenate([rng.randn(B, 32, 3).astype(np.float32), flags], axis=-1)
    x2 = np.concatenate([rng.randn(B, 32, 3).astype(np.float32), flags], axis=-1)

    rm = RefVar(point_dim=3 + K, zdim=6, num_anchors=K, per_part_mlp=False).eval()
    with torch.no_grad():
        m1, _ = rm(torch.from_numpy(x1), torch.from_numpy(flags))
        m2, _ = rm(torch.from_numpy(x2), torch.from_numpy(flags))
    np.testing.assert_allclose(m1.numpy(), m2.numpy(), atol=0)  # input-independent

    rp = RefVar(point_dim=3 + K, zdim=6, num_anchors=K, per_part_mlp=True).eval()
    with pytest.raises(RuntimeError, match="channels"):
        with torch.no_grad():
            rp(torch.from_numpy(x1), torch.from_numpy(flags))


def test_pointnet_v2_vae_parity():
    """PointNetV2VAE with flags packed in the input (pointnet.py:280-376)."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.models.encoders.pointnet import PointNetV2VAE as RefVAE2

    from difffacto_tpu.models.pointnet import PointNetV2VAE as OurVAE2

    torch.manual_seed(64)
    rm = RefVAE2(point_dim=3, zdim=6, num_anchors=K).eval()
    _randomize_bn(rm, 64)
    om = OurVAE2(point_dim=3, zdim=6, num_anchors=K)
    rng = np.random.RandomState(64)
    seg = rng.randint(0, K, (B, 32))
    flags = np.eye(K, dtype=np.float32)[seg]
    x = np.concatenate([rng.randn(B, 32, 3).astype(np.float32), flags], axis=-1)

    variables = jax.jit(lambda: om.init(jax.random.PRNGKey(0), jnp.asarray(x)))()

    def mapper(sd, fill):
        _map_pointnet_stack(sd, fill, "", "pnet")
        _map_head_mlp(sd, fill, "mlp_m", "mlp_m", False, K)
        _map_head_mlp(sd, fill, "mlp_v", "mlp_v", False, K)

    V_ = _params_from(variables, mapper, _sd(rm))
    with torch.no_grad():
        tm, tv = rm(torch.from_numpy(x))
    jm, jv = om.apply(V_, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jm), tm.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), atol=1e-4)


def test_pointnet_v3_parity():
    """PointNetV3: global++masked pooled concat -> conv head
    (pointnet.py:379-425)."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.models.encoders.pointnet import PointNetV3 as RefV3

    from difffacto_tpu.models.pointnet import PointNetV3 as OurV3

    torch.manual_seed(65)
    rm = RefV3(point_dim=3, zdim=6, num_anchors=K).eval()
    _randomize_bn(rm, 65)
    om = OurV3(point_dim=3, zdim=6, num_anchors=K)
    rng = np.random.RandomState(65)
    seg = rng.randint(0, K, (B, 32))
    x = np.concatenate(
        [rng.randn(B, 32, 3).astype(np.float32), np.eye(K, dtype=np.float32)[seg]],
        axis=-1,
    )

    variables = jax.jit(lambda: om.init(jax.random.PRNGKey(0), jnp.asarray(x)))()

    def mapper(sd, fill):
        _map_pointnet_stack(sd, fill, "", "pnet")
        _map_fc_head(sd, fill, "m", "mlp_m", linear=False)

    V_ = _params_from(variables, mapper, _sd(rm))
    with torch.no_grad():
        tout = rm(torch.from_numpy(x))
    jout = om.apply(V_, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jout), tout.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# Decomposers (legacy path)
# ---------------------------------------------------------------------------


def _map_gat(sd, fill, tprefix, jprefix, nheads):
    for i in range(nheads):
        fill.put("params", f"{jprefix}/attention_{i}/W",
                 np.asarray(sd.pop(f"{tprefix}.attention_{i}.W")))
        fill.put("params", f"{jprefix}/attention_{i}/a",
                 np.asarray(sd.pop(f"{tprefix}.attention_{i}.a")))


@pytest.mark.parametrize("graph_attn,mlp_type", [(True, 0), (False, 1)])
def test_component_mixer_parity(graph_attn, mlp_type):
    """ComponentMixer with the reference defaults (norm=None):
    GAT / MultiHeadSelfAttention mixing, GEGLU FF, anchor MLPs for both
    mlp_types, flat aggregator, latent normalization
    (mixer.py:88-295, common.py:28-109)."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.models.decomposers.mixer import ComponentMixer as RefMixer

    from difffacto_tpu.models.decomposers import ComponentMixer as OurMixer

    C, NH = 16, 4
    torch.manual_seed(71)
    kw = dict(
        num_anchors=K, part_latent_dim=C, include_attention=True, nheads=NH,
        use_graph_attention=graph_attn, include_global_feature=True,
        global_mlp_type=0, normalize_latent=True, mlp_type=mlp_type,
    )
    rm = RefMixer(**kw).eval()
    om = OurMixer(**kw)
    rng = np.random.RandomState(71)
    lat = rng.randn(B, K, C).astype(np.float32)

    variables = jax.jit(lambda: om.init(jax.random.PRNGKey(0), jnp.asarray(lat)))()

    def mapper(sd, fill):
        if mlp_type == 0:
            for i, ci in enumerate((0, 3, 6)):
                _map_linear(sd, fill, f"mlp.{ci}", f"mlp/Dense_{i}")
        else:
            fill.put("params", "mlp_c1/kernel", _conv1d_to_dense(sd.pop("mlp.2.weight")))
            fill.put("params", "mlp_c1/bias", np.asarray(sd.pop("mlp.2.bias")))
            fill.put("params", "mlp_c2/kernel", _conv1d_to_dense(sd.pop("mlp.5.weight")))
            fill.put("params", "mlp_c2/bias", np.asarray(sd.pop("mlp.5.bias")))
            _map_linear(sd, fill, "anchor_regressor.2", "reg_c1")
            _map_linear(sd, fill, "anchor_regressor.5", "reg_c2")
        if graph_attn:
            _map_gat(sd, fill, "attention", "attention", NH)
        else:
            for n in ("Wq", "Wk", "Wv"):
                _map_linear(sd, fill, f"attention.{n}", f"attention/{n}")
        _map_feedforward_glu(sd, fill, "ff", "ff")
        _map_layernorm(sd, fill, "norm1", "norm1")
        _map_layernorm(sd, fill, "norm2", "norm2")
        for i, ci in enumerate((0, 2, 4)):
            _map_linear(sd, fill, f"aggregator.{ci}", f"aggregator/Dense_{i}")

    V_ = _params_from(variables, mapper, _sd(rm))
    with torch.no_grad():
        tg, tc, tl = rm(torch.from_numpy(lat))
    jg, jc, jl = om.apply(V_, jnp.asarray(lat))
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jl), tl.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jg), tg.numpy(), atol=1e-4)


def test_part_code_transformer_parity():
    """PartCodeTransformer ViT: fused-qkv blocks with the double-sqrt score
    scaling, class embedding concat, masked codes and the masked-code global
    aggregate (transformer.py:26-259); output_channels == width as the
    reference's own assert requires."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.models.decomposers.transformer import (
        PartCodeTransformer as RefPCT,
    )

    from difffacto_tpu.models.decomposers import PartCodeTransformer as OurPCT

    W, L, H, IN = 32, 2, 2, 10
    torch.manual_seed(72)
    rm = RefPCT(
        device=torch.device("cpu"), input_channels=IN, output_channels=W,
        n_ctx=K, width=W, layers=L, heads=H, class_cond=True, param_cond=True,
        param_dim=6, use_mask_in_transformer=True,
    ).eval()
    with torch.no_grad():  # output_proj is zeroed; randomize for a real test
        rm.output_proj.weight.normal_(0, 0.05)
        rm.output_proj.bias.normal_(0, 0.05)
    om = OurPCT(
        input_channels=IN, output_channels=W, n_ctx=K, width=W, layers=L,
        heads=H, class_cond=True, param_cond=True, param_dim=6,
        use_mask_in_transformer=True,
    )
    rng = np.random.RandomState(72)
    x = rng.randn(B, K, IN).astype(np.float32)
    par = rng.randn(B, K, 6).astype(np.float32)
    mask = np.ones((B, K), np.float32)
    mask[1, 3] = 0.0

    variables = jax.jit(
        lambda: om.init(jax.random.PRNGKey(0), jnp.asarray(x), (jnp.asarray(par),),
                        jnp.asarray(mask))
    )()

    def mapper(sd, fill):
        _map_linear(sd, fill, "input_proj", "input_proj")
        _map_linear(sd, fill, "output_proj", "output_proj")
        _map_layernorm(sd, fill, "ln_pre", "ln_pre")
        _map_layernorm(sd, fill, "ln_post", "ln_post")
        fill.put("params", "class_embedding/embedding",
                 np.asarray(sd.pop("class_embedding.weight")))
        for n in ("c_fc", "c_proj"):
            _map_linear(sd, fill, f"aggregate.{n}", f"aggregate/{n}")
        for i in range(L):
            tp = f"backbone.resblocks.{i}"
            _map_layernorm(sd, fill, f"{tp}.ln_1", f"resblocks_{i}/ln_1")
            _map_layernorm(sd, fill, f"{tp}.ln_2", f"resblocks_{i}/ln_2")
            _map_linear(sd, fill, f"{tp}.attn.c_qkv", f"resblocks_{i}/attn/c_qkv")
            _map_linear(sd, fill, f"{tp}.attn.c_proj", f"resblocks_{i}/attn/c_proj")
            _map_linear(sd, fill, f"{tp}.mlp.c_fc", f"resblocks_{i}/mlp/c_fc")
            _map_linear(sd, fill, f"{tp}.mlp.c_proj", f"resblocks_{i}/mlp/c_proj")

    V_ = _params_from(variables, mapper, _sd(rm))
    with torch.no_grad():
        tz, tcodes = rm(
            torch.from_numpy(x.transpose(0, 2, 1)),
            [torch.from_numpy(par.transpose(0, 2, 1))],
            torch.from_numpy(mask),
        )
    jz, jcodes = om.apply(
        V_, jnp.asarray(x), (jnp.asarray(par),), jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(jcodes), tcodes.transpose(1, 2).numpy(), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(jz), tz.numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# Language components
# ---------------------------------------------------------------------------


def _map_lstm(sd, fill, H):
    """torch nn.LSTM fused [i,f,g,o] gate weights -> flax OptimizedLSTMCell
    per-gate denses; torch adds bias_ih + bias_hh, flax keeps one bias on the
    hidden dense."""
    w_ih = np.asarray(sd.pop("rnn.weight_ih_l0"))
    w_hh = np.asarray(sd.pop("rnn.weight_hh_l0"))
    b = np.asarray(sd.pop("rnn.bias_ih_l0")) + np.asarray(sd.pop("rnn.bias_hh_l0"))
    for c, g in enumerate("ifgo"):
        fill.put("params", f"OptimizedLSTMCell_0/i{g}/kernel", w_ih[c * H:(c + 1) * H].T)
        fill.put("params", f"OptimizedLSTMCell_0/h{g}/kernel", w_hh[c * H:(c + 1) * H].T)
        fill.put("params", f"OptimizedLSTMCell_0/h{g}/bias", b[c * H:(c + 1) * H])
    fill.put("params", "word_embedding/embedding", np.asarray(sd.pop("word_embedding.weight")))
    fill.put("params", "w_attn", np.asarray(sd.pop("w_attn")))


def test_lstm_text_encoder_parity():
    """LSTM + bilinear word attention over padded tokens
    (language_encoders.py:10-88), incl. variable sequence lengths (the torch
    pack/pad dance vs our masked nn.RNN)."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.models.encoders.language_encoders import LSTM as RefLSTM

    from difffacto_tpu.models.language import LSTM as OurLSTM

    H, E, V, L = 12, 10, 40, 7
    torch.manual_seed(51)
    rl = RefLSTM(text_dim=H, embedding_dim=E, vocab_size=V).eval()
    ol = OurLSTM(text_dim=H, embedding_dim=E, vocab_size=V)

    rng = np.random.RandomState(51)
    toks = rng.randint(1, V, (B, L))
    toks[0, 4:] = 0  # padded tails of different lengths
    toks[1, 6:] = 0
    toks = toks.astype(np.int64)

    variables = jax.jit(
        lambda: ol.init(jax.random.PRNGKey(0), jnp.asarray(toks, jnp.int32))
    )()
    V_ = _params_from(variables, lambda sd, fill: _map_lstm(sd, fill, H), _sd(rl))
    with torch.no_grad():
        tfeat, tattn = rl(torch.from_numpy(toks), dropout=0.0)
    jfeat, jattn = ol.apply(V_, jnp.asarray(toks, jnp.int32))
    np.testing.assert_allclose(np.asarray(jfeat), tfeat.numpy(), atol=1e-5)
    # torch pads attn rows to the max length in batch; compare valid columns
    np.testing.assert_allclose(
        np.asarray(jattn)[:, : tattn.shape[1]], tattn.numpy(), atol=1e-5
    )


def test_multihead_cross_attention_parity():
    """Text/part cross attention with indicator slicing
    (language_encoders.py:90-127)."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.models.encoders.language_encoders import (
        MultiHeadCrossAttention as RefMHCA,
    )

    from difffacto_tpu.models.language import MultiHeadCrossAttention as OurMHCA

    torch.manual_seed(52)
    kw = dict(src_channel=10, tgt_channel=14, out_channel=16, qk_dim=24, nheads=4)
    rm = RefMHCA(**kw).eval()
    om = OurMHCA(**kw)
    rng = np.random.RandomState(52)
    src = rng.randn(B, K, 10).astype(np.float32)
    tgt = rng.randn(B, K, 14).astype(np.float32)
    ind = np.zeros((B, K), np.float32)
    ind[np.arange(B), [0, 2, 3]] = 1.0

    variables = jax.jit(
        lambda: om.init(jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(tgt),
                        jnp.asarray(ind))
    )()

    def mapper(sd, fill):
        for n in ("Wq", "Wk", "Wv", "linear1", "linear2"):
            _map_linear(sd, fill, n, n)
        _map_layernorm(sd, fill, "norm", "norm")

    V_ = _params_from(variables, mapper, _sd(rm))
    with torch.no_grad():
        tout = rm(torch.from_numpy(src), torch.from_numpy(tgt), torch.from_numpy(ind))
    jout = om.apply(V_, jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(ind))
    np.testing.assert_allclose(np.asarray(jout), tout.numpy(), atol=1e-5)


@pytest.mark.parametrize("regress_weights", [False, True])
def test_latent_language_fuser_parity(regress_weights):
    """Residual text-to-part fusion MLP (language_encoders.py:130-224), with
    indicator weights and with the sigmoid weight regressor."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.models.encoders.language_encoders import (
        LatentLanguageFuser as RefFuser,
    )

    from difffacto_tpu.models.language import LatentLanguageFuser as OurFuser

    TD, PD = 10, 12
    torch.manual_seed(53)
    rf = RefFuser(text_dim=TD, part_dim=PD, num_part=K, mid_dim=32,
                  regress_weights=regress_weights).eval()
    of = OurFuser(text_dim=TD, part_dim=PD, num_part=K, mid_dim=32,
                  regress_weights=regress_weights)

    rng = np.random.RandomState(53)
    pl = rng.randn(B, K, PD).astype(np.float32)
    tl = rng.randn(B, TD).astype(np.float32)
    ind = np.zeros((B, K), np.float32)
    ind[np.arange(B), [1, 0, 3]] = 1.0

    variables = jax.jit(
        lambda: of.init(jax.random.PRNGKey(0), jnp.asarray(pl), jnp.asarray(ind),
                        jnp.asarray(tl))
    )()

    def mapper(sd, fill):
        for i in (0, 1, 2, 3, 4):
            _map_linear(sd, fill, f"part_latent_fuser.{i}", f"fuser{i}")
        if regress_weights:
            for i, li in enumerate((0, 2, 4)):
                _map_linear(sd, fill, f"weight_regressor.{li}", f"Dense_{i}")

    V_ = _params_from(variables, mapper, _sd(rf))
    with torch.no_grad():
        tout = rf(
            torch.from_numpy(pl), torch.from_numpy(ind), torch.from_numpy(tl)
        )
    # Reference DEFECT (language_encoders.py:219-221): on the residual path,
    # ``fused_latent.unsqueeze(2)`` turns (B,1,K,D) into (B,1,1,K,D), so the
    # (B,1,K,1) indicator broadcasts across BATCH, yielding a (B,B,1,K,D)
    # cross-product; entry [a,b] mixes shape b's parts with shape a's fused
    # delta. The intended result is the diagonal [b,b] — which is what our
    # fuser computes directly.
    assert tout.shape == (B, B, 1, K, 12)
    tdiag = np.stack([tout.numpy()[b, b] for b in range(B)])
    jout = of.apply(V_, jnp.asarray(pl), jnp.asarray(ind), jnp.asarray(tl))
    np.testing.assert_allclose(np.asarray(jout), tdiag, atol=1e-5)


def test_part_language_selector_parity():
    """Indicator-selected part latent (language_encoders.py:228-247)."""
    _install_reference()
    import jax
    import jax.numpy as jnp

    from difffacto.models.encoders.language_encoders import (
        PartLanguageSelector as RefSel,
    )

    from difffacto_tpu.models.language import PartLanguageSelector as OurSel

    torch.manual_seed(54)
    rs = RefSel(text_dim=8, part_dim=12, out_channel=12).eval()
    os_ = OurSel(text_dim=8, part_dim=12, out_channel=12)
    rng = np.random.RandomState(54)
    src = rng.randn(B, 5, 8).astype(np.float32)
    tgt = rng.randn(B, K, 12).astype(np.float32)
    ind = np.zeros((B, K), np.float32)
    ind[np.arange(B), [2, 1, 0]] = 1.0
    with torch.no_grad():
        tout = rs(torch.from_numpy(src), torch.from_numpy(tgt), torch.from_numpy(ind))
    variables = os_.init(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(ind)
    )
    jout = os_.apply(variables, jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(ind))
    np.testing.assert_allclose(np.asarray(jout), tout.numpy(), atol=0)


def test_subsample_params_matches_reference():
    """Greedy diversity subsampling of aligner params
    (part_encoders.py:545-589): same injected 512-point score draws ->
    identical selected indices and parameters."""
    _install_reference()
    from difffacto.utils.registry import MODELS as REF_MODELS
    from difffacto.utils.registry import build_from_cfg as ref_build

    from test_reference_parity import REF_CFG, _load_model_cfg

    from difffacto_tpu.runner.editing import subsample_params

    model_cfg = _load_model_cfg(os.path.join(REF_CFG, "gen_chair.py"))
    torch.manual_seed(91)
    renc = ref_build(dict(model_cfg), REF_MODELS).eval().encoder

    rng = np.random.RandomState(91)
    Bs, C, num = 2, 5, 3
    mean = (rng.randn(Bs, C, K, 3) * 0.3).astype(np.float32)
    logvar = (rng.randn(Bs, C, K, 3) * 0.2 - 1.5).astype(np.float32)
    valid = np.ones((Bs, K), np.float32)
    valid[1, 3] = 0.0
    draws = rng.standard_normal((Bs, C, 512, K, 3)).astype(np.float32)

    queue = [torch.from_numpy(draws[b, c].transpose(0, 2, 1).copy())
             for b in range(Bs) for c in range(C)]
    it = iter(queue)
    randn = torch.randn
    torch.randn = lambda *shape, **kw: next(it)
    try:
        with torch.no_grad():
            (tms, tvs), tids = renc.subsample_params(
                torch.from_numpy(mean.transpose(0, 1, 3, 2)),
                torch.from_numpy(logvar.transpose(0, 1, 3, 2)),
                torch.from_numpy(valid), num, return_ids=True,
            )
    finally:
        torch.randn = randn

    (jms, jvs), jids = subsample_params(
        mean, logvar, valid, num, return_ids=True, _point_draws=draws
    )
    np.testing.assert_array_equal(
        jids, np.stack([t.numpy() for t in tids])
    )
    np.testing.assert_allclose(
        jms.reshape(-1, K, 3), tms.numpy().transpose(0, 2, 1).reshape(-1, K, 3),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        jvs.reshape(-1, K, 3), tvs.numpy().transpose(0, 2, 1).reshape(-1, K, 3),
        atol=1e-6,
    )


def test_reference_unet_forward_broken_as_shipped():
    """Pin the reference defect: UNet.forward calls
    ``timestep_embedding(t, dim, repeat_only=False)`` (nets/unet.py:336) but
    the imported utils.timestep_embedding (nets/utils.py:7) has no such
    kwarg — the UNet denoiser crashes on its first forward. Our UNet
    (models/denoiser.py:382) is a re-design of the intent (GroupNorm+SiLU
    in-layers, scale-shift time conditioning, prior/language block pairs)
    with no numerical golden possible."""
    _install_reference()
    from difffacto.models.diffusions.nets.unet import UNet as RefUNet

    torch.manual_seed(81)
    rm = RefUNet(in_channels=64, n_heads=2, d_head=32, depth=1, embed_dim=16).eval()
    x = torch.randn(2, 64, K)
    t = torch.tensor([1, 3])
    with pytest.raises(TypeError, match="repeat_only"):
        with torch.no_grad():
            rm(x, t)


def test_reference_segmentor_unbuildable_as_shipped():
    """Pin the reference defect: PointNetDenseCls builds
    dict(type='PointNet', global_feat=False, latent_dim=1024)
    (pointnet_segmentor.py:11) but the registered PointNet accepts neither
    kwarg (pointnet.py:63,112) — the shipped segmentor cannot be constructed.
    Our PointNetDenseCls (models/segmentor.py:22) is therefore a faithful
    re-design of the INTENT (per-point feats ++ global code -> log-softmax),
    with no numerical golden possible."""
    _install_reference()
    from difffacto.models.segmentors.pointnet_segmentor import PointNetDenseCls

    with pytest.raises(TypeError):
        PointNetDenseCls(n_class=4)
