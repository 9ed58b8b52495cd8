"""Smoke tests for encoder/aligner variants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_model import tiny_batch, tiny_model_cfg, N_CLASS, NPOINTS, ZDIM

RNGS = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2)}


def randn(*shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


@pytest.mark.parametrize("cls_name,extra", [
    ("PointNetVAE", {}),
    ("PointNetV2Variant", {"per_part_mlp": True}),
    ("PointNetV3", {}),
])
def test_pointnet_variants(cls_name, extra):
    import difffacto_tpu.models as M

    cls = getattr(M, cls_name)
    m = cls(point_dim=3 + N_CLASS if cls_name == "PointNetVAE" else 3,
            zdim=8, num_anchors=N_CLASS, **extra)
    pts = randn(2, 64, 3)
    onehot = jnp.asarray(np.eye(N_CLASS, dtype=np.float32)[
        np.random.RandomState(1).randint(0, N_CLASS, (2, 64))])
    if cls_name == "PointNetVAE":
        x = jnp.concatenate([pts, onehot], axis=-1)
        vs = jax.jit(lambda: m.init(RNGS, x))()
        out = m.apply(vs, x)
        assert out[0].shape == (2, N_CLASS, 8)
    else:
        vs = jax.jit(lambda: m.init(RNGS, pts, onehot))()
        out = m.apply(vs, pts, onehot)
        first = out[0] if isinstance(out, tuple) else out
        assert first.shape == (2, N_CLASS, 8)
        assert np.isfinite(np.asarray(first)).all()


def test_part_aligner_cimle():
    from difffacto_tpu.models import PartAlignerCIMLE

    m = PartAlignerCIMLE(width=8, n_class=N_CLASS, noise_dim=8)
    code = randn(2, N_CLASS, 8)
    vid = jnp.ones((2, N_CLASS))
    noise = randn(2, 8, seed=1)
    vs = jax.jit(lambda: m.init(RNGS, code, vid, noise))()
    mean, logvar = m.apply(vs, code, vid, noise)
    assert mean.shape == (2, N_CLASS, 3) and logvar.shape == (2, N_CLASS, 3)


def test_part_encoder_kl_variant():
    from difffacto_tpu.models import AnchorDiffAE
    from test_model import apply_loss, init_model

    cfg = tiny_model_cfg()
    cfg["encoder"]["type"] = "PartEncoderWithKLLoss"
    cfg["encoder"]["use_flow"] = False
    model = AnchorDiffAE(**cfg)
    batch = tiny_batch(B=2)
    vs = jax.jit(lambda r, b: model.init(r, b, 0, method=AnchorDiffAE.loss))(RNGS, batch)
    losses, _ = model.apply(
        vs, batch, 0, method=AnchorDiffAE.loss,
        rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(losses["prior_loss"]))
    assert np.isfinite(float(np.mean(losses["mse_loss"])))


def test_part_encoder_cvae():
    from difffacto_tpu.models import AnchorDiffAE

    cfg = tiny_model_cfg()
    cfg["encoder"]["type"] = "PartEncodercVAE"
    cfg["encoder"]["encode_ref"] = True
    model = AnchorDiffAE(**cfg)
    batch = tiny_batch(B=2)
    vs = jax.jit(lambda r, b: model.init(r, b, 0, method=AnchorDiffAE.loss))(RNGS, batch)
    losses, _ = model.apply(
        vs, batch, 0, method=AnchorDiffAE.loss,
        rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats", "intermediates"],
    )
    assert np.isfinite(float(np.mean(losses["mse_loss"])))


def test_registry_covers_all_reference_type_strings():
    """Every `type` string registrable in the reference must resolve here —
    the config-compatibility contract (SURVEY.md section 7 design stance)."""
    import difffacto_tpu.data, difffacto_tpu.metrics, difffacto_tpu.models  # noqa
    import difffacto_tpu.parallel.optim, difffacto_tpu.runner  # noqa
    import difffacto_tpu.utils.loggers  # noqa
    from difffacto_tpu.utils import registry as R

    ours = set()
    for name in dir(R):
        obj = getattr(R, name)
        if isinstance(obj, R.Registry):
            ours |= set(obj.modules.keys())
    # reference grep: all @<REGISTRY>.register_module() decorated names
    reference_names = """
    Adam AdamW Adamax Aligner AnchorDiffAE AnchorDiffGenPartglot
    AnchorDiffGenSuperSegments AnchoredDiffusion AnchoredGeneration
    ChamferDistanceL1 ChamferDistanceL2 ChamferDistanceL2_split CoarsePCN
    ComponentMixer ComponentMixerV2 CosineAnnealingLRWithWarmUp CrossEntropy
    CustomDataset CustomStepLR DiffuCompletion Discriminator DiscriminatorcGan
    EMD EncoderWithKLLoss Generator L1Loss L2Loss LDM LDMNet LSTM
    LatentDiffEdit LatentDiffusionDrift LatentLanguageFuser LinearLR
    MeanVarianceRegressor MultiHeadCrossAttention
    NegativeGaussianLogLikelihood PCN PDM ParameterTrainer PartAligner
    PartAlignerCIMLE PartAlignerTransformer PartCodeTransformer
    PartCodeTransformerV2 PartEncoder PartEncoderCIMLE PartEncoderForPartnet
    PartEncoderForPartnetAndTransformerDecoder PartEncoderForTransformerDecoder
    PartEncoderForTransformerDecoderCIMLE PartEncoderForTransformerDecoderKLLoss
    PartEncoderForTransformerDecoderKLLossCIMLE PartEncoderNoMixer
    PartEncoderVAE PartEncoderWithKLLoss PartEncodercVAE PartEncodercVAE2
    PartLanguageSelector PartLatentEditor PartglotClassifier PartglotFinetune
    PartglotSupSegsEncoderWithCBN Partnet Pnet2Stage PointDiffusion PointFlow
    PointNet PointNet2MSG PointNet2SSG PointNetDenseCls PointNetV2
    PointNetV2VAE PointNetV2Variant PointNetV3 PointNetVAE PointNetVAEBase
    PointwiseNet PointwiseNet2 PointwiseNetLatent RunLogger ShapeNet
    ShapeNetPart ShapeNetParts ShapeNetSeg ShapeNetSegPart
    ShapeNetSegSuperSegment ShapeNetSegSuperSegmentParglot SmoothCrossEntropy
    SpectralContrastiveLoss SupSegsEncoder TensorboardLogger TextLogger
    TransformerNet UNet Uniform dis_loss gen_loss gradient_penalty
    """.split()
    missing = sorted(set(reference_names) - ours)
    assert not missing, f"reference type strings without a registration: {missing}"


def test_encoder_with_kl_loss_forward_and_sampling():
    """EncoderWithKLLoss (part_encoders.py:2051-2125): global latent VAE."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from difffacto_tpu.utils.registry import ENCODERS, build_from_cfg

    cfg = dict(
        type="EncoderWithKLLoss",
        encoder=dict(type="PointNetVAEBase", zdim=16, point_dim=3),
        part_aligner=dict(
            type="PartAlignerTransformer", in_channels=16, out_channels=6,
            n_class=4, d_head=8, depth=1, n_heads=2, dropout=0.0,
            use_linear=True, class_cond=True, single_attn=True,
            add_class_cond=True, cimle=False, noise_scale=1,
        ),
        n_class=4, use_flow=True, latent_flow_depth=2,
        latent_flow_hidden_dim=16, kl_weight=1e-3, gen=True,
        include_part_code=True, include_params=True, include_z=False,
    )
    enc = build_from_cfg(cfg, ENCODERS)
    rng = np.random.RandomState(0)
    B, N = 2, 32
    seg = np.repeat(np.arange(4), N // 4)[None].repeat(B, 0)
    batch = {
        "ref": jnp.asarray(rng.randn(B, N, 3), jnp.float32),
        "ref_seg_mask": jnp.asarray(seg, jnp.int32),
        "present": jnp.ones((B, 4), jnp.float32),
    }
    variables = enc.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        batch, train=True,
    )
    (ctx, mean_pp, logvar_pp, flag_pp, losses, _), _mut = enc.apply(
        variables, batch, train=True, rngs={"sample": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert mean_pp.shape == (B, N, 3)
    assert "prior_loss" in losses and "fit_loss" in losses
    assert np.isfinite(float(losses["prior_loss"]))

    out = enc.apply(
        variables, 2, N, method=type(enc).sample_latents,
        rngs={"sample": jax.random.PRNGKey(3)},
    )
    assert out[1].shape == (2, N, 3)  # mean_pp
