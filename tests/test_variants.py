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
