"""Smoke tests: PointFlow CNF, completion models, latent editors."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_model import tiny_batch, NPOINTS, N_CLASS

RNGS = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2)}


def randn(*shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


class TestCNF:
    def test_invertible(self):
        from difffacto_tpu.models import CNF

        cnf = CNF(dims=(16, 16), out_dim=3, steps=8)
        y = randn(2, 10, 3)
        ctx = randn(2, 10, 8, seed=1)
        vs = jax.jit(lambda: cnf.init({"params": jax.random.PRNGKey(0)}, y, ctx))()
        fwd, delta = cnf.apply(vs, y, ctx)
        back, delta_b = cnf.apply(vs, fwd, ctx, reverse=True)
        np.testing.assert_allclose(np.asarray(back), np.asarray(y), atol=1e-3)
        # log-density changes cancel
        np.testing.assert_allclose(np.asarray(delta + delta_b), 0, atol=1e-3)

    def test_pointflow_loss_and_sample(self):
        from difffacto_tpu.models import PointFlow

        model = PointFlow(
            encoder=dict(type="PointNetV2", zdim=8, point_dim=3, per_part_mlp=False),
            point_cnf=dict(dims=(16, 16), steps=4),
            latent_cnf=dict(dims=(16,), steps=4),
            part_aligner=dict(
                type="PartAlignerTransformer", in_channels=8, out_channels=6,
                n_class=N_CLASS, d_head=4, depth=1, n_heads=2, single_attn=True,
                class_cond=True, add_class_cond=True,
            ),
            zdim=8,
            n_class=N_CLASS,
        )
        batch = tiny_batch(B=2)
        vs = jax.jit(lambda r, b: model.init(r, b, 0, method=PointFlow.loss))(RNGS, batch)
        losses, _ = model.apply(
            vs, batch, 0, method=PointFlow.loss,
            rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        for k in ("recon_loss", "prior_loss", "entropy_loss"):
            assert np.isfinite(float(losses[k])), k
        z, pts = model.apply(
            vs, 2, 16, method=PointFlow.sample, rngs={"sample": jax.random.PRNGKey(5)}
        )
        assert pts.shape == (2, 16, 3)
        assert np.isfinite(np.asarray(pts)).all()


class TestCompletion:
    def test_pcn(self):
        from difffacto_tpu.models import PCN

        model = PCN(num_pred=64, encoder_channel=32, grid_size=4)
        partial = randn(2, 32, 3)
        vs = jax.jit(lambda: model.init(RNGS, partial))()
        coarse, fine = model.apply(vs, partial)
        assert coarse.shape == (2, 4, 3) and fine.shape == (2, 64, 3)
        losses, _ = model.apply(vs, {"ref": randn(2, 64, 3, seed=2), "input": partial},
                                method=PCN.loss, mutable=["batch_stats"])
        assert np.isfinite(float(losses["fine_loss"]))

    def test_coarse_pcn(self):
        from difffacto_tpu.models import CoarsePCN

        model = CoarsePCN(num_anchors=32, encoder_channel=32)
        partial = randn(2, 32, 3)
        vs = jax.jit(lambda: model.init(RNGS, partial))()
        out = model.apply(vs, partial)
        assert out.shape == (2, 32, 3)

    def test_diffu_completion(self):
        from difffacto_tpu.models import DiffuCompletion

        model = DiffuCompletion(
            diffusion=dict(
                type="PointDiffusion",
                net=dict(type="PointwiseNet", point_dim=3, context_dim=16,
                         hidden=(16, 32, 16)),
                beta_1=1e-4, beta_T=0.02,
            ),
            sampler=dict(type="Uniform"),
            num_timesteps=5,
            encoder_channel=16,
            npoints=32,
        )
        batch = {"ref": randn(2, 32, 3), "input": randn(2, 16, 3, seed=1)}
        vs = jax.jit(lambda r, b: model.init(r, b, 0, method=DiffuCompletion.loss))(
            RNGS, batch
        )
        losses, _ = model.apply(
            vs, batch, 0, method=DiffuCompletion.loss,
            rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        assert np.isfinite(float(losses["mse_loss"]))
        # eval path: encode -> reverse chain -> pred/ref/input (reference
        # completion.py:45-57 else-branch)
        out = model.apply(
            vs, batch, method=DiffuCompletion.reconstruct,
            rngs={"sample": jax.random.PRNGKey(5)},
        )
        assert out["pred"].shape == (2, 32, 3)
        assert np.isfinite(np.asarray(out["pred"])).all()


class TestEditors:
    def _lang_batch(self, B=2, N=32):
        from difffacto_tpu.models import tokenizing

        rng = np.random.RandomState(0)
        seg = np.repeat(np.arange(N_CLASS), N // N_CLASS)[None].repeat(B, 0)
        onehot = np.eye(N_CLASS, dtype=np.float32)[seg]
        ind = np.zeros((B, N_CLASS), np.float32)
        ind[:, 1] = 1
        return {
            "target": randn(B, N, 3, seed=1),
            "distractor": randn(B, N, 3, seed=2),
            "target_attn_map": jnp.asarray(onehot),
            "distractor_attn_map": jnp.asarray(onehot),
            "part_indicator": jnp.asarray(ind),
            "text": jnp.asarray(
                np.stack([tokenizing("a chair with a tall back")] * B), jnp.int32
            ),
        }

    def test_parameter_trainer(self):
        from difffacto_tpu.models import ParameterTrainer
        from test_model import tiny_model_cfg

        enc_cfg = tiny_model_cfg()["encoder"]
        model = ParameterTrainer(encoder=enc_cfg, num_anchors=N_CLASS, npoints=NPOINTS)
        batch = tiny_batch(B=2)
        vs = jax.jit(lambda r, b: model.init(r, b, 0, method=ParameterTrainer.loss))(
            RNGS, batch
        )
        losses, _ = model.apply(
            vs, batch, 0, method=ParameterTrainer.loss,
            rngs={"sample": jax.random.PRNGKey(3)}, mutable=["batch_stats"],
        )
        assert np.isfinite(float(np.mean(losses["fit_loss"])))

    def test_partglot_classifier(self):
        from difffacto_tpu.models import PartglotClassifier

        model = PartglotClassifier(text_dim=16, part_dim=8, num_part=N_CLASS,
                                   language_encoder=dict(type="LSTM", text_dim=16))
        b = self._lang_batch()
        lat = randn(2, N_CLASS, 8, seed=3)
        vs = jax.jit(
            lambda: model.init(RNGS, lat, b["text"], b["part_indicator"])
        )()
        logits = model.apply(vs, lat, b["text"], b["part_indicator"])
        assert logits.shape == (2,)
        losses = model.apply(
            vs, lat, lat + 0.1, b["text"], b["part_indicator"], False,
            method=PartglotClassifier.listener_loss,
        )
        assert np.isfinite(float(losses["listener_loss"]))

    def test_latent_diff_edit(self):
        from difffacto_tpu.models import LatentDiffEdit

        model = LatentDiffEdit(
            encoder=dict(type="PointNet", zdim=8, point_dim=3 + N_CLASS),
            diffusion=dict(
                type="LDM",
                net=dict(type="LDMNet", in_channels=8, out_channels=8, n_heads=2,
                         d_head=8, depth=1, context_dim=8 + 16, n_class=N_CLASS),
                beta_1=1e-4, beta_T=0.02,
            ),
            sampler=dict(type="Uniform"),
            language_encoder=dict(type="LSTM", text_dim=16),
            num_anchors=N_CLASS,
            num_timesteps=5,
        )
        b = self._lang_batch()
        vs = jax.jit(lambda r, bb: model.init(r, bb, 0, method=LatentDiffEdit.loss))(
            RNGS, b
        )
        losses, _ = model.apply(
            vs, b, 0, method=LatentDiffEdit.loss,
            rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        assert np.isfinite(float(losses["mse_loss"]))

    def test_part_latent_editor(self):
        from difffacto_tpu.models import PartLatentEditor

        model = PartLatentEditor(
            language_encoder=dict(type="LSTM", text_dim=16),
            latent_language_fuser=dict(
                type="LatentLanguageFuser", text_dim=16, part_dim=8,
            ),
            pcd_encoder=dict(type="PointNet", zdim=8, point_dim=3 + N_CLASS),
            num_part_latent=N_CLASS,
            text_dim=16,
            out_dim=8,
        )
        b = self._lang_batch()
        vs = jax.jit(lambda r, bb: model.init(r, bb, 0, method=PartLatentEditor.loss))(
            RNGS, b
        )
        losses, _ = model.apply(
            vs, b, 0, method=PartLatentEditor.loss,
            rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        for k in ("direction_loss", "magnitude_loss", "logit_loss"):
            assert np.isfinite(float(losses[k])), k
