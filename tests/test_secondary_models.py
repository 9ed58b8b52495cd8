"""Smoke tests for secondary model families: PointNet++, vanilla/latent
diffusions, GAN pieces, segmentor, decomposers, extra denoisers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difffacto_tpu.models import (
    AnchoredGeneration,
    ComponentMixer,
    Discriminator,
    DiscriminatorcGan,
    Generator,
    LDMNet,
    PDM,
    PartCodeTransformer,
    PointDiffusion,
    PointNet2MSG,
    PointNet2SSG,
    PointNetDenseCls,
    PointwiseNet,
    PointwiseNet2,
    UNet,
    dis_loss,
    gen_loss,
    gradient_penalty,
)

RNGS = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2)}


def randn(*shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


class TestPointNet2:
    def test_ssg(self):
        m = PointNet2SSG(additioinal_dim=4, zdim=16, num_anchors=4)
        pc = randn(2, 1024, 7)
        vs = jax.jit(lambda: m.init(RNGS, pc))()
        out = m.apply(vs, pc)
        assert out.shape == (2, 4, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_msg(self):
        m = PointNet2MSG(additioinal_dim=4, zdim=8, num_anchors=2)
        pc = randn(2, 1024, 7)
        vs = jax.jit(lambda: m.init(RNGS, pc))()
        out = m.apply(vs, pc)
        assert out.shape == (2, 2, 8)


class TestVanillaDiffusion:
    def test_point_diffusion_is_vanilla(self):
        d = PointDiffusion(num_timesteps=10, beta_1=1e-4, beta_T=0.02)
        # anchors are forced to zero: q_sample must not depend on them
        x = randn(2, 16, 3)
        t = jnp.array([3, 7])
        anchors = randn(2, 16, 3, seed=5)
        a = d.q_sample(jax.random.PRNGKey(0), x, t, anchors)
        b = d.q_sample(jax.random.PRNGKey(0), x, t, jnp.zeros_like(anchors))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_sampling_loop(self):
        d = PointDiffusion(num_timesteps=5, beta_1=1e-4, beta_T=0.02)
        model_fn = lambda inp, ts, c, anc, var, seg, vid: inp * 0.1
        out = d.p_sample_loop(
            model_fn, jax.random.PRNGKey(0), jnp.zeros((2, 16, 3)),
        )
        assert out["pred"].shape == (2, 16, 3)


class TestGAN:
    def test_generator_discriminator(self):
        g = Generator(noise_dim=8, out_dim=16, n_class=4)
        z = g.sample_noise(jax.random.PRNGKey(0), 4)
        gv = g.init(RNGS, z)
        fake = g.apply(gv, z)
        assert fake.shape == (4, 4, 16)
        dsc = Discriminator(in_dim=64)
        dv = dsc.init(RNGS, fake)
        s = dsc.apply(dv, fake)
        assert s.shape == (4,)
        assert np.isfinite(float(gen_loss(s)))
        assert np.isfinite(float(dis_loss(s, s)))

    def test_cgan_and_gp(self):
        dsc = DiscriminatorcGan(in_dim=16, n_class=4)
        x = randn(4, 16)
        c = jnp.eye(4)
        dv = dsc.init(RNGS, x, c)
        critic = lambda a: dsc.apply(dv, a, c)
        gp = gradient_penalty(critic, jax.random.PRNGKey(1), x, x + 0.1)
        assert np.isfinite(float(gp))


class TestHeads:
    def test_segmentor(self):
        m = PointNetDenseCls(n_class=4)
        pc = randn(2, 128, 3)
        vs = jax.jit(lambda: m.init(RNGS, pc))()
        logp, g = m.apply(vs, pc)
        assert logp.shape == (2, 128, 4)
        # log-softmax rows sum to 1 in prob space
        np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0, atol=1e-4)

    def test_component_mixer(self):
        m = ComponentMixer(
            num_anchors=4, part_latent_dim=16, include_attention=True,
            include_global_feature=True,
        )
        lat = randn(2, 4, 16)
        vs = jax.jit(lambda: m.init(RNGS, lat))()
        g, coarse, mixed = m.apply(vs, lat)
        assert coarse.shape == (2, 4, 3) and mixed.shape == (2, 4, 16)
        assert g.shape[0] == 2

    def test_part_code_transformer(self):
        m = PartCodeTransformer(
            input_channels=16, output_channels=8, n_ctx=4, width=32, layers=2, heads=2,
            param_cond=False, class_cond=True,
        )
        x = randn(2, 4, 16)
        mask = jnp.ones((2, 4))
        vs = jax.jit(lambda: m.init(RNGS, x, (), mask))()
        z, codes = m.apply(vs, x, (), mask)
        assert codes.shape == (2, 4, 8) and z.shape == (2, 32)


class TestExtraDenoisers:
    def test_ldmnet(self):
        m = LDMNet(in_channels=16, out_channels=16, n_heads=2, d_head=8, depth=2,
                   class_cond=True, n_class=4)
        x = randn(2, 4, 16)
        t = jnp.array([1, 3])
        vs = jax.jit(lambda: m.init(RNGS, x, t))()
        out = m.apply(vs, x, t)
        assert out.shape == (2, 4, 16)

    def test_unet(self):
        m = UNet(in_channels=16, n_heads=2, d_head=8, depth=2)
        x = randn(2, 32, 16)
        t = jnp.array([1, 3])
        vs = jax.jit(lambda: m.init(RNGS, x, t))()
        out = m.apply(vs, x, t)
        assert out.shape == (2, 32, 16)

    def test_pointwisenet2(self):
        m = PointwiseNet2(in_channels=3, out_channels=3, context_dim=16, num_anchors=4)
        x = randn(2, 32, 3)
        t = jnp.array([1, 3])
        ctx = randn(2, 4, 16)
        seg = jnp.zeros((2, 32), jnp.int32)
        vs = jax.jit(lambda: m.init(RNGS, x, t, ctx, None, None, seg))()
        out = m.apply(vs, x, t, ctx, None, None, seg)
        assert out.shape == (2, 32, 3)


class TestExtraOrchestrators:
    def _pdm_cfg(self):
        return dict(
            encoder=dict(type="PointNet", zdim=16, point_dim=7, num_anchors=1),
            diffusion=dict(
                type="PointDiffusion",
                net=dict(type="PointwiseNet", point_dim=3, context_dim=16,
                         hidden=(32, 64, 32)),
                beta_1=1e-4, beta_T=0.02, mode="linear",
            ),
            sampler=dict(type="Uniform"),
            num_timesteps=5,
            npoints=32,
        )

    def test_pdm_loss(self):
        from test_model import tiny_batch

        model = PDM(**self._pdm_cfg())
        batch = tiny_batch(B=2)
        vs = jax.jit(lambda r, b: model.init(r, b, 0, method=PDM.loss))(RNGS, batch)
        losses, _ = model.apply(
            vs, batch, 0, method=PDM.loss,
            rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        assert np.isfinite(np.asarray(losses["mse_loss"]))

    def test_anchored_generation_loss(self):
        from test_model import tiny_batch

        model = AnchoredGeneration(
            encoder=dict(type="PCN", point_dim=7, part_latent_dim=16),
            parameter_regressor=dict(type="MeanVarianceRegressor", latent_dim=16),
            decomposer=dict(
                type="ComponentMixer", part_latent_dim=16,
                include_attention=True, include_global_feature=True,
            ),
            diffusion=dict(
                type="AnchoredDiffusion",
                net=dict(type="PointwiseNet", point_dim=3, residual=False,
                         hidden=(16, 32, 16)),
                beta_1=1e-4, beta_T=0.02, k=1.0, mode="linear",
                model_mean_type="epsilon", learn_variance=False,
                include_anchors=False, res=False,
            ),
            sampler=dict(type="Uniform"),
            num_anchors=4,
            num_timesteps=5,
            npoints=32,
            guidance=True,
        )
        batch = tiny_batch(B=2)
        vs = jax.jit(lambda r, b: model.init(r, b, 0, method=AnchoredGeneration.loss))(
            RNGS, batch
        )
        losses, _ = model.apply(
            vs, batch, 0, method=AnchoredGeneration.loss,
            rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        for k in ("mse_loss", "prior_loss", "anchor_loss"):
            assert np.isfinite(np.asarray(losses[k])), k
        # uncond eval: sample latents -> reverse decode (anchor_gen_uncond.py:241-269)
        out = model.apply(
            vs, batch, method=AnchoredGeneration.predict,
            rngs={"sample": jax.random.PRNGKey(5)},
        )
        assert out["pred"].shape == (2, 32, 3)
        assert np.isfinite(np.asarray(out["pred"])).all()
        assert out["seg_mask"].shape == (2, 32)


class TestAnchorDiffGenSuperSegments:
    def _model(self, **kw):
        from difffacto_tpu.models import AnchorDiffGenSuperSegments

        base = dict(
            encoder=dict(type="PCN", point_dim=7, part_latent_dim=16),
            decomposer=dict(
                type="ComponentMixer", part_latent_dim=16,
                include_attention=True, include_global_feature=True,
            ),
            diffusion=dict(
                type="AnchoredDiffusion",
                net=dict(type="PointwiseNet", point_dim=3, residual=False,
                         hidden=(16, 32, 16)),
                beta_1=1e-4, beta_T=0.02, k=1.0, mode="linear",
                model_mean_type="epsilon", learn_variance=False,
                include_anchors=False, res=False,
            ),
            sampler=dict(type="Uniform"),
            num_anchors=4, num_timesteps=5, npoints=32, part_dim=16,
            loss=dict(type="NegativeGaussianLogLikelihood"),
        )
        base.update(kw)
        return AnchorDiffGenSuperSegments(**base)

    @pytest.mark.parametrize(
        "kw",
        [
            dict(),
            dict(project_latent=True, learn_var=True, post_ff=True,
                 post_norm="bn", guidance=True, global_shift=True,
                 global_scale=True),
            dict(project_latent=True, project_pe_type=2, share_projection=False,
                 use_primary=True),
        ],
    )
    def test_loss_and_predict(self, kw):
        from difffacto_tpu.models import AnchorDiffGenSuperSegments
        from test_model import tiny_batch

        model = self._model(**kw)
        batch = tiny_batch(B=2)
        vs = jax.jit(
            lambda r, b: model.init(r, b, 0, method=AnchorDiffGenSuperSegments.loss)
        )(RNGS, batch)
        losses, _ = model.apply(
            vs, batch, 0, method=AnchorDiffGenSuperSegments.loss,
            rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        for k in ("anchor_loss", "mse_loss"):
            assert np.isfinite(float(losses[k])), (kw, k)
        out = model.apply(
            vs, batch, method=AnchorDiffGenSuperSegments.predict,
            rngs={"sample": jax.random.PRNGKey(5)},
        )
        assert out["pred"].shape == (2, 32, 3)
        assert np.isfinite(np.asarray(out["pred"])).all()

    def test_get_params_and_interpolate(self):
        from difffacto_tpu.models import AnchorDiffGenSuperSegments
        from test_model import tiny_batch

        model = self._model(project_latent=True, learn_var=True)
        batch = tiny_batch(B=3)
        vs = jax.jit(
            lambda r, b: model.init(r, b, 0, method=AnchorDiffGenSuperSegments.loss)
        )(RNGS, batch)
        shift, logscale = model.apply(
            vs, batch, method=AnchorDiffGenSuperSegments.get_params,
            rngs={"sample": jax.random.PRNGKey(6)},
        )
        assert shift.shape == (3, 4, 3) and logscale.shape == (3, 4, 3)
        out = model.apply(
            vs, batch, 0, 1, 2, method=AnchorDiffGenSuperSegments.interpolate_latent,
            rngs={"sample": jax.random.PRNGKey(7)},
        )
        assert out["pred"].shape == (10, 32, 3)
        assert np.isfinite(np.asarray(out["pred"])).all()

    def test_combine_and_anchor_drift(self):
        from difffacto_tpu.models import AnchorDiffGenSuperSegments
        from test_model import tiny_batch

        model = self._model(project_latent=True, learn_var=True)
        batch = tiny_batch(B=4)
        vs = jax.jit(
            lambda r, b: model.init(r, b, 0, method=AnchorDiffGenSuperSegments.loss)
        )(RNGS, batch)
        out = model.apply(
            vs, batch, [0, 1, 2, 3],
            method=AnchorDiffGenSuperSegments.combine_latent,
            rngs={"sample": jax.random.PRNGKey(8)},
        )
        assert out["pred"].shape == (1, 32, 3)
        assert np.isfinite(np.asarray(out["pred"])).all()
        drift = model.apply(
            vs, batch, 3, method=AnchorDiffGenSuperSegments.anchor_drift,
            rngs={"sample": jax.random.PRNGKey(9)},
        )
        assert drift["pred"].shape == (4, 3, 32, 3)
        assert np.isfinite(np.asarray(drift["pred"])).all()


class TestSupsegEncoders:
    def test_supsegs_encoder(self):
        from difffacto_tpu.models import SupSegsEncoder

        m = SupSegsEncoder(sup_segs_dim=8, part_latent_dim=16, num_anchors=4)
        x = randn(2, 6, 32, 3)
        mask = jnp.ones((2, 6))
        vs = jax.jit(lambda: m.init(RNGS, x, mask, True))()
        out = m.apply(vs, x, mask, True, mutable=["batch_stats"])[0]
        assert out.shape == (2, 4, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_supsegs_mask_invariance(self):
        """Masked-out segments must not change the part latents (eval mode)."""
        from difffacto_tpu.models import SupSegsEncoder

        m = SupSegsEncoder(sup_segs_dim=8, part_latent_dim=16, num_anchors=4)
        x = randn(2, 6, 32, 3)
        mask = jnp.ones((2, 6)).at[:, 5].set(0.0)
        vs = jax.jit(lambda: m.init(RNGS, x, mask, True))()
        x2 = x.at[:, 5].add(37.0)
        o1 = m.apply(vs, x, mask, False)
        o2 = m.apply(vs, x2, mask, False)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    def test_cbn_encoder(self):
        from difffacto_tpu.models import PartglotSupSegsEncoderWithCBN

        m = PartglotSupSegsEncoderWithCBN(sup_segs_dim=8, embed_t_size=16, emb_size=16)
        x = randn(2, 32, 3)
        t = jnp.array([1.0, 5.0])
        vs = jax.jit(lambda: m.init(RNGS, x, t))()
        out = m.apply(vs, x, t)
        assert out.shape == (2, 32, 8)

    def test_mean_variance_regressor(self):
        from difffacto_tpu.models import MeanVarianceRegressor

        m = MeanVarianceRegressor(latent_dim=16, num_class=4)
        x = randn(2, 4, 16)
        vs = jax.jit(lambda: m.init(RNGS, x, True))()
        mean, logvar = m.apply(vs, x, True, mutable=["batch_stats"])[0]
        assert mean.shape == (2, 4, 16) and logvar.shape == (2, 4, 16)

    def test_pnet2stage_and_pcn_encoder(self):
        from difffacto_tpu.models import PCNPartEncoder, Pnet2Stage
        from difffacto_tpu.utils.registry import ENCODERS

        assert "Pnet2Stage" in ENCODERS and "PCN" in ENCODERS
        g = Pnet2Stage(latent_dim=32)
        x = randn(2, 64, 3)
        vs = jax.jit(lambda: g.init(RNGS, x, True))()
        out = g.apply(vs, x, True, mutable=["batch_stats"])[0]
        assert out.shape == (2, 32)
        p = PCNPartEncoder(part_latent_dim=8, num_anchors=4, normalize_latent=True)
        vs = jax.jit(lambda: p.init(RNGS, x, True))()
        out = p.apply(vs, x, True, mutable=["batch_stats"])[0]
        assert out.shape == (2, 4, 8)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-4
        )


class TestAnchorDiffGenPartglot:
    def _model(self):
        from difffacto_tpu.models import AnchorDiffGenPartglot

        return AnchorDiffGenPartglot(
            encoder=dict(type="SupSegsEncoder", sup_segs_dim=8, part_latent_dim=16),
            decomposer=dict(
                type="ComponentMixer", part_latent_dim=16,
                include_attention=True, include_global_feature=True,
            ),
            diffusion=dict(
                type="AnchoredDiffusion",
                net=dict(type="PointwiseNet", point_dim=3, residual=False,
                         hidden=(16, 32, 16)),
                beta_1=1e-4, beta_T=0.02, k=1.0, mode="linear",
                model_mean_type="epsilon", learn_variance=False,
                include_anchors=False, res=False,
            ),
            sampler=dict(type="Uniform"),
            num_anchors=4,
            num_timesteps=5,
            npoints=32,
        )

    def _batch(self, B=2, n_seg=6, npoint=16):
        rng = np.random.RandomState(3)
        return {
            "input": jnp.asarray(rng.randn(B, n_seg, npoint, 3), jnp.float32),
            "ref": jnp.asarray(rng.randn(B, n_seg, npoint, 3), jnp.float32),
            "seg_mask": jnp.asarray(rng.randint(0, 4, (B, n_seg)), jnp.int32),
            "geo_mask": jnp.ones((B, n_seg), jnp.float32).at[:, 5].set(0.0),
        }

    def test_loss(self):
        from difffacto_tpu.models.orchestrators_extra import AnchorDiffGenPartglot

        model = self._model()
        batch = self._batch()
        vs = jax.jit(
            lambda r, b: model.init(r, b, 0, method=AnchorDiffGenPartglot.loss)
        )(RNGS, batch)
        losses, _ = model.apply(
            vs, batch, 0, method=AnchorDiffGenPartglot.loss,
            rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        assert np.isfinite(float(losses["anchor_loss"]))
        assert np.isfinite(float(losses["diffusion_loss"]))

    def test_predict_and_editing(self):
        from difffacto_tpu.models.orchestrators_extra import AnchorDiffGenPartglot

        model = self._model()
        batch = self._batch(B=4)
        vs = jax.jit(
            lambda r, b: model.init(r, b, 0, method=AnchorDiffGenPartglot.loss)
        )(RNGS, batch)
        rngs = {"sample": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(6)}
        out, _ = model.apply(
            vs, batch, method=AnchorDiffGenPartglot.predict, rngs=rngs,
            mutable=["batch_stats"],
        )
        assert out["pred"].shape == (4, 32, 3)
        interp, _ = model.apply(
            vs, batch, 0, 1, 2, 5, method=AnchorDiffGenPartglot.interpolate_latent,
            rngs=rngs, mutable=["batch_stats"],
        )
        assert interp["pred"].shape == (5, 32, 3)
        comb, _ = model.apply(
            vs, batch, [0, 1, 2, 3], method=AnchorDiffGenPartglot.combine_latent,
            rngs=rngs, mutable=["batch_stats"],
        )
        assert comb["pred"].shape == (1, 32, 3)


class TestLatentNets:
    def test_pointwisenet_latent(self):
        from difffacto_tpu.models.denoiser import PointwiseNetLatent

        net = PointwiseNetLatent(
            in_channels=16, out_channels=16, context_dim=16,
            hidden=(8, 16, 8), use_part_ind=True,
        )
        x = randn(2, 4, 16)
        t = jnp.array([0.1, 0.5])
        prior = randn(2, 4, 16, seed=1)
        code = randn(2, 16, seed=2)
        ind = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0]], jnp.float32)
        vs = jax.jit(lambda: net.init(RNGS, x, t, prior, code, ind))()
        out = net.apply(vs, x, t, prior, code, ind)
        assert out.shape == (2, 4, 16)
        assert np.isfinite(np.asarray(out)).all()
        # residual net with gating: code for unselected parts must not matter
        code2 = code + 100.0
        o1 = net.apply(vs, x, t, prior, code, ind)
        o2 = net.apply(vs, x, t, prior, code2, ind)
        assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-4  # selected parts DO change
        ind0 = jnp.zeros_like(ind)
        o3 = net.apply(vs, x, t, prior, code, ind0)
        o4 = net.apply(vs, x, t, prior, code2, ind0)
        np.testing.assert_allclose(np.asarray(o3), np.asarray(o4), atol=1e-5)

    def test_part_code_transformer_v2(self):
        from difffacto_tpu.models.decomposers import PartCodeTransformerV2

        m = PartCodeTransformerV2(
            input_channels=16, output_channels=16, n_ctx=4, width=32,
            layers=2, heads=2, param_cond=False,
        )
        x = randn(2, 4, 16)
        vs = jax.jit(lambda: m.init(RNGS, x))()
        z, codes = m.apply(vs, x)
        # reference V2 get_global_from_part: z IS the flattened codes
        # (transformer.py:300-303)
        assert z.shape == (2, 16) and codes.shape == (2, 16)
