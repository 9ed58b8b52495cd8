"""End-to-end model tests: training loss and generation on tiny shapes.

Configs mirror configs/gen_chair.py (reference configs/gen_chair.py:1-100)
scaled down (T=5, npoints=32, zdim=16) so the whole pipeline runs on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from difffacto_tpu.models import (
    AnchorDiffAE,
    decode,
    reconstruct,
    sample_generation,
    select_best_noise,
)

N_CLASS = 4
NPOINTS = 32
ZDIM = 16
T = 5


def tiny_model_cfg(gen=True, cimle=True, learn_variance=True, mean_type="epsilon",
                   var_type="fixed_small", use_gt_params=False):
    return dict(
        encoder=dict(
            type="PartEncoderForTransformerDecoder",
            encoder=dict(type="PointNetV2", zdim=ZDIM, point_dim=3, per_part_mlp=True),
            part_aligner=dict(
                type="PartAlignerTransformer",
                in_channels=ZDIM,
                out_channels=6,
                n_class=N_CLASS,
                d_head=8,
                depth=2,
                n_heads=2,
                dropout=0.0,
                use_linear=True,
                class_cond=True,
                single_attn=True,
                add_class_cond=True,
                cimle=cimle,
                noise_scale=100,
                cond_noise_type=0,
            ),
            n_class=N_CLASS,
            kl_weight=1e-3,
            fit_loss_type=4,
            fit_loss_weight=1.0,
            use_flow=True,
            latent_flow_depth=4,
            latent_flow_hidden_dim=16,
            include_z=False,
            include_part_code=True,
            include_params=True,
            use_gt_params=use_gt_params,
            gen=gen,
            prior_var=1.0,
        ),
        diffusion=dict(
            type="AnchoredDiffusion",
            net=dict(
                type="TransformerNet",
                in_channels=3,
                out_channels=3 if var_type in ("fixed_small", "fixed_large") else 6,
                n_heads=2,
                d_head=8,
                depth=2,
                dropout=0.0,
                context_dim=ZDIM + 6,
                n_class=N_CLASS,
                class_cond=True,
                use_linear=True,
                cat_params_to_x=True,
                single_attn=True,
                cat_class_to_x=True,
            ),
            beta_1=1e-4,
            beta_T=0.02,
            k=1.0,
            res=False,
            mode="linear",
            use_beta=False,
            model_mean_type=mean_type,
            model_var_type=var_type,
            learn_variance=learn_variance,
            loss_type="mse",
            include_anchors=False,
        ),
        sampler=dict(type="Uniform"),
        num_anchors=N_CLASS,
        num_timesteps=T,
        npoints=NPOINTS,
        gen=gen,
        cimle=cimle,
        cimle_sample_num=2,
        ret_traj=False,
        ret_interval=2,
    )


def tiny_batch(B=2, rng=None):
    rng = rng or np.random.RandomState(0)
    seg = np.repeat(np.arange(N_CLASS), NPOINTS // N_CLASS)[None].repeat(B, 0)
    pts = rng.randn(B, NPOINTS, 3).astype(np.float32) * 0.3
    onehot = np.eye(N_CLASS, dtype=np.float32)[seg]
    return {
        "input": jnp.asarray(pts),
        "ref": jnp.asarray(pts),
        "ref_seg_mask": jnp.asarray(seg, jnp.int32),
        "seg_mask": jnp.asarray(seg, jnp.int32),
        "ref_attn_map": jnp.asarray(onehot),
        "attn_map": jnp.asarray(onehot),
        "present": jnp.ones((B, N_CLASS), jnp.float32),
        "dp_present": jnp.ones((B, N_CLASS), jnp.float32),
        "part_shift": jnp.asarray(rng.randn(B, N_CLASS, 3).astype(np.float32) * 0.1),
        "part_scale": jnp.asarray(
            np.abs(rng.randn(B, N_CLASS, 3)).astype(np.float32) * 0.2 + 0.3
        ),
        "noise": jnp.zeros((B, 1), jnp.float32),
        "shift": jnp.zeros((B, 1, 3), jnp.float32),
        "scale": jnp.ones((B, 1, 1), jnp.float32),
    }


def init_model(cfg_kwargs=None, B=2):
    cfg = tiny_model_cfg(**(cfg_kwargs or {}))
    model = AnchorDiffAE(**cfg)
    batch = tiny_batch(B)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    # jit the init: eager (op-by-op) tracing on CPU is pathologically slow.
    init_fn = jax.jit(lambda r, b: model.init(r, b, 0, method=AnchorDiffAE.loss))
    variables = init_fn(rngs, batch)
    return model, variables, batch


def apply_loss(model, variables, batch, epoch=0, seed=3):
    """Run the training loss with mutable batch_stats (train-mode BN), jitted."""

    @jax.jit
    def run(variables, batch, epoch, rngs):
        losses, _ = model.apply(
            variables, batch, epoch, method=AnchorDiffAE.loss, rngs=rngs,
            mutable=["batch_stats"],
        )
        return losses

    rngs = {"sample": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(seed + 1)}
    return run(variables, batch, epoch, rngs)


class TestTraining:
    def test_loss_keys_and_finite(self):
        model, variables, batch = init_model()
        losses = apply_loss(model, variables, batch)
        for key in ("mse_loss", "fit_loss", "prior_loss"):
            assert key in losses, losses.keys()
            assert np.isfinite(np.asarray(losses[key])).all(), key

    def test_grads_nonzero(self):
        model, variables, batch = init_model()
        params = variables["params"]
        others = {k: v for k, v in variables.items() if k != "params"}

        def total_loss(p):
            losses, _ = model.apply(
                {"params": p, **others},
                batch,
                0,
                method=AnchorDiffAE.loss,
                rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
                mutable=["batch_stats"],
            )
            return sum(v.mean() for k, v in losses.items() if "loss" in k)

        g = jax.jit(jax.grad(total_loss))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        total_norm = sum(float(jnp.abs(l).sum()) for l in leaves)
        assert total_norm > 0

    def test_gt_params_stage1(self):
        model, variables, batch = init_model({"use_gt_params": True, "cimle": False})
        losses = apply_loss(model, variables, batch)
        assert np.isfinite(np.asarray(losses["mse_loss"]))


class TestSampling:
    def test_generation_shapes(self):
        model, variables, batch = init_model()
        out = sample_generation(
            model, variables, jax.random.PRNGKey(5), sample_num=2,
            valid_id=jnp.ones((2, N_CLASS)),
        )
        SK = 2 * model.cimle_sample_num
        assert out["pred"].shape == (SK, NPOINTS, 3)
        assert out["seg_mask"].shape == (SK, NPOINTS)
        assert np.isfinite(np.asarray(out["pred"])).all()

    def test_generation_traj(self):
        model, variables, batch = init_model()
        out = sample_generation(
            model, variables, jax.random.PRNGKey(5), sample_num=1,
            valid_id=jnp.ones((1, N_CLASS)), ret_traj=True,
        )
        assert "traj" in out and out["traj"].shape[1:] == out["pred"].shape

    def test_reconstruct(self):
        model, variables, batch = init_model()
        out = reconstruct(model, variables, jax.random.PRNGKey(6), batch)
        assert out["pred"].shape == batch["ref"].shape
        assert np.isfinite(np.asarray(out["pred"])).all()

    def test_select_best_noise(self):
        model, variables, batch = init_model()
        noise, best, selected = select_best_noise(
            model, variables, jax.random.PRNGKey(7), batch, num=4
        )
        B = batch["ref"].shape[0]
        assert noise.shape[:2] == (B, 4)
        assert selected.shape == (B, noise.shape[-1])

    def test_missing_part_masked(self):
        """Absent parts: seg slots remapped, generation stays finite."""
        model, variables, batch = init_model()
        vid = jnp.ones((2, N_CLASS)).at[:, 3].set(0.0)
        out = sample_generation(
            model, variables, jax.random.PRNGKey(8), sample_num=2, valid_id=vid
        )
        assert np.isfinite(np.asarray(out["pred"])).all()
        # no point should be assigned to the absent part
        assert not np.any(np.asarray(out["seg_mask"]) == 3)


class TestPSampleLoopEquivalence:
    def test_scan_matches_manual_unroll(self):
        """p_sample_loop's scan == stepping p_sample by hand with the same
        rng discipline — pins the carry/xs threading."""
        from difffacto_tpu.models.diffusion import AnchoredDiffusion

        T, B, N = 5, 2, 16
        diff = AnchoredDiffusion(
            num_timesteps=T, beta_1=1e-4, beta_T=0.02, k=1.0, res=False,
            use_beta=False, model_mean_type="epsilon",
            model_var_type="fixed_small", include_anchors=False,
        )
        anchors = jnp.asarray(
            np.random.RandomState(0).randn(B, N, 3), jnp.float32
        )

        def model_fn(inp, ts, ctx, anc, var, seg, vid):
            return jnp.tanh(inp[..., :3]) * 0.1

        rng = jax.random.PRNGKey(42)
        out = diff.p_sample_loop(model_fn, rng, anchors)

        init_rng, chain_rng = jax.random.split(rng)
        L = jnp.sqrt(jnp.full_like(anchors, diff.k * diff.k))
        x = L * jax.random.normal(init_rng, anchors.shape) + anchors
        steps = np.asarray(diff.steps)[::-1]
        step_rngs = jax.random.split(chain_rng, T)
        for i, t_scalar in enumerate(steps):
            t = jnp.full((B,), int(t_scalar), jnp.int32)
            noise = jax.random.normal(step_rngs[i], x.shape, x.dtype)
            x = diff.p_sample(
                model_fn, None, x, t, anchors, noise=noise
            )["sample"]
        np.testing.assert_allclose(
            np.asarray(out["pred"]), np.asarray(x), rtol=1e-5, atol=1e-5
        )


class TestVariants:
    @pytest.mark.parametrize("mean_type", ["x_0", "epsilon", "drifted_epsilon4", "scaled_epsilon"])
    def test_mean_types(self, mean_type):
        model, variables, batch = init_model({"mean_type": mean_type})
        losses = apply_loss(model, variables, batch)
        assert np.isfinite(np.asarray(losses["mse_loss"]))

    def test_learned_range_vb(self):
        model, variables, batch = init_model({"var_type": "learned_range"})
        losses = apply_loss(model, variables, batch)
        assert "vb_loss" in losses
        assert np.isfinite(np.asarray(losses["vb_loss"]))
