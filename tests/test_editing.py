"""Editing-application tests: mixing, interpolation, one-part resampling,
noise optimization, shape editing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_model import init_model, tiny_batch, N_CLASS, NPOINTS, ZDIM

from difffacto_tpu.runner.editing import (
    combine_latent,
    combine_latent_specific,
    interpolate_latent,
    interpolate_params,
    optimize_noise,
    sample_one_part,
    shape_edit,
)


@pytest.fixture(scope="module")
def model_setup():
    return init_model(B=4)


def test_combine_latent(model_setup):
    model, variables, _ = model_setup
    batch = tiny_batch(B=4)
    out = combine_latent(model, variables, jax.random.PRNGKey(0), batch, K=2)
    assert out["pred"].shape == (4, NPOINTS, 3)
    assert "pred_sample_1" in out
    assert np.isfinite(out["pred"]).all()


def test_combine_latent_specific(model_setup):
    model, variables, _ = model_setup
    rng = np.random.RandomState(0)
    parts = [rng.randn(8, 3).astype(np.float32) * 0.2 for _ in range(N_CLASS)]
    parts[3] = np.zeros((8, 3), np.float32)  # absent part
    out = combine_latent_specific(model, variables, jax.random.PRNGKey(1), parts, K=2)
    assert out["pred"].shape == (1, NPOINTS, 3)
    assert np.isfinite(out["pred"]).all()


def test_interpolate_latent(model_setup):
    model, variables, _ = model_setup
    batch = tiny_batch(B=2)
    out = interpolate_latent(model, variables, jax.random.PRNGKey(2), batch, part_id=1, mid_num=3)
    assert out["pred"].shape == (2, NPOINTS, 3)
    assert "interpolate sample 2" in out
    # endpoints differ (interpolation actually changes the latent)
    assert not np.allclose(out["interpolate sample 0"], out["interpolate sample 2"])


def test_interpolate_params(model_setup):
    model, variables, _ = model_setup
    batch = tiny_batch(B=2)
    out = interpolate_params(model, variables, jax.random.PRNGKey(3), batch, part_id=1)
    K = model.cimle_sample_num
    assert out["pred"].shape == (2, NPOINTS, 3)
    assert f"interpolate sample {K - 1}" in out


def test_sample_one_part(model_setup):
    model, variables, _ = model_setup
    rng = np.random.RandomState(0)
    S = 2
    codes = rng.randn(S, N_CLASS, ZDIM).astype(np.float32)
    valid = np.ones((S, N_CLASS), np.float32)
    gt_mean = rng.randn(S, N_CLASS, 3).astype(np.float32) * 0.1
    gt_logvar = rng.randn(S, N_CLASS, 3).astype(np.float32) * 0.1
    seg = np.repeat(np.arange(N_CLASS), NPOINTS // N_CLASS)[None].repeat(S, 0)
    out = sample_one_part(
        model, variables, jax.random.PRNGKey(4), codes, valid, gt_mean, gt_logvar,
        seg, part_id=1, sample_num_each=2, noise_search=5,
    )
    assert out["pred"].shape == (S, 2, NPOINTS, 3)
    # unedited parts' codes preserved
    np.testing.assert_allclose(out["codes"][:, 0, 0], codes[:, 0], atol=1e-5)
    assert not np.allclose(out["codes"][:, 0, 1], codes[:, 1])

    # diverse param subsampling path (part_encoders.py:683-687): keep 2
    # parameter sets per variant, selective greedy and first-P flavors
    for selective in (True, False):
        out2 = sample_one_part(
            model, variables, jax.random.PRNGKey(5), codes, valid, gt_mean,
            gt_logvar, seg, part_id=1, sample_num_each=2, noise_search=5,
            fix_size=False, param_sample_num=2, selective=selective,
        )
        assert out2["pred"].shape == (S, 4, NPOINTS, 3)
        assert np.isfinite(out2["pred"]).all()
        # the two parameter sets of one variant differ (diverse/distinct draws)
        assert not np.allclose(out2["means"][:, 0], out2["means"][:, 1])


def test_optimize_noise_decreases_loss(model_setup):
    model, variables, _ = model_setup
    batch = tiny_batch(B=2)
    z, history = optimize_noise(model, variables, jax.random.PRNGKey(5), batch, steps=10, lr=0.5)
    assert z.shape == (2, 32)
    assert history[-1] < history[0]


def test_shape_edit(model_setup):
    model, variables, _ = model_setup
    batch = tiny_batch(B=2)
    target_mean = jnp.asarray(np.array([[0.5, 0.0, 0.0]] * 2, np.float32))
    out = shape_edit(
        model, variables, jax.random.PRNGKey(6), batch,
        edit_part_id=1, edit_part_mean=target_mean, steps=5, lr=0.1,
    )
    assert out["pred"].shape == (2, NPOINTS, 3)
    assert np.isfinite(out["loss"])


def test_interpolate_two_shapes(model_setup):
    from difffacto_tpu.runner.editing import interpolate_two_shapes

    model, variables, _ = model_setup
    b1, b2 = tiny_batch(B=2), tiny_batch(B=2, rng=np.random.RandomState(9))
    pred, seg = interpolate_two_shapes(
        model, variables, jax.random.PRNGKey(11),
        np.asarray(b1["input"]), np.asarray(b1["ref_seg_mask"]),
        np.asarray(b2["input"]), np.asarray(b2["ref_seg_mask"]),
        part_id=1, mid_num=3,
    )
    assert pred.shape == (2, 3, NPOINTS, 3)
    assert np.isfinite(pred).all()


def test_select_best_noise_whole(model_setup):
    from difffacto_tpu.runner.editing import select_best_noise_whole

    model, variables, _ = model_setup
    batch = tiny_batch(B=2)
    noise, best, selected = select_best_noise_whole(
        model, variables, jax.random.PRNGKey(12), batch, num=3
    )
    assert noise.shape[:2] == (2, 3)
    assert selected.shape == (2, noise.shape[-1])
