"""Golden parity for GAN losses and completion-crop utilities against the
reference's OWN code: utils/gan_losses.py (the GanRunner's import path),
metrics/common.py (interpolated GP), and utils/misc.py:separate_point_cloud.

The two reference ``normal_kl``s are already disambiguated elsewhere: the
live one (diffusions/diffusion_utils.py:5, ``-dim`` form) is golden-tested
through the vb branch in test_reference_parity.py; models/losses/losses.py:5
(``-1`` form) is dead code in the reference (only star-imported, never
called).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_reference_parity import _install_reference  # noqa: E402

REF_ROOT = "/root/reference/python"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not present"
)


def _scores(seed):
    rng = np.random.RandomState(seed)
    return rng.randn(6).astype(np.float32), rng.randn(6).astype(np.float32)


@pytest.mark.parametrize("loss_type", ["wgan", "hinge"])
def test_gen_dis_loss_parity(loss_type):
    """utils/gan_losses.py:4-59 vs models/gan.py — weight folding included."""
    _install_reference()
    from difffacto.utils.gan_losses import dis_loss as ref_dis
    from difffacto.utils.gan_losses import gen_loss as ref_gen

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto_tpu.models.gan import dis_loss, gen_loss

    r, f = _scores(0)
    w = 0.7
    ref_g, _ = ref_gen(torch.from_numpy(r), torch.from_numpy(f), loss_type=loss_type, weight=w)
    ref_d, _ = ref_dis(torch.from_numpy(r), torch.from_numpy(f), loss_type=loss_type, weight=w)
    our_g = w * float(gen_loss(jnp.asarray(f), loss_type))
    our_d = w * float(dis_loss(jnp.asarray(r), jnp.asarray(f), loss_type))
    assert our_g == pytest.approx(float(ref_g), rel=1e-6)
    assert our_d == pytest.approx(float(ref_d), rel=1e-6)


def _critic_weights():
    return np.random.RandomState(3).randn(5, 7).astype(np.float32)


def test_gradient_penalty_zero_center_parity():
    """utils/gan_losses.py:68-89 (the GanRunner default): the penalty is the
    SQUARED MEAN of per-sample gradient norms at real samples."""
    _install_reference()
    from difffacto.utils.gan_losses import gradient_penalty as ref_gp

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto_tpu.models.gan import gradient_penalty

    W = _critic_weights()
    x = np.random.RandomState(4).randn(6, 5).astype(np.float32)

    xt = torch.from_numpy(x.copy()).requires_grad_(True)
    d_real = torch.sin(xt @ torch.from_numpy(W)).sum(-1)
    ref, stats = ref_gp(xt, None, d_real, None, weight=2.5, gp_type="zero_center")

    critic = lambda a: jnp.sin(a @ jnp.asarray(W)).sum(-1)
    ours = gradient_penalty(
        critic, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x), 2.5,
        gp_type="zero_center",
    )
    assert float(ours) == pytest.approx(float(ref), rel=1e-5)
    assert float(stats["grad_norm"]) > 0  # sanity: non-degenerate critic


def test_gradient_penalty_interpolated_parity():
    """metrics/common.py:64-87 — same eps injected on both sides."""
    _install_reference()
    from difffacto.metrics.common import gradient_penalty as ref_gp

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto_tpu.models.gan import gradient_penalty

    W = _critic_weights()
    rng = np.random.RandomState(5)
    real = rng.randn(6, 5).astype(np.float32)
    fake = rng.randn(6, 5).astype(np.float32)

    key = jax.random.PRNGKey(11)
    critic = lambda a: jnp.sin(a @ jnp.asarray(W)).sum(-1)
    ours = gradient_penalty(
        critic, key, jnp.asarray(real), jnp.asarray(fake), 2.5,
        gp_type="interpolated",
    )

    # replicate the eps draw our implementation makes, then feed the SAME
    # interpolates to the reference's formula
    eps = np.asarray(jax.random.uniform(key, (real.shape[0], 1)))
    interp = torch.from_numpy(real * eps + fake * (1 - eps)).requires_grad_(True)
    d_interp = torch.sin(interp @ torch.from_numpy(W)).sum(-1)
    d_dummy = torch.zeros(6)
    ref, _ = ref_gp(
        None, None, d_dummy, None, weight=2.5, gp_type="interpolated",
        interpolated=interp, d_interpolated=d_interp,
    )
    assert float(ours) == pytest.approx(float(ref), rel=1e-5)


@pytest.mark.parametrize("padding_zeros", [False, True])
def test_separate_point_cloud_parity(padding_zeros):
    """utils/misc.py:206-259 vs data/dataset_utils.py:separate_point_cloud,
    randomness pinned via fixed_points + scalar crop: identical crop region,
    point ORDER (ascending distance), and zero-padding placement."""
    _install_reference()
    from difffacto.utils.misc import separate_point_cloud as ref_sep

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto_tpu.data.dataset_utils import separate_point_cloud

    rng = np.random.RandomState(6)
    xyz = rng.randn(3, 64, 3).astype(np.float32)
    center = np.asarray([0.3, -0.5, 0.8], np.float32)

    ref_in, ref_crop = ref_sep(
        torch.from_numpy(xyz.copy()), 64, 20,
        fixed_points=torch.from_numpy(center.copy()), padding_zeros=padding_zeros,
    )
    our_in, our_crop = separate_point_cloud(
        jnp.asarray(xyz), 64, 20, fixed_points=center, padding_zeros=padding_zeros
    )
    np.testing.assert_allclose(
        np.asarray(our_in), ref_in.numpy(), atol=1e-6, err_msg="input half"
    )
    np.testing.assert_allclose(
        np.asarray(our_crop), ref_crop.numpy(), atol=1e-6, err_msg="crop half"
    )
