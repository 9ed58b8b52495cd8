"""Function-level golden parity for the reference's utility layer
(utils/misc.py): the gaussian family, anchor assignment and loss parsing —
plus two dead-but-defective helpers executed and pinned.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_parity import REF_ROOT, _install_reference

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not present"
)


def test_gaussian_family_parity():
    """misc.py:287-318 vs utils/gaussian.py: logprob, entropy, standard
    normal logprob, and the dim-scaled log likelihood (whose per-element
    constant uses the FULL dim — a reference quirk kept)."""
    _install_reference()
    from difffacto.utils.misc import (
        gaussian_entropy,
        gaussian_log_likelihood,
        gaussian_logprob,
        standard_normal_logprob,
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto_tpu.utils import gaussian as G

    rng = np.random.RandomState(1)
    z = rng.randn(4, 6, 3).astype(np.float32)
    mu = rng.randn(4, 6, 3).astype(np.float32)
    lv = rng.randn(4, 6, 3).astype(np.float32) * 0.3

    np.testing.assert_allclose(
        np.asarray(G.gaussian_log_likelihood(jnp.asarray(z), jnp.asarray(mu), jnp.asarray(lv))),
        gaussian_log_likelihood(
            torch.from_numpy(z), torch.from_numpy(mu), torch.from_numpy(lv)
        ).numpy(),
        atol=1e-5,
    )
    # standalone logprob (misc.py:287): -logvar (NOT -logvar/2) + const - quad
    want_lp = gaussian_logprob(
        torch.from_numpy(z), torch.from_numpy(mu), torch.from_numpy(lv)
    ).numpy()
    got_lp = np.asarray(
        G.gaussian_log_likelihood(jnp.asarray(z), jnp.asarray(mu), jnp.asarray(lv), dim=1)
    )
    np.testing.assert_allclose(got_lp, want_lp, atol=1e-5)

    np.testing.assert_allclose(
        np.asarray(G.standard_normal_logprob(jnp.asarray(z))),
        standard_normal_logprob(torch.from_numpy(z)).numpy(),
        atol=1e-5,
    )
    # entropy over the latent axis (the dim our models pass)
    np.testing.assert_allclose(
        np.asarray(G.gaussian_entropy(jnp.asarray(lv), axis=-1)),
        gaussian_entropy(torch.from_numpy(lv), dim=-1).numpy(),
        atol=1e-5,
    )


def test_assign_anchor_and_parse_losses_parity():
    """misc.py:120-133 parse_losses + :190-193 assign_anchor."""
    _install_reference()
    from difffacto.utils.misc import assign_anchor as ref_assign
    from difffacto.utils.misc import parse_losses as ref_parse

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto_tpu.ops.points import assign_anchor
    from difffacto_tpu.parallel.train import parse_losses

    rng = np.random.RandomState(2)
    pts = rng.randn(3, 64, 3).astype(np.float32)
    anchors = rng.randn(3, 4, 3).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(assign_anchor(jnp.asarray(pts), jnp.asarray(anchors))),
        ref_assign(torch.from_numpy(pts), torch.from_numpy(anchors)).numpy(),
    )

    losses = {
        "mse_loss": rng.rand(3).astype(np.float32),
        "anchor_loss": np.float32(0.5),
        "aux_metric": np.float32(2.0),  # non-'loss' keys logged, not summed
    }
    t_total, _ = ref_parse(
        {k: torch.as_tensor(v) for k, v in losses.items()}
    )
    j_total, _ = parse_losses({k: jnp.asarray(v) for k, v in losses.items()})
    assert float(j_total) == pytest.approx(float(t_total), rel=1e-6)


def test_pointnet2_geometry_ops_parity():
    """encoders/pointnet2_utils.py — the reference's PURE-torch spec of the
    geometry ops (the CUDA kernels implement the same contract): FPS index
    trajectories (torch.randint patched to 0 to match the CUDA
    start-at-index-0 convention our ops follow), fixed-radius ball query
    incl. the first-in-radius slack fill, and index gathering."""
    from unittest import mock

    _install_reference()
    from difffacto.models.encoders.pointnet2_utils import (
        farthest_point_sample as ref_fps,
    )
    from difffacto.models.encoders.pointnet2_utils import index_points
    from difffacto.models.encoders.pointnet2_utils import (
        query_ball_point as ref_ball,
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto_tpu.ops.points import (
        ball_query,
        furthest_point_sample,
        gather_points_nd,
    )

    rng = np.random.RandomState(3)
    xyz = rng.randn(2, 128, 3).astype(np.float32)
    xt = torch.from_numpy(xyz)

    with mock.patch("torch.randint", side_effect=lambda *a, **k: torch.zeros(a[2], dtype=torch.long)):
        ref_idx = ref_fps(xt, 32).numpy()
    our_idx = np.asarray(furthest_point_sample(jnp.asarray(xyz), 32))
    np.testing.assert_array_equal(our_idx, ref_idx)

    centers_idx = ref_idx[:, :8]
    centers = np.take_along_axis(xyz, centers_idx[..., None], axis=1)
    ref_groups = ref_ball(0.5, 16, xt, torch.from_numpy(centers)).numpy()
    our_groups = np.asarray(
        ball_query(jnp.asarray(centers), jnp.asarray(xyz), 0.5, 16)
    )
    np.testing.assert_array_equal(our_groups, ref_groups)

    gathered_ref = index_points(xt, torch.from_numpy(centers_idx.astype(np.int64))).numpy()
    gathered_ours = np.asarray(
        gather_points_nd(jnp.asarray(xyz), jnp.asarray(centers_idx.astype(np.int32)))
    )
    np.testing.assert_allclose(gathered_ours, gathered_ref, atol=0)


def test_reference_dead_misc_helper_defective_pinned():
    """pad_unmasked_element_by_zero applies python ``not`` to a multi-element
    tensor — RuntimeError for any real mask (misc.py:102-108; called
    nowhere). (misc.py:345-363 ``get_part_loss`` is even deader: the whole
    definition sits inside a triple-quoted string and references an
    undefined global — not even importable.)"""
    _install_reference()
    import difffacto.utils.misc as rmisc
    from difffacto.utils.misc import pad_unmasked_element_by_zero

    x = torch.randn(2, 5)
    m = torch.ones(2, 5)
    with pytest.raises(RuntimeError):
        pad_unmasked_element_by_zero(x, m)
    assert not hasattr(rmisc, "get_part_loss")
