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
