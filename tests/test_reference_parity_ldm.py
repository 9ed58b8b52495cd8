"""Golden parity for the LATENT diffusion math against the reference's own
``LDM`` class (models/diffusions/latent_diffusion.py:12-551), driven through
the real LDMNet under ingested weights with injected noise: q_sample, the
training loss (unmasked and valid_id-masked reductions), and the
deterministic p_mean_variance posterior.

Our LDM is a flag configuration of the one verified AnchoredDiffusion
(models/diffusion_extra.py:71); this file proves that delegation is
numerically exact against the reference's standalone implementation.

Also pins: networks/latent_diffusion.py ``LatentDiffEdit.forward`` is
unrunnable as shipped — its training call passes prior/code/part_indicator/
anchors, matching neither LDM.training_losses (ctx/reduce/valid_id) nor
LatentDiffusionDrift.training_losses (no anchors kwarg).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_parity import REF_ROOT, _install_reference
from test_reference_parity_modules import _params_from, _sd

from difffacto_tpu.utils.torch_ingest import _map_transformer_like

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not present"
)

B, K, C, T = 3, 4, 12, 10
HEADS, DH, DEPTH = 4, 64, 2


def test_reference_latent_diffusion_unimportable_as_shipped():
    """Both latent-diffusion modules import from the project's STALE
    pre-rename package name (``anchor_diff``, latent_diffusion.py:3,
    latent_diffusion_drift.py:3) and are commented out of
    diffusions/__init__.py:2 — ModuleNotFoundError on import, and 'LDM' is
    absent from the DIFFUSIONS registry as shipped. Must run FIRST in this
    file: later tests alias the stale name to execute the math anyway."""
    _install_reference()
    from difffacto.utils.registry import DIFFUSIONS as REF_DIFFUSIONS

    assert "LDM" not in REF_DIFFUSIONS._modules
    assert "difffacto.models.diffusions.latent_diffusion" not in sys.modules
    with pytest.raises(ModuleNotFoundError):
        import difffacto.models.diffusions.latent_diffusion  # noqa: F401


def _alias_stale_anchor_diff():
    """Map the stale ``anchor_diff`` import name onto the reference package
    so the shipped-broken latent-diffusion modules can be executed."""
    _install_reference()
    import difffacto.utils.constants  # noqa: F401
    import difffacto.utils.misc  # noqa: F401
    import difffacto.utils.registry  # noqa: F401

    for name in ("", ".utils", ".utils.registry", ".utils.constants", ".utils.misc"):
        sys.modules["anchor_diff" + name] = sys.modules["difffacto" + name]


def _pair():
    """Reference LDM + our LDM factory + our LDMNet with ingested weights."""
    _alias_stale_anchor_diff()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto.models.diffusions.latent_diffusion import LDM as RefLDM

    from difffacto_tpu.models.denoiser import LDMNet
    from difffacto_tpu.models.diffusion_extra import LDM as build_ldm

    net_kw = dict(
        in_channels=C, n_heads=HEADS, d_head=DH, out_channels=C, depth=DEPTH,
        context_dim=None, single_attn=True, class_cond=False, n_class=K,
        cond_time_as_token=True, mask_out_unreferenced_code=True,
    )
    torch.manual_seed(31)
    ref = RefLDM(
        net=dict(type="LDMNet", use_linear=True, **net_kw),
        num_timesteps=T, beta_1=1e-4, beta_T=0.05,
    ).eval()
    with torch.no_grad():  # proj_out is zero-init; randomize for a real test
        ref.model.proj_out.weight.normal_(0, 0.05)
        ref.model.proj_out.bias.normal_(0, 0.05)

    ours = build_ldm(num_timesteps=T, beta_1=1e-4, beta_T=0.05)
    net = LDMNet(**net_kw)
    rng = np.random.RandomState(31)
    x = rng.randn(B, K, C).astype(np.float32)
    valid = np.ones((B, K), np.float32)
    valid[2, 0] = 0.0
    variables = jax.jit(
        lambda: net.init(
            jax.random.PRNGKey(0), jnp.asarray(x),
            jnp.zeros((B,), jnp.int32), None, valid_id=jnp.asarray(valid),
        )
    )()
    V = _params_from(
        variables,
        lambda sd, fill: _map_transformer_like(
            sd, fill, "model", "", DEPTH, single_attn=True, has_time_embed=True
        ),
        _sd(ref),
    )

    def model_fn(inp, ts, ctx, anc, var, seg, vid):
        return net.apply(V, inp, jnp.asarray(ts, jnp.int32), ctx, valid_id=vid)

    return ref, ours, model_fn, x, valid


def test_ldm_q_sample_and_training_loss_parity():
    import jax
    import jax.numpy as jnp

    ref, ours, model_fn, x, valid = _pair()
    rng = np.random.RandomState(32)
    noise = rng.randn(B, K, C).astype(np.float32)
    t = np.asarray([0, 4, 9], np.int64)

    # q_sample
    xt_ref = ref.q_sample(
        torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(t),
        noise=torch.from_numpy(noise.transpose(0, 2, 1)),
    )
    xt_ours = ours.q_sample(
        None, jnp.asarray(x), jnp.asarray(t, jnp.int32),
        jnp.zeros_like(jnp.asarray(x)), noise=jnp.asarray(noise),
    )
    np.testing.assert_allclose(
        np.asarray(xt_ours), xt_ref.numpy().transpose(0, 2, 1), atol=1e-5
    )

    # training loss, unmasked
    with torch.no_grad():
        ref_losses = ref.training_losses(
            torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(t),
            ctx=None, noise=torch.from_numpy(noise.transpose(0, 2, 1)),
        )
    our_losses = ours.training_losses(
        model_fn, jax.random.PRNGKey(0), jnp.asarray(x),
        jnp.asarray(t, jnp.int32), anchors=jnp.zeros_like(jnp.asarray(x)),
        noise=jnp.asarray(noise),
    )
    np.testing.assert_allclose(
        float(our_losses["mse_loss"]), float(ref_losses["mse_loss"]), rtol=2e-4
    )

    # training loss, valid_id-masked: mean over channels, masked token
    # sum / count (latent_diffusion.py:541-546) == our flags reduction
    with torch.no_grad():
        ref_masked = ref.training_losses(
            torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(t),
            ctx=None, valid_id=torch.from_numpy(valid),
            noise=torch.from_numpy(noise.transpose(0, 2, 1)),
        )
    our_masked = ours.training_losses(
        model_fn, jax.random.PRNGKey(0), jnp.asarray(x),
        jnp.asarray(t, jnp.int32), anchors=jnp.zeros_like(jnp.asarray(x)),
        valid_id=jnp.asarray(valid), flags=jnp.asarray(valid),
        noise=jnp.asarray(noise),
    )
    np.testing.assert_allclose(
        float(our_masked["mse_loss"]), float(ref_masked["mse_loss"]), rtol=2e-4
    )


def test_ldm_p_mean_variance_parity():
    import jax.numpy as jnp

    ref, ours, model_fn, x, valid = _pair()
    rng = np.random.RandomState(33)
    xt = rng.randn(B, K, C).astype(np.float32)
    t = np.asarray([1, 5, 8], np.int64)
    with torch.no_grad():
        out_ref = ref.p_mean_variance(
            torch.from_numpy(xt.transpose(0, 2, 1)), torch.from_numpy(t),
            ctx=None, valid_id=torch.from_numpy(valid),
        )
    out_ours = ours.p_mean_variance(
        model_fn, jnp.asarray(xt), jnp.asarray(t, jnp.int32),
        jnp.zeros_like(jnp.asarray(xt)), valid_id=jnp.asarray(valid),
    )
    # pred_xstart amplifies the depth-2 net's f32 drift by
    # sqrt_recip(m1)_alphas_cumprod — composed tolerance, not elementwise
    for key in ("mean", "pred_xstart", "log_variance"):
        np.testing.assert_allclose(
            np.asarray(out_ours[key]),
            out_ref[key].numpy().transpose(0, 2, 1)
            if out_ref[key].ndim == 3
            else out_ref[key].numpy(),
            atol=3e-3,
            err_msg=key,
        )


def test_drift_latent_diffusion_math_parity():
    """latent_diffusion_drift.py:105-467 vs our LatentDiffusionDrift
    configuration: despite its name the shipped math is a VANILLA chain
    (training q_samples with a ZERO prior, :480; p_mean_variance zeroes the
    prior, :219) with classifier-free guidance over (prior, code)
    conditioning. Checked with an identical analytic net on both sides:
    q_sample, the training loss, and the guided p_mean_variance posterior."""
    _alias_stale_anchor_diff()
    import difffacto.models.diffusions.latent_diffusion_drift as drift_mod

    import jax
    import jax.numpy as jnp

    from difffacto_tpu.models.diffusion_extra import LatentDiffusionDrift

    W = np.random.RandomState(41).randn(C, C).astype(np.float32) * 0.3
    V = np.random.RandomState(42).randn(C, C).astype(np.float32) * 0.3

    class _AnalyticNet(torch.nn.Module):
        def forward(self, x, t, prior, code, part_indicator=None):
            # x/prior/code channel-first (B, C, K)
            h = torch.einsum("bck,cd->bdk", x, torch.from_numpy(W))
            h = h + torch.einsum("bck,cd->bdk", prior + code, torch.from_numpy(V))
            return torch.sin(h) + 0.1 * x

    torch.manual_seed(43)
    ref = drift_mod.LatentDiffusionDrift(
        net=dict(type="LDMNet", use_linear=True, in_channels=C, n_heads=2,
                 d_head=8, out_channels=C, depth=1, context_dim=None,
                 single_attn=True, mask_out_unreferenced_code=True),
        num_timesteps=T, beta_1=1e-4, beta_T=0.05, classifier_weight=2.0,
    ).eval()
    ref.model = _AnalyticNet()

    ours = LatentDiffusionDrift(
        num_timesteps=T, beta_1=1e-4, beta_T=0.05, classifier_weight=2.0
    )

    rng = np.random.RandomState(44)
    x = rng.randn(B, K, C).astype(np.float32)
    prior = rng.randn(B, K, C).astype(np.float32)
    code = rng.randn(B, K, C).astype(np.float32)
    noise = rng.randn(B, K, C).astype(np.float32)
    t = np.asarray([1, 4, 8], np.int64)

    def model_fn(inp, ts, ctx, anc, var, seg, vid):
        p, c = ctx
        h = jnp.einsum("bkc,cd->bkd", inp, jnp.asarray(W))
        h = h + jnp.einsum("bkc,cd->bkd", p + c, jnp.asarray(V))
        return jnp.sin(h) + 0.1 * inp

    cf = lambda a: torch.from_numpy(a.transpose(0, 2, 1))

    # q_sample with a ZERO prior (the shipped training path)
    xt_ref = ref.q_sample(cf(x), torch.from_numpy(t), torch.zeros_like(cf(x)),
                          noise=cf(noise))
    xt_ours = ours.q_sample(None, jnp.asarray(x), jnp.asarray(t, jnp.int32),
                            jnp.zeros((B, K, C)), noise=jnp.asarray(noise))
    np.testing.assert_allclose(
        np.asarray(xt_ours), xt_ref.numpy().transpose(0, 2, 1), atol=1e-5
    )

    # training_losses is ALSO broken as shipped: the target dict eagerly
    # evaluates its PREVIOUS_X entry, whose q_posterior_mean_variance call
    # omits the required prior arg — TypeError for EVERY mean type
    # (latent_diffusion_drift.py:488-490). Pin, then compare against the
    # intended epsilon-mse rebuilt from the reference's own pieces.
    with torch.no_grad():
        with pytest.raises(TypeError):
            ref.training_losses(cf(x), torch.from_numpy(t), cf(prior), cf(code),
                                noise=cf(noise))
        ref_out = ref.model(xt_ref, ref._scale_timesteps(torch.from_numpy(t)),
                            cf(prior), cf(code))
        want = ((cf(noise) - ref_out) ** 2).mean(dim=(1, 2)).numpy()
    our_losses = ours.training_losses(
        model_fn, jax.random.PRNGKey(0), jnp.asarray(x),
        jnp.asarray(t, jnp.int32), anchors=jnp.zeros((B, K, C)),
        ctx=(jnp.asarray(prior), jnp.asarray(code)), noise=jnp.asarray(noise),
        reduce=False,
    )
    got = np.asarray(our_losses["mse_loss"]).reshape(B, -1).mean(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # guided posterior: uncond leg zeroes prior AND code on both sides
    with torch.no_grad():
        out_ref = ref.p_mean_variance(cf(x), torch.from_numpy(t), cf(prior), cf(code))
    out_ours = ours.p_mean_variance(
        model_fn, jnp.asarray(x), jnp.asarray(t, jnp.int32),
        jnp.zeros((B, K, C)), ctx=(jnp.asarray(prior), jnp.asarray(code)),
    )
    for key in ("mean", "pred_xstart", "log_variance"):
        np.testing.assert_allclose(
            np.asarray(out_ours[key]),
            out_ref[key].numpy().transpose(0, 2, 1)
            if out_ref[key].ndim == 3
            else out_ref[key].numpy(),
            atol=1e-4,
            err_msg=key,
        )


def test_reference_latent_diff_edit_unbuildable_as_shipped():
    """networks/latent_diffusion.py:35 injects ``num_part=num_anchors`` into
    the diffusion build — a kwarg NEITHER latent diffusion's __init__
    accepts — so LatentDiffEdit cannot even be constructed with either LDM
    or LatentDiffusionDrift (and had it built, its training call passes
    prior/code/part_indicator/anchors, matching neither training_losses
    signature)."""
    _alias_stale_anchor_diff()
    import difffacto.models.diffusions.latent_diffusion  # noqa: F401  register LDM
    import difffacto.models.diffusions.latent_diffusion_drift  # noqa: F401
    from difffacto.models.networks.latent_diffusion import LatentDiffEdit

    torch.manual_seed(34)
    net = dict(
        type="LDMNet", use_linear=True, in_channels=C, n_heads=HEADS,
        d_head=DH, out_channels=C, depth=1, context_dim=None,
        single_attn=True, mask_out_unreferenced_code=True,
    )
    for diff_type in ("LDM", "LatentDiffusionDrift"):
        with pytest.raises(TypeError):
            LatentDiffEdit(
                encoder=dict(type="PCN", point_dim=3 + K, part_latent_dim=C),
                diffusion=dict(
                    type=diff_type, net=dict(net),
                    num_timesteps=T, beta_1=1e-4, beta_T=0.05,
                ),
                sampler=dict(type="Uniform"),
                language_encoder=dict(type="LSTM", text_dim=C),
                pcd_mixer=dict(
                    type="ComponentMixer", part_latent_dim=C,
                    include_attention=True, include_global_feature=True,
                    nheads=4, mlp_type=0,
                ),
                num_anchors=K, num_timesteps=T,
            )
