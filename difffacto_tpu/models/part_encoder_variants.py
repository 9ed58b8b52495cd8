"""PartEncoder variants and the MLP CIMLE aligner.

Re-implements the remaining encoder-family variants (reference:
python/difffacto/models/encoders/part_encoders.py:167-254, 1258-1760):

* ``PartAlignerCIMLE`` — MLP aligner with a noise encoder (norm='bn' path);
* ``PartEncodercVAE`` — conditional-VAE aligner noise: at train time the
  noise comes from a posterior over (part codes, ref global feature) with a
  KL-style prior loss;
* ``PartEncoderVAE``/``PartEncodercVAE2`` — ctx variants (cVAE2's ctx keeps
  params un-exped on the mean only — reference :1560-1572);
* ``PartEncoderWithKLLoss`` — adds a KL(part posterior || N(0, prior_var))
  term instead of the flow prior;
* ``PartEncoderForPartnet`` — PartNet-layout forward (attn_map key).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import MLP, TorchBatchNorm
from ..utils.gaussian import (
    gaussian_entropy,
    gaussian_log_likelihood,
    reparameterize_gaussian,
)
from ..utils.registry import ENCODERS
from .part_encoder import PartEncoder, PartEncoderForTransformerDecoder


@ENCODERS.register_module()
class PartAlignerCIMLE(nn.Module):
    """MLP aligner with CIMLE noise encoder (part_encoders.py:167-254, norm='bn')."""

    width: int
    n_class: int
    param_dim: int = 3
    noise_dim: int = 32
    noise_encoder_type: int = 0
    cimle: bool = True
    cimle_start_epoch: int = 0
    dtype: Optional[jnp.dtype] = None

    def _branch(self, x, name, train):
        for i, f in enumerate((512, 256, 64)):
            x = nn.Dense(
                f,
                kernel_init=nn.initializers.normal(0.25),
                dtype=self.dtype,
                name=f"fc{i + 1}_{name}",
            )(x)
            x = TorchBatchNorm(dtype=self.dtype, name=f"fc_bn{i + 1}_{name}")(
                x, use_running_average=not train
            )
            x = nn.relu(x)
        return nn.Dense(
            self.param_dim * self.n_class,
            kernel_init=nn.initializers.normal(0.25),
            dtype=self.dtype,
            name=f"fc4_{name}",
        )(x)

    @nn.compact
    def __call__(self, part_code, valid_id=None, noise=None, deterministic: bool = True):
        B, K, C = part_code.shape
        if noise is None or noise.shape[-1] != self.noise_dim:
            noise = jnp.zeros((B, self.noise_dim), part_code.dtype)
        x = (part_code * valid_id[..., None]).reshape(B, -1)
        if self.noise_encoder_type == 0:
            ne = jnp.concatenate([x, noise], axis=-1)
            h = nn.Dense(512, dtype=self.dtype, name="ne_fc1")(ne)
            h = TorchBatchNorm(dtype=self.dtype, name="ne_bn1")(h, use_running_average=deterministic)
            h = nn.relu(h)
            h = nn.Dense(128, dtype=self.dtype, name="ne_fc2")(h)
            h = TorchBatchNorm(dtype=self.dtype, name="ne_bn2")(h, use_running_average=deterministic)
            h = nn.relu(h)
            noise = nn.Dense(self.noise_dim, dtype=self.dtype, name="ne_fc3")(h)
        xin = jnp.concatenate([x, noise], axis=-1)
        train = not deterministic
        m = self._branch(xin, "m", train).reshape(B, 3, self.n_class).transpose(0, 2, 1)
        v = self._branch(xin, "v", train).reshape(B, 3, self.n_class).transpose(0, 2, 1)
        return m, v


def _td_prepare_ctx(enc, part_code, mean, logvar, *, scale_var=True, std=False):
    """Shared transformer-decoder ctx assembly: [part_code | mean, var-feat],
    honoring the encoder's detach_params_in_ctx flag (part_encoder.py:437-446).
    ``scale_var`` applies the log_scale_var offset; ``std`` emits exp(0.5*lv)."""
    ctx = [part_code] if enc.include_part_code else []
    if enc.include_params:
        lv = logvar + enc.log_scale_var if scale_var else logvar
        var = jnp.exp(0.5 * lv) if std else jnp.exp(lv)
        params = jnp.concatenate([mean, var], axis=-1)
        if enc.detach_params_in_ctx:
            params = jax.lax.stop_gradient(params)
        ctx.append(params)
    return jnp.concatenate(ctx, axis=-1)


@ENCODERS.register_module()
class PartEncodercVAE(PartEncoderForTransformerDecoder):
    """Aligner noise from a conditional VAE posterior (part_encoders.py:1329-1420)."""

    cvae_kl_weight: float = 0.1

    def setup(self):
        super().setup()
        noise_dim = self.noise_dim
        self.cvae_encoder = MLP(
            [self.zdim, self.zdim, noise_dim * 2], dtype=self.dtype, name="cvae_encoder"
        )

    def get_params_from_part_code(
        self, part_code, valid_id, gt_mean=None, gt_var=None, ref=None, noise=None,
        train: bool = False,
    ):
        B = part_code.shape[0]
        if train and ref is not None:
            g = self.ref_encoder(ref, train=train).reshape(B, -1)
            cond = jnp.concatenate([part_code.reshape(B, -1), g], axis=-1)
            nm, nl = jnp.split(self.cvae_encoder(cond), 2, axis=-1)
            noise = reparameterize_gaussian(self.make_rng("sample"), nm, nl)
            entropy = gaussian_entropy(nl, axis=-1)
            log_p = gaussian_log_likelihood(noise, 0.0, 0.0, dim=self.noise_dim).sum(-1)
            self.sow("intermediates", "cvae_prior_loss", (-log_p - entropy).mean())
        mean, logvar = self.aligner(part_code, valid_id, noise=noise, deterministic=not train)
        return mean, logvar


@ENCODERS.register_module()
class PartEncoderVAE(PartEncoderForTransformerDecoder):
    """ctx keeps [part_code | mean | exp(logvar)] like cVAE2
    (part_encoders.py:1560-1572)."""

    def prepare_ctx(self, part_code, mean, logvar, seg_mask=None):
        return _td_prepare_ctx(self, part_code, mean, logvar)


@ENCODERS.register_module()
class PartEncodercVAE2(PartEncodercVAE):
    pass


@ENCODERS.register_module()
class PartEncoderWithKLLoss(PartEncoderForTransformerDecoder):
    """Gaussian-KL prior on part codes instead of the flow log-prob
    (part_encoders.py:1733-1760)."""

    def get_prior_loss(self, part_code, mean, logvar, valid_id, epoch=-1):
        # KL(N(mu, sigma^2) || N(0, prior_var)) per part, presence-masked
        pv = self.prior_var
        kl = 0.5 * (
            (jnp.exp(logvar) + mean**2) / pv - 1.0 - logvar + math.log(pv)
        ).sum(-1)
        loss = (kl * valid_id).sum(1) / valid_id.sum(1)
        kl_w = self._kl_weight(epoch)
        return {"prior_loss": kl_w * loss.mean(), "kl_weight": kl_w}


@ENCODERS.register_module()
class PartEncoderForPartnet(PartEncoder):
    """PartNet layout: seg flags under 'attn_map' (part_encoders.py:1258-1302)."""

    def __call__(self, batch, noise=None, epoch=-1, train: bool = False):
        batch = dict(batch)
        batch["ref_attn_map"] = batch.get("attn_map", batch.get("ref_attn_map"))
        return super().__call__(batch, noise=noise, epoch=epoch, train=train)


@ENCODERS.register_module()
class PartEncoderCIMLE(PartEncoder):
    """Deterministic-encoder CIMLE variant (part_encoders.py:1575-1700): noise
    flows through the aligner; fit scored by gaussian likelihood."""

    def __call__(self, batch, noise=None, epoch=-1, train: bool = False):
        return super().__call__(batch, noise=noise, epoch=epoch, train=train)


@ENCODERS.register_module()
class PartEncoderNoMixer(PartEncoder):
    """Alias of the plain PartEncoder (part_encoders.py:2127-2142): the
    reference variant drops the (never-assigned) decomposer/mixer and returns
    the part codes untouched — which is exactly what our base class does."""

    pass


@ENCODERS.register_module()
class PartEncoderForPartnetAndTransformerDecoder(PartEncoderForPartnet):
    """PartNet batch layout + transformer-decoder ctx tokens
    (part_encoders.py:1559-1572)."""

    def prepare_ctx(self, part_code, mean, logvar, seg_mask=None):
        return _td_prepare_ctx(self, part_code, mean, logvar)


@ENCODERS.register_module()
class PartEncoderForTransformerDecoderCIMLE(PartEncoderCIMLE):
    """CIMLE noise + transformer-decoder ctx (part_encoders.py:1654-1731).

    NOTE: the reference class dereferences ``self.mixer``, an attribute no
    __init__ in the file ever assigns (part_encoders.py:1668) — it crashes as
    shipped. Here the mixer step is the identity, which matches the only
    self-consistent reading (codes pass through, params from the aligner)."""

    def prepare_ctx(self, part_code, mean, logvar, seg_mask=None):
        return _td_prepare_ctx(self, part_code, mean, logvar)


@ENCODERS.register_module()
class PartEncoderForTransformerDecoderKLLoss(PartEncoderWithKLLoss):
    """KL prior + TD ctx with the include_std switch
    (part_encoders.py:1909-1928): ctx params are [mean, exp(logvar)] or
    [mean, std] — no log_scale_var offset in this variant."""

    include_std: bool = False

    def prepare_ctx(self, part_code, mean, logvar, seg_mask=None):
        return _td_prepare_ctx(
            self, part_code, mean, logvar, scale_var=False, std=self.include_std
        )


@ENCODERS.register_module()
class PartEncoderForTransformerDecoderKLLossCIMLE(PartEncoderForTransformerDecoderKLLoss):
    """KLLoss TD variant with CIMLE noise search (part_encoders.py:1932-2004);
    sample_noise/best-of-N selection comes from the base PartEncoder."""

    pass


@ENCODERS.register_module()
class EncoderWithKLLoss(PartEncoder):
    """Whole-shape VAE encoder: ONE global latent z (B, zdim) with a flow (or
    standard-normal) prior, broadcast to every part slot
    (part_encoders.py:2051-2125). ``encoder`` must be a whole-cloud VAE
    encoder producing (B, zdim) mean/logvar (e.g. PointNetVAEBase)."""

    def setup(self):
        from ..utils.registry import build_from_cfg
        from .flow import PerPartFlow

        # whole-cloud encoder: no per-part heads, so no num_anchors kwarg
        self.encoder_net = build_from_cfg(dict(self.encoder), ENCODERS, dtype=self.dtype)
        self.zdim = self.encoder["zdim"]
        self.aligner = (
            build_from_cfg(dict(self.part_aligner), ENCODERS, dtype=self.dtype)
            if self.part_aligner
            else None
        )
        if self.use_flow:
            # single global flow (reference: build_latent_flow, :2063)
            self.global_flow = PerPartFlow(
                n_class=1,
                depth=self.latent_flow_depth,
                dim=self.zdim,
                intermediate_dim=self.latent_flow_hidden_dim,
                dtype=self.dtype,
            )

    def sample_flow_prior(self, rng, sample_num):
        # reference samples z ~ N(0, 1) (part_encoders.py:2069) and the
        # training prior below is standard-normal too — prior_var is NOT
        # applied in this variant, matching the reference exactly
        z = jax.random.normal(rng, (sample_num, 1, self.zdim))
        if self.use_flow:
            z = self.global_flow(z, reverse=True)
        return jnp.broadcast_to(z, (sample_num, self.n_class, self.zdim))

    def __call__(self, batch, noise=None, epoch=-1, train: bool = False):
        ref = batch["ref"]
        B, N, _ = ref.shape
        valid_id = batch.get("present")
        if valid_id is None:
            valid_id = jnp.ones((B, self.n_class), ref.dtype)
        seg_mask = batch["ref_seg_mask"].astype(jnp.int32)

        mean_g, logvar_g = self.encoder_net(ref, train=train)  # (B, zdim) each
        z = reparameterize_gaussian(self.make_rng("sample"), mean_g, logvar_g)

        # prior loss on the global latent (:2101-2110)
        if self.use_flow:
            logpx0 = jnp.zeros((B, 1, 1), z.dtype)
            w, delta = self.global_flow(z[:, None], logpx0, reverse=False)
            log_pz = gaussian_log_likelihood(w[:, 0], 0.0, 0.0, dim=self.zdim).sum(-1) - delta[:, 0, 0]
        else:
            log_pz = gaussian_log_likelihood(z, 0.0, 0.0, dim=self.zdim).sum(-1)
        entropy = gaussian_entropy(logvar_g, axis=-1)
        kl_w = self._kl_weight(epoch)
        loss_dict = {"prior_loss": kl_w * (-log_pz - entropy).mean()}

        part_code = jnp.broadcast_to(
            z[:, None], (B, self.n_class, self.zdim)
        )
        mean, logvar = self.get_params_from_part_code(part_code, valid_id, noise=noise)
        mean_pp, logvar_pp, flag_pp = self.gather_all(
            seg_mask, anchors=mean, variances=logvar, valid_id=valid_id
        )
        if train and self.aligner is not None:
            fit = -gaussian_log_likelihood(ref, mean_pp, logvar_pp).mean(
                -1
            ) * flag_pp
            # Per-sample ratio, then (via parse_losses) the batch mean —
            # reference reduces sum(-1,-2)/flag.sum(-1,-2) PER SAMPLE
            # (part_encoders.py:2120-2121), which differs from a global
            # ratio whenever part-presence counts vary across the batch.
            loss_dict["fit_loss"] = (
                self.fit_loss_weight
                * fit.sum(-1)
                / jnp.maximum(flag_pp.sum(-1), 1.0)
            )
        ctx = self.prepare_ctx(part_code, mean, logvar, seg_mask=seg_mask)
        return ctx, mean_pp, logvar_pp, flag_pp, loss_dict, [part_code, mean, logvar, noise]
