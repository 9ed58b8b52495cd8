"""Part encoder: per-part latents, part aligner, fit/prior losses, sampling.

Re-implements the reference part stylizer + glue (reference:
python/difffacto/models/encoders/part_encoders.py:313-1326). Channel-last
everywhere: part codes (B, K, zdim), per-part params (B, K, 3), per-point
tensors (B, N, 3). The reference's per-part python loops (flow loop
part_encoders.py:1055-1060, prior loop :1148-1159) are vmapped/masked.

The shipped configs use ``PartEncoderForTransformerDecoder`` whose ctx is the
raw part tokens (part_encoders.py:1308-1326); the base class's per-point ctx
(:462-487) is kept for the pointwise denoisers.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.gaussian import (
    gaussian_entropy,
    gaussian_log_likelihood,
    reparameterize_gaussian,
)
from ..parallel.axes import fold_points, psum_points
from ..utils.registry import ENCODERS, build_from_cfg
from .flow import PerPartFlow


def gather_per_point(values: jnp.ndarray, seg_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, K, C), (B, N) int -> (B, N, C): per-point broadcast of per-part values.

    Replaces the CUDA gather_operation calls (part_encoders.py:417-428).
    """
    idx = seg_mask[..., None].astype(jnp.int32)
    return jnp.take_along_axis(values, jnp.broadcast_to(idx, seg_mask.shape + (values.shape[-1],)), axis=1)


@ENCODERS.register_module()
class PartEncoder(nn.Module):
    """Constructor args mirror the reference (part_encoders.py:314-347)."""

    encoder: Optional[dict] = None
    n_class: int = 4
    part_aligner: Optional[dict] = None
    fit_loss_weight: float = 1.0
    include_z: bool = True
    include_part_code: bool = False
    include_params: bool = False
    use_gt_params: bool = False
    encode_ref: bool = False
    scale_var: float = 1.0
    fit_loss_type: int = 0
    origin_scale: bool = False
    kl_weight: float = 0.001
    use_flow: bool = False
    latent_flow_depth: int = 14
    latent_flow_hidden_dim: int = 256
    use_gt_params_in_training: bool = False
    gen: bool = False
    kl_weight_annealing: bool = False
    min_kl_weight: float = 1e-7
    include_class_label: bool = False
    kl_weight_annealing_end_epoch: int = 3000
    normalize_part_code: bool = False
    detach_params_in_ctx: bool = False
    prior_var: float = 1.0
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        enc = build_from_cfg(
            dict(self.encoder), ENCODERS, num_anchors=self.n_class, dtype=self.dtype
        )
        self.encoder_net = enc
        self.zdim = self.encoder["zdim"]
        self.aligner = (
            build_from_cfg(dict(self.part_aligner), ENCODERS, dtype=self.dtype)
            if self.part_aligner
            else None
        )
        if self.encode_ref:
            from .pointnet import PointNet

            self.ref_encoder = PointNet(
                zdim=self.zdim, point_dim=3, num_anchors=1, dtype=self.dtype
            )
        if self.gen and self.use_flow:
            self.flow = PerPartFlow(
                n_class=self.n_class,
                depth=self.latent_flow_depth,
                dim=self.zdim,
                intermediate_dim=self.latent_flow_hidden_dim,
                dtype=self.dtype,
            )

    @property
    def log_scale_var(self):
        return math.log(self.scale_var)

    @property
    def noise_dim(self):
        return self.aligner.noise_dim if self.aligner is not None else 32

    @property
    def cimle(self):
        return self.aligner is not None and self.aligner.cimle

    # ------------------------------------------------------------ components
    def get_part_code(self, points, seg_flag, train: bool = False):
        """(B, N, 3), (B, N, K) -> means, logvars each (B, K, zdim)."""
        return self.encoder_net(points, seg_flag, train=train)

    def get_params_from_part_code(
        self, part_code, valid_id, gt_mean=None, gt_var=None, ref=None, noise=None,
        train: bool = False,
    ):
        """(B, K, zdim) -> mean, logvar each (B, K, 3) (part_encoders.py:447-459)."""
        if self.aligner is not None:
            if self.encode_ref:
                g = self.ref_encoder(ref, train=train)  # (B, 1, zdim)
                g = jnp.broadcast_to(g, (g.shape[0], self.n_class, g.shape[-1]))
                mean, logvar = self.aligner(g, valid_id, noise=noise, deterministic=not train)
            else:
                mean, logvar = self.aligner(
                    part_code, valid_id, noise=noise, deterministic=not train
                )
        else:
            mean = logvar = None
        if self.use_gt_params:
            mean = gt_mean
            logvar = jnp.log(gt_var)
        return mean, logvar

    def gather_all(self, seg_mask, anchors=None, variances=None, valid_id=None):
        B, N = seg_mask.shape
        zeros = jnp.zeros((B, N, 3), jnp.float32)
        anchor_pp = gather_per_point(anchors, seg_mask) if anchors is not None else zeros
        var_pp = gather_per_point(variances, seg_mask) if variances is not None else zeros
        flag_pp = (
            gather_per_point(valid_id[..., None], seg_mask)[..., 0]
            if valid_id is not None
            else jnp.ones((B, N), jnp.float32)
        )
        return anchor_pp, var_pp, flag_pp

    def prepare_ctx(self, part_code, mean, logvar, seg_mask=None):
        """Per-point context for pointwise denoisers (part_encoders.py:462-487)."""
        B = part_code.shape[0]
        N = seg_mask.shape[1]
        ctx = []
        if self.include_z:
            flat = part_code.reshape(B, -1)
            ctx.append(jnp.broadcast_to(flat[:, None], (B, N, flat.shape[-1])))
        if self.include_part_code:
            ctx.append(gather_per_point(part_code, seg_mask))
        if self.include_class_label:
            ctx.append(jax.nn.one_hot(seg_mask, self.n_class, dtype=part_code.dtype))
        if self.include_params:
            if mean is not None:
                m = gather_per_point(mean, seg_mask)
                if self.detach_params_in_ctx:
                    m = jax.lax.stop_gradient(m)
                ctx.append(m)
            if logvar is not None:
                lv = gather_per_point(logvar, seg_mask)
                if self.detach_params_in_ctx:
                    lv = jax.lax.stop_gradient(lv)
                ctx.append(jnp.exp(lv + self.log_scale_var))
        return jnp.concatenate(ctx, axis=-1)

    # ----------------------------------------------------------------- losses
    def get_fit_loss(
        self, ref, mean, logvar, valid_id, mean_pp, logvar_pp, flag_pp, gt_shift, gt_var, seg_mask
    ):
        """Five fit-loss variants (part_encoders.py:489-522). Shapes: ref
        (B, N, 3); mean/logvar/gt (B, K, 3); *_pp (B, N, 3); flag_pp (B, N)."""
        if self.aligner is None:
            return jnp.zeros((1,), ref.dtype)
        t = self.fit_loss_type
        if t == 0:
            ll = -gaussian_log_likelihood(ref, mean_pp, logvar_pp).mean(-1)
            return psum_points((ll * flag_pp).sum(-1)) / psum_points(flag_pp.sum(-1))
        if t == 1:
            err = (
                jnp.concatenate([mean, jnp.exp(logvar)], axis=-1)
                - jnp.concatenate([gt_shift, gt_var], axis=-1)
            ) ** 2
            err = err * valid_id[..., None]
            return err.sum(axis=(-1, -2)) / valid_id.sum(-1)
        if t == 2:
            gt_logvar = jnp.log(gt_var)
            samples = reparameterize_gaussian(self.make_rng("sample"), mean, logvar)
            p_z = -gaussian_log_likelihood(samples, gt_shift, gt_logvar, dim=3).mean(-1)
            ent = -gaussian_entropy(logvar, axis=-1)
            fit = (p_z + ent) * valid_id
            return fit.sum(-1) / valid_id.sum(-1)
        if t == 3:
            gt_mean_pp = gather_per_point(gt_shift, seg_mask)
            gt_var_pp = gather_per_point(gt_var, seg_mask)
            samples = (
                jax.random.normal(fold_points(self.make_rng("sample")), gt_var_pp.shape, ref.dtype)
                * jnp.sqrt(gt_var_pp)
                + gt_mean_pp
            )
            ll = -gaussian_log_likelihood(samples, mean_pp, logvar_pp).mean(-1)
            return psum_points((ll * flag_pp).sum(-1)) / psum_points(flag_pp.sum(-1))
        if t == 4:
            err = (
                jnp.concatenate([mean, logvar], axis=-1)
                - jnp.concatenate([gt_shift, jnp.log(gt_var)], axis=-1)
            ) ** 2
            err = err * valid_id[..., None]
            return err.sum(axis=(-1, -2)) / valid_id.sum(-1)
        raise NotImplementedError(t)

    def _kl_weight(self, epoch):
        if self.kl_weight_annealing:
            w = self.min_kl_weight + (self.kl_weight - self.min_kl_weight) * epoch / float(
                self.kl_weight_annealing_end_epoch
            )
            return jnp.where(epoch < self.kl_weight_annealing_end_epoch, w, self.kl_weight)
        return jnp.asarray(self.kl_weight)

    def get_prior_loss(self, part_code, mean, logvar, valid_id, epoch=-1):
        """Flow prior loss, vmapped over parts and masked by ``valid_id``
        (part_encoders.py:1143-1183). part_code (B, K, zdim); mean/logvar are
        the part-code posterior stats (B, K, zdim)."""
        B, K, D = part_code.shape
        entropy = gaussian_entropy(logvar, axis=-1)  # (B, K)
        if self.use_flow:
            logpx0 = jnp.zeros((B, K, 1), part_code.dtype)
            w, delta_log_pw = self.flow(part_code, logpx0, reverse=False)
            log_pw = gaussian_log_likelihood(
                w, 0.0, math.log(self.prior_var), dim=D
            ).sum(-1)
            log_p_part = log_pw - delta_log_pw[..., 0]  # (B, K)
        else:
            log_p_part = gaussian_log_likelihood(
                part_code, 0.0, math.log(self.prior_var), dim=D
            ).sum(-1)
        loss_prior = ((-log_p_part - entropy) * valid_id).sum(1) / valid_id.sum(1)
        kl_w = self._kl_weight(epoch)
        out = {
            "prior_loss": kl_w * loss_prior.mean(),
            "kl_weight": kl_w,
        }
        denom = jnp.maximum(valid_id.sum(0), 1.0)
        mlog_p = (log_p_part * valid_id).sum(0) / denom
        ment = (entropy * valid_id).sum(0) / denom
        for i in range(K):
            out[f"log_p_part_{i}"] = mlog_p[i]
            out[f"entropy_{i}"] = ment[i]
        return out

    # ---------------------------------------------------------------- forward
    def __call__(self, batch: Dict[str, jnp.ndarray], noise=None, epoch=-1, train: bool = False):
        """Training/reconstruction forward (part_encoders.py:1185-1254).

        batch keys (channel-last): input (B,N,3), present (B,K), ref (B,N,3),
        ref_seg_mask (B,N), ref_attn_map (B,N,K), part_shift (B,K,3),
        part_scale (B,K,3), noise (B,noise_dim).
        Returns (ctx, mean_pp, logvar_pp+log_scale_var, flag_pp, loss_dict,
        latents=[part_code, mean, logvar, noise]).
        """
        x = batch["input"]
        valid_id = batch["present"]
        ref = batch["ref"]
        seg_mask = batch["ref_seg_mask"].astype(jnp.int32)
        seg_flag = batch["ref_attn_map"]
        B, N, _ = ref.shape
        gt_shift = batch.get("part_shift", jnp.zeros((B, self.n_class, 3), ref.dtype))
        gt_var = batch.get("part_scale", jnp.ones((B, self.n_class, 3), ref.dtype))
        if noise is None:
            noise = batch.get("noise")
        if not self.origin_scale:
            gt_var = gt_var**2

        loss_dict = {}
        pc_means, pc_logvars = self.get_part_code(x, seg_flag, train=train)
        if self.gen:
            part_code = reparameterize_gaussian(self.make_rng("sample"), pc_means, pc_logvars)
            loss_dict.update(
                self.get_prior_loss(part_code, pc_means, pc_logvars, valid_id, epoch=epoch)
            )
        else:
            part_code = pc_means
        if self.normalize_part_code:
            part_code = part_code / jnp.linalg.norm(part_code, axis=-1, keepdims=True)

        num_sample = 1
        if noise is not None and noise.ndim == 3:
            # (B, S, noise_dim): multiple CIMLE hypotheses per shape.
            num_sample = noise.shape[1]
            noise = noise.reshape(B * num_sample, -1)
            rep = lambda a: jnp.repeat(a, num_sample, axis=0)
            part_code, valid_id, seg_mask, ref, gt_shift, gt_var = map(
                rep, (part_code, valid_id, seg_mask, ref, gt_shift, gt_var)
            )

        mean, logvar = self.get_params_from_part_code(
            part_code, valid_id, gt_mean=gt_shift, gt_var=gt_var, ref=ref, noise=noise,
            train=train,
        )
        mean_pp, logvar_pp, flag_pp = self.gather_all(
            seg_mask, anchors=mean, variances=logvar, valid_id=valid_id
        )
        fit_loss = self.get_fit_loss(
            ref, mean, logvar, valid_id, mean_pp, logvar_pp, flag_pp, gt_shift, gt_var, seg_mask
        )
        loss_dict["fit_loss"] = self.fit_loss_weight * fit_loss

        if self.use_gt_params_in_training:
            mean_pp, logvar_pp, _ = self.gather_all(
                seg_mask, anchors=gt_shift, variances=jnp.log(gt_var), valid_id=None
            )
            mean, logvar = gt_shift, jnp.log(gt_var)

        ctx = self.prepare_ctx(part_code, mean, logvar, seg_mask=seg_mask)
        return (
            ctx,
            mean_pp,
            logvar_pp + self.log_scale_var,
            flag_pp,
            loss_dict,
            [part_code, mean, logvar, noise],
        )

    # --------------------------------------------------------------- sampling
    def sample_flow_prior(self, rng, sample_num):
        """Draw part codes from the flow prior (part_encoders.py:1053-1060)."""
        part_code = jax.random.normal(
            rng, (sample_num, self.n_class, self.zdim)
        ) * math.sqrt(self.prior_var)
        if self.use_flow:
            part_code = self.flow(part_code, reverse=True)
        return part_code

    def sample_latents(
        self,
        sample_num: int,
        sample_points: int,
        fixed_id=None,
        valid_id=None,
        epoch=0,
        K: Optional[int] = None,
        part_code=None,
    ):
        """Generation-path latent sampling (part_encoders.py:1052-1110).

        Returns (ctx, mean_pp, logvar_pp, seg_mask, valid_id, latents) with
        leading dim sample_num*K (K CIMLE hypotheses per shape).
        """
        if part_code is None:
            part_code = self.sample_flow_prior(self.make_rng("sample"), sample_num)
        if self.aligner is not None and self.aligner.cimle:
            K = 10 if K is None else K
            noise = jax.random.normal(
                self.make_rng("sample"), (sample_num * K, self.noise_dim)
            )
            noise = jnp.where(epoch >= self.aligner.cimle_start_epoch, noise, 0.0)
        else:
            K = 1
            noise = None
        if valid_id is None:
            valid_id = jnp.ones((sample_num, self.n_class), part_code.dtype)
        if fixed_id is not None:
            fixed_id = jnp.asarray(fixed_id, part_code.dtype)  # (K_cls,)
            fixed_codes = part_code[0:1]
            fixed_valid = jnp.clip(valid_id[0:1] + fixed_id[None], 0, 1)
            part_code = part_code * (1 - fixed_id)[None, :, None] + fixed_id[None, :, None] * fixed_codes
            valid_id = valid_id * (1 - fixed_id)[None] + fixed_id[None] * fixed_valid
            if noise is not None:
                noise_r = noise.reshape(sample_num, K, self.noise_dim)
                noise = jnp.where(
                    jnp.any(fixed_id == 1),
                    jnp.broadcast_to(noise_r[0:1], noise_r.shape),
                    noise_r,
                ).reshape(sample_num * K, self.noise_dim)

        part_code = jnp.repeat(part_code, K, axis=0)
        valid_id = jnp.repeat(valid_id, K, axis=0)
        mean, logvar = self.get_params_from_part_code(part_code, valid_id, noise=noise)

        # Equal split of points across present parts; absent slots remapped to
        # the first present part (part_encoders.py:1105-1106).
        ids = jnp.arange(self.n_class, dtype=part_code.dtype)[None] * valid_id + jnp.argmax(
            valid_id, axis=1
        )[:, None].astype(part_code.dtype) * (1 - valid_id)
        seg_mask = jnp.repeat(
            ids.astype(jnp.int32), sample_points // self.n_class, axis=1
        )
        lv = logvar + self.log_scale_var if logvar is not None else logvar
        mean_pp, logvar_pp, _ = self.gather_all(seg_mask, anchors=mean, variances=lv)
        ctx = self.prepare_ctx(part_code, mean, lv, seg_mask=seg_mask)
        return ctx, mean_pp, logvar_pp, seg_mask, valid_id, [part_code, mean, logvar, noise]

    def sample_noise_candidates(self, batch, num: int, train: bool = False):
        """CIMLE: propose ``num`` aligner noises per shape, score by fit loss
        (part_encoders.py:389-415). Returns (noise (B, num, D), fit (B, num))."""
        x = batch["input"]
        valid_id = batch["present"]
        ref = batch["ref"]
        seg_mask = batch["ref_seg_mask"].astype(jnp.int32)
        seg_flag = batch["attn_map"]
        B = x.shape[0]
        gt_shift = batch.get("part_shift", jnp.zeros((B, self.n_class, 3), ref.dtype))
        gt_var = batch.get("part_scale", jnp.ones((B, self.n_class, 3), ref.dtype))
        if not self.origin_scale:
            gt_var = gt_var**2
        pc_means, pc_logvars = self.get_part_code(x, seg_flag, train=train)
        if self.gen:
            part_code = reparameterize_gaussian(self.make_rng("sample"), pc_means, pc_logvars)
        else:
            part_code = pc_means
        noise = jax.random.normal(self.make_rng("sample"), (B * num, self.noise_dim))
        rep = lambda a: jnp.repeat(a, num, axis=0)
        part_code_r, valid_r, seg_r, ref_r, gts_r, gtv_r = map(
            rep, (part_code, valid_id, seg_mask, ref, gt_shift, gt_var)
        )
        mean, logvar = self.get_params_from_part_code(part_code_r, valid_r, noise=noise)
        mean_pp, logvar_pp, flag_pp = self.gather_all(
            seg_r, anchors=mean, variances=logvar, valid_id=valid_r
        )
        fit = self.get_fit_loss(
            ref_r, mean, logvar, valid_r, mean_pp, logvar_pp, flag_pp, gts_r, gtv_r, seg_r
        )
        return noise.reshape(B, num, -1), fit.reshape(B, num)


@ENCODERS.register_module()
class PartEncoderForTransformerDecoder(PartEncoder):
    """Ctx = the K part tokens themselves (part_encoders.py:1308-1326):
    concat(part_code, [mean, exp(logvar + log_scale_var)]) -> (B, K, zdim+6)."""

    def prepare_ctx(self, part_code, mean, logvar, seg_mask=None):
        ctx = []
        if self.include_part_code:
            ctx.append(part_code)
        if self.include_params:
            params = jnp.concatenate([mean, jnp.exp(logvar + self.log_scale_var)], axis=-1)
            if self.detach_params_in_ctx:
                params = jax.lax.stop_gradient(params)
            ctx.append(params)
        return jnp.concatenate(ctx, axis=-1)
