"""Secondary orchestrators: vanilla PDM and unconditional anchored generation.

* ``PDM`` re-implements the reference's vanilla point-diffusion model
  (reference: python/difffacto/models/networks/point_diff.py:12-476): a
  whole-shape (optionally seg-aware) encoder produces a latent; a vanilla
  DPM with a pointwise/transformer denoiser reconstructs/generates clouds.
* ``AnchoredGeneration`` re-implements the unconditional anchored generator
  (networks/anchor_gen_uncond.py:12-269): a decomposer produces anchors and
  part latents from a sampled global code; the anchored diffusion decodes.

Both reuse the AnchoredDiffusion math object and the module-level ``decode``
scan pipeline.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.registry import (
    DECOMPOSERS,
    DIFFUSIONS,
    ENCODERS,
    METRICS,
    MODELS,
    NETS,
    SAMPLERS,
    build_from_cfg,
)
from .anchor_diff import build_diffusion
from .samplers import Uniform


@MODELS.register_module()
class PDM(nn.Module):
    """Vanilla point DPM (point_diff.py:12-476)."""

    encoder: dict
    diffusion: dict
    sampler: dict
    num_timesteps: int
    npoints: int = 2048
    include_attn_weight_in_encoder: bool = True
    ret_traj: bool = False
    ret_interval: int = 20
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.encoder_mod = build_from_cfg(dict(self.encoder), ENCODERS, dtype=self.dtype)
        self.net = build_from_cfg(dict(self.diffusion["net"]), NETS, dtype=self.dtype)
        self.diff = build_diffusion(self.diffusion, self.num_timesteps)
        self.t_sampler = build_from_cfg(
            dict(self.sampler), SAMPLERS, num_timesteps=self.num_timesteps
        )

    def encode(self, batch, train: bool = False):
        """Whole-shape code, flattened to ONE global vector the way the
        reference does (point_diff.py:455 ``encoder(x).reshape(B, -1)`` —
        per-anchor structure is deliberately collapsed)."""
        x = batch["input"]
        if self.include_attn_weight_in_encoder:
            x = jnp.concatenate([x, batch["attn_map"]], axis=-1)
        code = self.encoder_mod(x, train=train)
        if isinstance(code, tuple):
            code = code[0]
        return code.reshape(code.shape[0], -1)

    def denoise(self, x, t, ctx, anchors, variances, seg_mask, valid_id, train: bool = False):
        return self.net(
            x, t, ctx, anchors, variances, seg_mask, valid_id, deterministic=not train
        )

    def loss(self, batch, epoch=0) -> Dict[str, jnp.ndarray]:
        """Train forward (point_diff.py:432-462): vanilla DPM on the cloud,
        zero anchors, the global code as the single ctx token. The
        reference's own call crashes for every diffusion class (kwarg
        mismatch — same defect family as AnchoredGeneration, pinned in
        tests/test_reference_parity_supseg.py); this is the evident intent."""
        ref = batch["ref"]
        B = ref.shape[0]
        code = self.encode(batch, train=True)
        t, _ = self.t_sampler.sample(self.make_rng("sample"), B)

        def model_fn(inp, ts, c, anc, var, seg, vid):
            return self.denoise(inp, ts, c, anc, var, seg, vid, train=True)

        losses = self.diff.training_losses(
            model_fn,
            self.make_rng("sample"),
            ref,
            t,
            anchors=jnp.zeros_like(ref),
            ctx=code[:, None, :],
            seg_mask=batch["ref_seg_mask"].astype(jnp.int32),
        )
        return losses

    def prepare_decode(self, batch, train: bool = False):
        code = self.encode(batch, train=train)
        B = code.shape[0]
        anchors = jnp.zeros((B, self.npoints, 3), jnp.float32)
        seg_mask = batch["ref_seg_mask"].astype(jnp.int32)
        return code, anchors, seg_mask

    def predict(self, batch) -> Dict[str, jnp.ndarray]:
        """Eval forward (point_diff.py:464-476): reverse decode from zero
        anchors conditioned on the encoded cloud."""
        code, anchors, seg_mask = self.prepare_decode(batch, train=False)

        def model_fn(inp, ts, c, anc, var, seg, vid):
            return self.denoise(inp, ts, code[:, None, :], anc, var, seg, vid)

        out = self.diff.p_sample_loop(
            model_fn, self.make_rng("sample"), anchors,
            ret_traj=self.ret_traj, ret_interval=self.ret_interval,
        )
        out["input"] = batch["input"]
        out["input_ref"] = batch["ref"]
        out["seg_mask"] = seg_mask
        out["seg_mask_ref"] = seg_mask
        return out


@MODELS.register_module()
class AnchoredGeneration(nn.Module):
    """Unconditional anchored generation (anchor_gen_uncond.py:12-269),
    VAE-style: encoder + MeanVarianceRegressor give a per-part posterior,
    z is reparameterized with a prior loss, the decomposer yields
    (global code, anchors, part latents), optional classifier-free-guidance
    dropout masks the latents, and the anchored diffusion trains with the
    global code as the single ctx token and the per-point part latent
    concatenated onto the denoiser input (anchor_gen_uncond.py:208-239).

    Reference defect (anchor_gen_uncond.py:213-214): ``gaussian_entropy`` is
    called without ``dim``, summing logvar over the ANCHOR axis, and
    ``-log_pz - entropy`` then broadcasts (B, K) against (B, C) — a crash
    for any latent_dim != num_anchors. We implement the evident intent
    (entropy over the latent axis). Pinned in
    tests/test_reference_parity_supseg.py.
    """

    encoder: dict
    decomposer: dict
    parameter_regressor: dict
    diffusion: dict
    sampler: dict
    num_anchors: int
    num_timesteps: int
    npoints: int = 2048
    anchor_loss_weight: float = 1.0
    # NOTE: the config field name mirrors the reference kwarg and SHADOWS
    # the loss() method on instances — always invoke via
    # method=<Class>.loss (never method='loss' or instance.loss()).
    loss: Optional[dict] = None  # METRICS cfg for the anchor loss
    include_attn_weight_in_encoder: bool = True
    guidance: bool = False
    part_latent_dropout_prob: float = 0.2
    global_latent_dropout_prob: float = 0.2
    kl_weight: float = 1e-3
    ret_traj: bool = False
    ret_interval: int = 20
    forward_sample: bool = False
    fix_part: bool = False
    save_pred_xstart: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.encoder_mod = build_from_cfg(
            dict(self.encoder), ENCODERS, num_anchors=self.num_anchors,
            dtype=self.dtype,
        )
        self.param_regressor_mod = build_from_cfg(
            dict(self.parameter_regressor), ENCODERS, num_class=self.num_anchors,
            dtype=self.dtype,
        )
        self.decomposer_mod = build_from_cfg(
            dict(self.decomposer), DECOMPOSERS, num_anchors=self.num_anchors,
            point_dim=3, dtype=self.dtype,
        )
        dcfg = dict(self.diffusion)
        dcfg["learn_variance"] = False  # forced in the reference constructor
        self.net = build_from_cfg(dict(dcfg.pop("net")), NETS, dtype=self.dtype)
        self.diff = build_diffusion(dcfg, self.num_timesteps)
        self.t_sampler = build_from_cfg(
            dict(self.sampler), SAMPLERS, num_timesteps=self.num_timesteps
        )
        lcfg = self.loss if isinstance(self.loss, dict) else None
        self.anchor_loss_func = build_from_cfg(dict(lcfg), METRICS) if lcfg else None

    @property
    def points_per_anchor(self):
        return self.npoints // self.num_anchors

    def _model_fn(self, pointwise_latent, code, train: bool = False):
        """Per-point latent concatenated onto x_t; global code as one ctx
        token (the reference threads them through AnchoredDiffusion's
        code/pointwise_latent kwargs)."""
        ctx_tok = code[:, None, :]

        def fn(inp, ts, c, anc, var, seg, vid):
            h = jnp.concatenate([inp, pointwise_latent.astype(inp.dtype)], axis=-1)
            return self.net(h, ts, ctx_tok, anc, var, seg, vid, deterministic=not train)

        return fn

    def encode_posterior(self, batch, train: bool = False):
        """Encoder + regressor -> per-part (means, logvars) (B, K, C)."""
        x = batch["input"]
        if self.include_attn_weight_in_encoder:
            x = jnp.concatenate([x, batch["attn_map"]], axis=-1)
        part_latent = self.encoder_mod(x, train=train)
        return self.param_regressor_mod(part_latent, train=train)

    def decompose(self, z, train: bool = False):
        """(B, K, C) -> (global code, anchors (B, K, 3), mixed latents)."""
        return self.decomposer_mod(z, train=train)

    def loss(self, batch, epoch=0) -> Dict[str, jnp.ndarray]:
        from ..utils.gaussian import (
            gaussian_entropy,
            reparameterize_gaussian,
            standard_normal_logprob,
        )
        from .part_encoder import gather_per_point

        ref = batch["ref"]
        seg_mask = batch["seg_mask"].astype(jnp.int32)
        B = ref.shape[0]

        means, logvars = self.encode_posterior(batch, train=True)
        z = reparameterize_gaussian(self.make_rng("sample"), means, logvars)
        log_pz = standard_normal_logprob(z).sum(-1)      # (B, K)
        entropy = gaussian_entropy(logvars, axis=-1)     # (B, K) — see class doc
        prior_loss = self.kl_weight * (-log_pz - entropy).mean()

        global_feature, anchors, part_latent = self.decompose(z, train=True)
        if self.guidance:
            keep = (
                jax.random.uniform(self.make_rng("sample"), part_latent.shape[:-1])
                >= self.part_latent_dropout_prob
            )
            part_latent = part_latent * keep[..., None]
            gkeep = (
                jax.random.uniform(self.make_rng("sample"), (B,))
                >= self.global_latent_dropout_prob
            )
            global_feature = global_feature * gkeep[:, None]

        t, _ = self.t_sampler.sample(self.make_rng("sample"), B)
        latent_pp = gather_per_point(part_latent, seg_mask)
        anchor_pp = gather_per_point(anchors, seg_mask)
        base_anchor = (
            self.anchor_loss_func(anchor_pp, ref)
            if self.anchor_loss_func is not None
            else ((anchor_pp - ref) ** 2).sum(-1).mean()
        )
        anchor_loss = self.anchor_loss_weight * base_anchor

        model_fn = self._model_fn(latent_pp, global_feature, train=True)
        diff_losses = self.diff.training_losses(
            model_fn, self.make_rng("sample"), ref, t, anchors=anchor_pp,
        )
        out = {k: v for k, v in diff_losses.items()}
        out["prior_loss"] = prior_loss
        out["anchor_loss"] = anchor_loss
        return out

    def sample_latents(self, sample_num: int, fix_part: bool = False,
                       anchor_id: int = 0):
        """z ~ N(0,1) -> (global code, per-point anchors/latents, seg mask)
        (anchor_gen_uncond.py:241-259, incl. the fix_part variant that
        shares one z across the batch except one anchor slot)."""
        C = int(self.encoder["part_latent_dim"])
        if fix_part or self.fix_part:
            base = jax.random.normal(
                self.make_rng("sample"), (1, self.num_anchors, C)
            )
            z = jnp.repeat(base, sample_num, axis=0)
            z = z.at[:, anchor_id].set(
                jax.random.normal(self.make_rng("sample"), (sample_num, C))
            )
        else:
            z = jax.random.normal(
                self.make_rng("sample"), (sample_num, self.num_anchors, C)
            )
        global_feature, anchors, part_latent = self.decompose(z, train=False)
        pp = self.points_per_anchor
        anchor_pp = jnp.repeat(anchors, pp, axis=1)      # (B, npoints, 3)
        latent_pp = jnp.repeat(part_latent, pp, axis=1)  # (B, npoints, C)
        seg_mask = jnp.broadcast_to(
            jnp.repeat(jnp.arange(self.num_anchors, dtype=jnp.int32), pp)[None],
            (sample_num, self.npoints),
        )
        return global_feature, anchors, anchor_pp, latent_pp, seg_mask

    def predict(self, batch) -> Dict[str, jnp.ndarray]:
        """Eval forward (anchor_gen_uncond.py:241-269): decode sampled
        latents (or forward-chain visualization)."""
        B = batch["ref"].shape[0]
        global_feature, anchors, anchor_pp, latent_pp, seg_mask = (
            self.sample_latents(B)
        )
        if self.forward_sample:
            traj = self.diff.q_sample_loop(
                self.make_rng("sample"), batch["ref"], anchor_pp
            )
            out = {"pred": batch["ref"], "traj": traj}
        else:
            model_fn = self._model_fn(latent_pp, global_feature, train=False)
            out = self.diff.p_sample_loop(
                model_fn, self.make_rng("sample"), anchor_pp,
                ret_traj=self.ret_traj, ret_interval=self.ret_interval,
            )
        out["anchors"] = anchors
        out["assigned_anchor"] = anchor_pp
        out["seg_mask"] = seg_mask
        out["input"] = batch["input"]
        out["input_ref"] = batch["ref"]
        return out


@MODELS.register_module()
class AnchorDiffGenPartglot(nn.Module):
    """Decomposer-based generator over PartGlot super-segments (reference:
    networks/anchor_gen_supseg_partglot.py:8-211): a super-segment encoder
    produces part latents, the decomposer regresses per-anchor coordinates +
    a global code, and an anchored diffusion (fixed variance) models each
    super-segment's points around its anchor, masked by the segment-validity
    ``geo_mask``. Conditioning is the global code (one ctx token) plus the
    per-point part latent concatenated onto the denoiser input.

    Eval paths: reverse decode / forward-chain visualization, latent
    interpolation along one anchor between two shapes, and per-part combine.
    (The reference's interpolate/combine eval branches dereference an
    undefined ``x`` — anchor_gen_supseg_partglot.py:191-196 — so they crash
    as shipped; here they take the batch dict.)
    """

    encoder: dict
    decomposer: dict
    diffusion: dict
    sampler: dict
    num_anchors: int
    num_timesteps: int
    npoints: int = 2048
    anchor_loss_weight: float = 1.0
    ret_traj: bool = False
    ret_interval: int = 20
    forward_sample: bool = False
    save_pred_xstart: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.encoder_mod = build_from_cfg(
            dict(self.encoder), ENCODERS, num_anchors=self.num_anchors, dtype=self.dtype
        )
        self.decomposer_mod = build_from_cfg(
            dict(self.decomposer), DECOMPOSERS, num_anchors=self.num_anchors,
            point_dim=3, dtype=self.dtype,
        )
        dcfg = dict(self.diffusion)
        dcfg["learn_variance"] = False  # forced in the reference constructor
        self.net = build_from_cfg(dict(dcfg.pop("net")), NETS, dtype=self.dtype)
        self.diff = build_diffusion(dcfg, self.num_timesteps)
        self.t_sampler = build_from_cfg(
            dict(self.sampler), SAMPLERS, num_timesteps=self.num_timesteps
        )

    @property
    def points_per_anchor(self):
        return self.npoints // self.num_anchors

    def _model_fn(self, pointwise_latent, code, train: bool = False):
        """Denoiser closure: per-point latent is concatenated onto x_t and
        the global code rides as the single context token."""
        ctx_tok = code[:, None, :]

        def fn(inp, ts, c, anc, var, seg, vid):
            h = jnp.concatenate([inp, pointwise_latent.astype(inp.dtype)], axis=-1)
            return self.net(h, ts, ctx_tok, anc, var, seg, vid, deterministic=not train)

        return fn

    def encode_decompose(self, x, geo_mask, train: bool = False):
        part_latent = self.encoder_mod(x, geo_mask, train=train)
        global_feature, anchors, part_latent = self.decomposer_mod(
            part_latent, train=train
        )
        return global_feature, anchors, part_latent

    def loss(self, batch, epoch=0) -> Dict[str, jnp.ndarray]:
        x = batch["input"]          # (B, n_seg, npoint, 3)
        ref = batch["ref"]          # (B, n_seg, npoint, 3)
        seg_mask = batch["seg_mask"].astype(jnp.int32)  # (B, n_seg) anchor id
        geo_mask = batch["geo_mask"].astype(jnp.float32)  # (B, n_seg) valid
        B, n_seg, npoint = ref.shape[:3]
        num_active = jnp.maximum(geo_mask.sum(1), 1.0)

        global_feature, anchors, part_latent = self.encode_decompose(
            x, geo_mask, train=True
        )

        # per-segment anchor / latent by assignment
        anchor_seg = jnp.take_along_axis(anchors, seg_mask[..., None], axis=1)
        latent_seg = jnp.take_along_axis(part_latent, seg_mask[..., None], axis=1)
        anchor_pp = jnp.broadcast_to(
            anchor_seg[:, :, None, :], (B, n_seg, npoint, 3)
        )
        anchor_sq = ((anchor_pp - ref) ** 2).mean((-1, -2))  # (B, n_seg)
        anchor_loss = ((anchor_sq * geo_mask).sum(1) / num_active).mean()

        t, _ = self.t_sampler.sample(self.make_rng("sample"), B * n_seg)
        latent_pp = jnp.broadcast_to(
            latent_seg[:, :, None, :], (B, n_seg, npoint, latent_seg.shape[-1])
        ).reshape(B * n_seg, npoint, -1)
        code = jnp.repeat(global_feature, n_seg, axis=0)
        model_fn = self._model_fn(latent_pp, code, train=True)
        losses = self.diff.training_losses(
            model_fn,
            self.make_rng("sample"),
            ref.reshape(B * n_seg, npoint, 3),
            t,
            anchors=anchor_pp.reshape(B * n_seg, npoint, 3),
            reduce=False,
        )
        mse = losses["mse_loss"].mean((-1, -2)).reshape(B, n_seg)
        diffusion_loss = ((mse * geo_mask).sum(1) / num_active).mean()
        return {
            "anchor_loss": self.anchor_loss_weight * anchor_loss,
            "diffusion_loss": diffusion_loss,
        }

    def _equal_split(self, B):
        seg = jnp.repeat(
            jnp.arange(self.num_anchors, dtype=jnp.int32), self.points_per_anchor
        )
        return jnp.broadcast_to(seg[None], (B, self.npoints))

    def _decode(self, anchors_pp, code, latent_pp):
        model_fn = self._model_fn(latent_pp, code, train=False)
        out = self.diff.p_sample_loop(
            model_fn,
            self.make_rng("sample"),
            anchors_pp,
            ret_traj=self.ret_traj,
            ret_interval=self.ret_interval,
        )
        return out

    def predict(self, batch) -> Dict[str, jnp.ndarray]:
        """Eval forward (anchor_gen_supseg_partglot.py:146-211): anchors +
        latents from the decomposer, equal per-anchor point split, reverse
        decode (or forward q_sample visualization)."""
        x = batch["input"]
        geo_mask = batch["geo_mask"].astype(jnp.float32)
        B = x.shape[0]
        global_feature, anchors, part_latent = self.encode_decompose(
            x, geo_mask, train=False
        )
        pp = self.points_per_anchor
        anchor_pp = jnp.repeat(anchors, pp, axis=1)      # (B, npoints, 3)
        latent_pp = jnp.repeat(part_latent, pp, axis=1)  # (B, npoints, C)
        if self.forward_sample:
            ref = batch["ref"].reshape(B, -1, 3)[:, : self.npoints]
            traj = self.diff.q_sample_loop(self.make_rng("sample"), ref, anchor_pp)
            out = {"pred": ref, "traj": traj}
        else:
            out = self._decode(anchor_pp, global_feature, latent_pp)
        out["anchors"] = anchors
        out["seg_mask"] = self._equal_split(B)
        return out

    def interpolate_latent(self, batch, id1: int, id2: int, anchor_id: int,
                           steps: int = 10) -> Dict[str, jnp.ndarray]:
        """Interpolate ONE anchor's latent between two shapes
        (anchor_gen_supseg_partglot.py:88-116)."""
        x = batch["input"]
        geo_mask = batch["geo_mask"].astype(jnp.float32)
        lat = self.encoder_mod(
            x[jnp.array([id1, id2])], geo_mask[jnp.array([id1, id2])], train=False
        )  # (2, K, C)
        w = jnp.linspace(0.0, 1.0, steps)[:, None]
        dx = jnp.zeros((steps, self.num_anchors, 1)).at[:, anchor_id].set(w)
        latents = lat[0][None] + (lat[1] - lat[0])[None] * dx  # (steps, K, C)
        global_feature, anchors, mixed = self.decomposer_mod(latents, train=False)
        pp = self.points_per_anchor
        anchor_pp = jnp.repeat(anchors, pp, axis=1)
        latent_pp = jnp.repeat(mixed, pp, axis=1)
        out = self._decode(anchor_pp, global_feature, latent_pp)
        out["anchors"] = anchors
        out["seg_mask"] = self._equal_split(steps)
        return out

    def combine_latent(self, batch, ids) -> Dict[str, jnp.ndarray]:
        """Part i's latent from shape ids[i]
        (anchor_gen_supseg_partglot.py:119-144)."""
        x = batch["input"]
        geo_mask = batch["geo_mask"].astype(jnp.float32)
        idx = jnp.asarray(ids, jnp.int32)
        lat = self.encoder_mod(x[idx], geo_mask[idx], train=False)  # (K, K, C)
        latents = jnp.stack(
            [lat[i, i] for i in range(self.num_anchors)], axis=0
        )[None]  # (1, K, C)
        global_feature, anchors, mixed = self.decomposer_mod(latents, train=False)
        pp = self.points_per_anchor
        anchor_pp = jnp.repeat(anchors, pp, axis=1)
        latent_pp = jnp.repeat(mixed, pp, axis=1)
        out = self._decode(anchor_pp, global_feature, latent_pp)
        out["anchors"] = anchors
        out["seg_mask"] = self._equal_split(1)
        return out
