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
        x = batch["input"]
        if self.include_attn_weight_in_encoder:
            x = jnp.concatenate([x, batch["attn_map"]], axis=-1)
        code = self.encoder_mod(x, train=train)  # (B, num_anchors, zdim)
        return code

    def denoise(self, x, t, ctx, anchors, variances, seg_mask, valid_id, train: bool = False):
        return self.net(
            x, t, ctx, anchors, variances, seg_mask, valid_id, deterministic=not train
        )

    def loss(self, batch, epoch=0) -> Dict[str, jnp.ndarray]:
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
            ctx=code,
            seg_mask=batch["ref_seg_mask"].astype(jnp.int32),
        )
        return losses

    def prepare_decode(self, batch, train: bool = False):
        code = self.encode(batch, train=train)
        B = code.shape[0]
        anchors = jnp.zeros((B, self.npoints, 3), jnp.float32)
        seg_mask = batch["ref_seg_mask"].astype(jnp.int32)
        return code, anchors, seg_mask


@MODELS.register_module()
class AnchoredGeneration(nn.Module):
    """Unconditional anchored generation (anchor_gen_uncond.py:12-269):
    sample a global latent, decompose into anchors + part latents, decode
    with the anchored diffusion."""

    decomposer: dict
    diffusion: dict
    sampler: dict
    num_anchors: int
    num_timesteps: int
    npoints: int = 2048
    latent_dim: int = 256
    ret_traj: bool = False
    ret_interval: int = 20
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.decomposer_mod = build_from_cfg(dict(self.decomposer), DECOMPOSERS, dtype=self.dtype)
        self.net = build_from_cfg(dict(self.diffusion["net"]), NETS, dtype=self.dtype)
        self.diff = build_diffusion(self.diffusion, self.num_timesteps)
        self.t_sampler = build_from_cfg(
            dict(self.sampler), SAMPLERS, num_timesteps=self.num_timesteps
        )

    def denoise(self, x, t, ctx, anchors, variances, seg_mask, valid_id, train: bool = False):
        return self.net(
            x, t, ctx, anchors, variances, seg_mask, valid_id, deterministic=not train
        )

    def decompose(self, part_latent, train: bool = False):
        """(B, K, C) -> (anchors (B, K, 3), mixed latents)."""
        _, anchors, mixed = self.decomposer_mod(part_latent, train=train)
        return anchors, mixed

    def sample_latents(self, sample_num: int):
        z = jax.random.normal(
            self.make_rng("sample"), (sample_num, self.num_anchors, self.latent_dim)
        )
        anchors, mixed = self.decompose(z, train=False)
        pts_per = self.npoints // self.num_anchors
        seg_mask = jnp.repeat(
            jnp.arange(self.num_anchors, dtype=jnp.int32)[None], sample_num, axis=0
        )
        seg_mask = jnp.repeat(seg_mask, pts_per, axis=1)
        from .part_encoder import gather_per_point

        anchor_pp = gather_per_point(anchors, seg_mask)
        return mixed, anchor_pp, seg_mask

    def loss(self, batch, epoch=0) -> Dict[str, jnp.ndarray]:
        ref = batch["ref"]
        B = ref.shape[0]
        z = jax.random.normal(
            self.make_rng("sample"), (B, self.num_anchors, self.latent_dim)
        )
        anchors, mixed = self.decompose(z, train=True)
        seg_mask = batch["ref_seg_mask"].astype(jnp.int32)
        from .part_encoder import gather_per_point

        anchor_pp = gather_per_point(anchors, seg_mask)
        t, _ = self.t_sampler.sample(self.make_rng("sample"), B)

        def model_fn(inp, ts, c, anc, var, seg, vid):
            return self.denoise(inp, ts, c, anc, var, seg, vid, train=True)

        return self.diff.training_losses(
            model_fn, self.make_rng("sample"), ref, t, anchors=anchor_pp,
            ctx=mixed, seg_mask=seg_mask,
        )
