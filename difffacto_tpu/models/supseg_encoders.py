"""Super-segment / auxiliary encoders completing the reference ENCODERS set.

Re-implements (channel-last, masked-max instead of python loops):

* ``SupSegsEncoder`` — PartGlot super-segment encoder (reference:
  python/difffacto/models/encoders/super_seg_encoder.py:8-54): a shared
  per-point stack pools each super-segment to one token, a two-stage
  PointNet over segment tokens (masked global max) produces a global code,
  and an MLP emits ``num_anchors`` part latents.
* ``PartglotSupSegsEncoderWithCBN`` — the per-point stack with conditional
  batch norm on a timestep embedding (super_seg_encoder.py:79-101).
* ``MeanVarianceRegressor`` — per-part mean/logvar MLP heads with per-class
  batch norms (encoders/mean_variance_regressor.py:6-41).
* ``Pnet2Stage`` — two-stage global PointNet (encoders/pnet.py:5-33).
* ``PCNPartEncoder`` (registered as ENCODERS ``PCN``) — PCN-style two-stage
  encoder emitting per-part latents (encoders/PCN.py:6-67); distinct from
  the MODELS ``PCN`` completion network.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import TorchBatchNorm, timestep_embedding
from ..utils.registry import ENCODERS
from .segmentor import ConditionalBatchNorm1d

_NEG = -10000.0  # reference masks absent segments with -10000 before max


class _TwoStage(nn.Module):
    """Dense(128)+BN+ReLU -> Dense(256) -> masked global max -> concat ->
    Dense(512)+BN+ReLU -> Dense(out) -> masked global max. The shared
    PointNet trunk of Pnet2Stage / SupSegsEncoder / the PCN encoder.

    ``global_first`` pins the reference's INCONSISTENT concat order: pnet.py
    and PCN.py concatenate [global, local] (pnet.py:31, PCN.py:61) while
    super_seg_encoder.py concatenates [local, global]
    (super_seg_encoder.py:47) — the order determines the second-stage
    weights' input-channel layout under torch ingestion."""

    out_dim: int
    global_first: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, neg_mask=None, train: bool = False):
        """x (B, M, C); neg_mask (B, M) additive (-1e4 on masked slots)."""
        h = nn.Dense(128, dtype=self.dtype)(x)
        h = TorchBatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Dense(256, dtype=self.dtype)(h)
        masked = h if neg_mask is None else h + neg_mask[..., None]
        g = jnp.broadcast_to(jnp.max(masked, axis=1, keepdims=True), h.shape)
        h = jnp.concatenate([g, h] if self.global_first else [h, g], axis=-1)
        h = nn.Dense(512, dtype=self.dtype)(h)
        h = TorchBatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Dense(self.out_dim, dtype=self.dtype)(h)
        masked = h if neg_mask is None else h + neg_mask[..., None]
        return jnp.max(masked, axis=1)  # (B, out_dim)


class PartglotSupSegsEncoderBase(nn.Module):
    """Shared per-point stack: 4 x (Dense+BN+ReLU) -> Dense
    (super_seg_encoder.py:56-77)."""

    sup_segs_dim: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for _ in range(4):
            h = nn.Dense(self.sup_segs_dim, dtype=self.dtype)(h)
            h = TorchBatchNorm(dtype=self.dtype)(h, use_running_average=not train)
            h = nn.relu(h)
        return nn.Dense(self.sup_segs_dim, dtype=self.dtype)(h)


@ENCODERS.register_module()
class SupSegsEncoder(nn.Module):
    """(B, n_seg, npoint, 3), mask (B, n_seg) -> (B, num_anchors, C)
    part latents (super_seg_encoder.py:8-54)."""

    sup_segs_dim: int = 64
    part_latent_dim: int = 256
    num_anchors: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        B, n_seg, npoint, _ = x.shape
        pts = PartglotSupSegsEncoderBase(self.sup_segs_dim, dtype=self.dtype)(
            x.reshape(B * n_seg, npoint, -1), train=train
        )
        seg_tokens = jnp.max(pts, axis=1).reshape(B, n_seg, -1)
        neg = None
        if mask is not None:
            neg = (1.0 - mask.astype(jnp.float32)) * _NEG
        g = _TwoStage(1024, global_first=False, dtype=self.dtype)(
            seg_tokens, neg, train=train
        )
        h = nn.relu(nn.Dense(1024, dtype=self.dtype)(g))
        h = nn.relu(nn.Dense(1024, dtype=self.dtype)(h))
        h = nn.Dense(self.part_latent_dim * self.num_anchors, dtype=self.dtype)(h)
        return h.reshape(B, self.num_anchors, self.part_latent_dim)


@ENCODERS.register_module()
class PartglotSupSegsEncoderWithCBN(nn.Module):
    """The per-point stack with timestep-conditional batch norm
    (super_seg_encoder.py:79-101): x (B, N, 3), t (B,) -> (B, N, dim)."""

    sup_segs_dim: int = 64
    embed_t_size: int = 128
    emb_size: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        cond = timestep_embedding(t, self.embed_t_size)
        h = x
        for i in range(4):
            h = nn.Dense(self.sup_segs_dim, dtype=self.dtype)(h)
            h = ConditionalBatchNorm1d(
                self.sup_segs_dim, self.embed_t_size, self.emb_size, dtype=self.dtype
            )(h, cond, train=train)
            h = nn.relu(h)
        return nn.Dense(self.sup_segs_dim, dtype=self.dtype)(h)


class _PerClassBNMLP(nn.Module):
    """Dense stack whose hidden activations get a PER-CLASS BatchNorm
    (mean_variance_regressor.py:11-28): the Dense weights are shared across
    the K part slots, the BN statistics are not."""

    latent_dim: int
    num_class: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x (B, K, latent_dim) -> (B, K, latent_dim)."""
        h = x
        for width in (256, 128, 256):
            h = nn.Dense(width, dtype=self.dtype)(h)
            h = jnp.stack(
                [
                    TorchBatchNorm(dtype=self.dtype)(
                        h[:, i], use_running_average=not train
                    )
                    for i in range(self.num_class)
                ],
                axis=1,
            )
            h = nn.relu(h)
        return nn.Dense(self.latent_dim, dtype=self.dtype)(h)


@ENCODERS.register_module()
class MeanVarianceRegressor(nn.Module):
    """(B, K, C) part codes -> (mean, logvar) each (B, K, C)
    (mean_variance_regressor.py:6-41)."""

    latent_dim: int = 256
    num_class: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        m = _PerClassBNMLP(self.latent_dim, self.num_class, dtype=self.dtype, name="mean")(
            x, train=train
        )
        v = _PerClassBNMLP(self.latent_dim, self.num_class, dtype=self.dtype, name="var")(
            x, train=train
        )
        return m, v


@ENCODERS.register_module()
class Pnet2Stage(nn.Module):
    """Two-stage global PointNet: (B, N, point_dim) -> (B, latent_dim)
    (encoders/pnet.py:5-33)."""

    latent_dim: int = 1024
    point_dim: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        return _TwoStage(self.latent_dim, dtype=self.dtype)(xyz, None, train=train)


@ENCODERS.register_module(name="PCN")
class PCNPartEncoder(nn.Module):
    """PCN-style two-stage encoder emitting per-part latents
    (encoders/PCN.py:6-67): (B, N, point_dim) -> (B, num_anchors, C)."""

    point_dim: int = 3
    part_latent_dim: int = 512
    num_anchors: int = 4
    normalize_latent: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        B = xyz.shape[0]
        g = _TwoStage(1024, dtype=self.dtype)(xyz, None, train=train)
        h = nn.relu(nn.Dense(1024, dtype=self.dtype)(g))
        h = nn.relu(nn.Dense(1024, dtype=self.dtype)(h))
        h = nn.Dense(self.part_latent_dim * self.num_anchors, dtype=self.dtype)(h)
        part_latent = h.reshape(B, self.num_anchors, self.part_latent_dim)
        if self.normalize_latent:
            part_latent = part_latent / jnp.linalg.norm(
                part_latent, axis=-1, keepdims=True
            )
        return part_latent
