"""Masked part PointNet encoders.

``PointNetV2`` re-implements the reference's part stylizer backbone
(reference: python/difffacto/models/encoders/pointnet.py:124-213): a shared
per-point conv stack followed by a segmentation-weighted max-pool per part
and (optionally) per-part MLP heads. The reference's grouped ``Conv1d``
per-part heads (pointnet.py:171-185) become an ``nn.vmap`` over the part
axis with separate parameters AND separate BatchNorm statistics — the exact
semantics of torch's ``BatchNorm1d(C*K)`` over a (B, C*K, 1) tensor.

All inputs channel-last: points (B, N, 3), seg one-hot (B, N, K).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..nn.layers import ConvBNReLUStack, TorchBatchNorm
from ..parallel.axes import allmax_points
from ..utils.registry import ENCODERS


class _HeadMLP(nn.Module):
    """512 -> 256 -> 128 -> zdim with BN+ReLU between (pointnet.py:157-170)."""

    zdim: int
    use_ln: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for f in (256, 128):
            x = nn.Dense(f, dtype=self.dtype)(x)
            if self.use_ln:
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
            else:
                x = TorchBatchNorm(dtype=self.dtype)(x, use_running_average=not train)
            x = nn.relu(x)
        return nn.Dense(self.zdim, dtype=self.dtype)(x)


@ENCODERS.register_module()
class PointNetV2(nn.Module):
    point_dim: int = 3
    zdim: int = 1024
    num_anchors: int = 4
    reweight_by_anchor: bool = True
    use_ln: bool = False
    per_part_mlp: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, points, attn_weight, train: bool = False):
        """points (B, N, point_dim), attn_weight (B, N, K) -> (m, v) each (B, K, zdim)."""
        B, N, _ = points.shape
        K = self.num_anchors
        h = ConvBNReLUStack(
            (128, 128, 256, 512), relu_last=False, dtype=self.dtype, name="pnet"
        )(points, train=train)
        # Mask-weighted max pool per part (pointnet.py:194-198). The reference
        # multiplies features by the 0/1 weight (so absent parts pool to 0 for
        # non-positive features) and rescales by num_anchors.
        weighted = h[:, :, None, :] * attn_weight[:, :, :, None].astype(h.dtype)
        if self.reweight_by_anchor:
            weighted = weighted * K
        pooled = allmax_points(jnp.max(weighted, axis=1))  # (B, K, 512)

        if self.per_part_mlp:
            head = nn.vmap(
                _HeadMLP,
                in_axes=(1, None),
                out_axes=1,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True},
            )
            m = head(self.zdim, dtype=self.dtype, name="mlp_m")(pooled, train)
            v = head(self.zdim, dtype=self.dtype, name="mlp_v")(pooled, train)
        else:
            m = _HeadMLP(self.zdim, use_ln=self.use_ln, dtype=self.dtype, name="mlp_m")(
                pooled, train
            )
            v = _HeadMLP(self.zdim, use_ln=self.use_ln, dtype=self.dtype, name="mlp_v")(
                pooled, train
            )
        return m, v


@ENCODERS.register_module()
class PointNetVAEBase(nn.Module):
    """Whole-cloud PointNet -> (mean, logvar) heads (pointnet.py:7-58)."""

    point_dim: int = 3
    zdim: int = 1024
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, points, mask=None, train: bool = False):
        h = ConvBNReLUStack(
            (128, 128, 256, 512), relu_last=False, dtype=self.dtype, name="pnet"
        )(points, train=train)
        if mask is not None:
            h = jnp.where(mask[..., None], -jnp.inf, h)
        g = allmax_points(jnp.max(h, axis=1))
        g = jnp.nan_to_num(g, neginf=0.0)
        m = _HeadMLP(self.zdim, dtype=self.dtype, name="mlp_m")(g, train)
        v = _HeadMLP(self.zdim, dtype=self.dtype, name="mlp_v")(g, train)
        return m, v


@ENCODERS.register_module()
class PointNetVAE(nn.Module):
    """Whole-cloud encoder -> per-anchor (mean, logvar) (pointnet.py:61-109)."""

    point_dim: int = 7
    zdim: int = 1024
    num_anchors: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, points, train: bool = False):
        B = points.shape[0]
        h = ConvBNReLUStack(
            (128, 128, 256, 512), relu_last=False, dtype=self.dtype, name="pnet"
        )(points, train=train)
        g = allmax_points(jnp.max(h, axis=1))
        m = _HeadMLP(self.zdim * self.num_anchors, dtype=self.dtype, name="mlp_m")(g, train)
        v = _HeadMLP(self.zdim * self.num_anchors, dtype=self.dtype, name="mlp_v")(g, train)
        return (
            m.reshape(B, self.num_anchors, self.zdim),
            v.reshape(B, self.num_anchors, self.zdim),
        )


@ENCODERS.register_module()
class PointNetV2VAE(PointNetV2):
    """PointNetV2 with seg flags packed into the input channels
    (pointnet.py:280-376): x[..., 3:] is the attention map."""

    deterministic: bool = False

    @nn.compact
    def __call__(self, points, attn_weight=None, train: bool = False):
        if attn_weight is None:
            attn_weight = points[..., 3:]
            points = points[..., :3]
        m, v = PointNetV2.__call__(self, points, attn_weight, train=train)
        if self.deterministic:
            return m
        return m, v


@ENCODERS.register_module()
class PointNetV2Variant(nn.Module):
    """Masked max-pool (-inf outside part) + per-part head MLPs
    (pointnet.py:216-278)."""

    point_dim: int = 3
    zdim: int = 1024
    num_anchors: int = 4
    per_part_mlp: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, points, seg_flag=None, train: bool = False):
        if seg_flag is None:
            seg_flag = points[..., 3:]
            points = points[..., :3]
        B = points.shape[0]
        K = self.num_anchors
        h = ConvBNReLUStack(
            (128, 128, 256, 512), relu_last=False, dtype=self.dtype, name="pnet"
        )(points, train=train)
        # INTENT of pointnet.py:259-261: max over each part's own points,
        # absent parts pooled to 0. The reference's own expression is
        # degenerate as shipped — ``h * flag - (1 - flag) * inf`` makes every
        # in-part entry ``h - 0 * inf = nan`` which nan_to_num zeroes, so its
        # pooled features are identically 0 (pinned in
        # tests/test_reference_parity_modules.py).
        weighted = jnp.where(
            seg_flag[..., None] > 0, h[:, :, None, :], -jnp.inf
        )
        pooled = jnp.nan_to_num(
            allmax_points(jnp.max(weighted, axis=1)), nan=0.0, posinf=0.0, neginf=0.0
        )
        if self.per_part_mlp:
            head = nn.vmap(
                _HeadMLP,
                in_axes=(1, None),
                out_axes=1,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True},
            )
            m = head(self.zdim, dtype=self.dtype, name="mlp_m")(pooled, train)
            v = head(self.zdim, dtype=self.dtype, name="mlp_v")(pooled, train)
        else:
            m = _HeadMLP(self.zdim, dtype=self.dtype, name="mlp_m")(pooled, train)
            v = _HeadMLP(self.zdim, dtype=self.dtype, name="mlp_v")(pooled, train)
        return m, v


@ENCODERS.register_module()
class PointNetV3(nn.Module):
    """Global + masked pooled features concatenated -> per-part mean
    (pointnet.py:379-425)."""

    point_dim: int = 3
    zdim: int = 1024
    num_anchors: int = 4
    mult: int = 1
    reweight_by_anchor: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, points, attn_weight=None, train: bool = False):
        if attn_weight is None and points.shape[-1] == 3 + self.num_anchors:
            attn_weight = points[..., 3:]
            points = points[..., :3]
        B = points.shape[0]
        K = self.num_anchors
        mult = self.mult
        h = ConvBNReLUStack(
            (128 * mult, 128 * mult, 256 * mult, 256 * mult),
            relu_last=False,
            dtype=self.dtype,
            name="pnet",
        )(points, train=train)
        weighted = h[:, :, None, :] * attn_weight[..., None]
        if self.reweight_by_anchor:
            weighted = weighted * K
        pooled = allmax_points(jnp.max(weighted, axis=1))  # (B, K, 256m)
        g = jnp.broadcast_to(allmax_points(jnp.max(h, axis=1))[:, None], pooled.shape)
        x = jnp.concatenate([g, pooled], axis=-1)  # (B, K, 512m)
        m = _HeadMLP(self.zdim, dtype=self.dtype, name="mlp_m")(x, train)
        return m


@ENCODERS.register_module()
class PointNet(nn.Module):
    """Deterministic whole-cloud encoder -> (B, num_anchors, zdim) (pointnet.py:112-119)."""

    point_dim: int = 3
    zdim: int = 1024
    num_anchors: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, points, train: bool = False):
        h = ConvBNReLUStack(
            (128, 128, 256, 512), relu_last=False, dtype=self.dtype, name="pnet"
        )(points, train=train)
        g = allmax_points(jnp.max(h, axis=1))
        m = _HeadMLP(self.zdim * self.num_anchors, dtype=self.dtype, name="mlp_m")(g, train)
        return m.reshape(points.shape[0], self.num_anchors, self.zdim)
