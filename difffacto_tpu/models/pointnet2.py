"""PointNet++ set-abstraction encoders (SSG / MSG).

Re-implements the reference PointNet++ stack (reference:
python/difffacto/models/encoders/pointnet2.py:8-115 and
pointnet2_ops_lib/pointnet2_ops/pointnet2_modules.py) on XLA-native ops:
FPS + ball query + grouping come from difffacto_tpu.ops (no CUDA), the
shared MLPs are channel-last Dense+BN over (B, S, K, C) neighborhoods, and
max-pooling over the sample axis replaces max_pool2d.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.points import ball_query, fps, gather_points_nd, group_points
from ..utils.registry import ENCODERS
from .pointnet import _HeadMLP
from ..nn.layers import TorchBatchNorm


class SharedMLP(nn.Module):
    """Conv2d-1x1 + BN + ReLU stack over the channel axis (pointnet2_modules.py:9-19)."""

    features: Sequence[int]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for f in self.features:
            x = nn.Dense(f, use_bias=False, dtype=self.dtype)(x)
            x = TorchBatchNorm(dtype=self.dtype)(x, use_running_average=not train)
            x = nn.relu(x)
        return x


class QueryAndGroup(nn.Module):
    """Ball-query neighborhoods with centered xyz (pointnet2_utils.py:279-333)."""

    radius: float
    nsample: int
    use_xyz: bool = True

    def __call__(self, xyz, new_xyz, features=None):
        """xyz (B, N, 3), new_xyz (B, S, 3), features (B, N, C) ->
        grouped (B, S, nsample, C[+3])."""
        idx = ball_query(new_xyz, xyz, self.radius, self.nsample)  # (B, S, K)
        grouped_xyz = group_points(xyz.transpose(0, 2, 1), idx).transpose(0, 2, 3, 1)
        grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
        if features is not None:
            grouped_feat = group_points(features.transpose(0, 2, 1), idx).transpose(
                0, 2, 3, 1
            )
            if self.use_xyz:
                return jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
            return grouped_feat
        assert self.use_xyz
        return grouped_xyz


class GroupAll(nn.Module):
    use_xyz: bool = True

    def __call__(self, xyz, new_xyz, features=None):
        grouped_xyz = xyz[:, None]  # (B, 1, N, 3)
        if features is not None:
            feat = features[:, None]
            if self.use_xyz:
                return jnp.concatenate([grouped_xyz, feat], axis=-1)
            return feat
        return grouped_xyz


class PointnetSAModule(nn.Module):
    """Single-scale set abstraction (pointnet2_modules.py:22-133)."""

    mlp: Sequence[int]
    npoint: Optional[int] = None
    radius: Optional[float] = None
    nsample: Optional[int] = None
    use_xyz: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = False):
        if self.npoint is not None:
            new_xyz = fps(xyz, self.npoint)
            grouper = QueryAndGroup(self.radius, self.nsample, self.use_xyz)
        else:
            new_xyz = None
            grouper = GroupAll(self.use_xyz)
        grouped = grouper(xyz, new_xyz, features)  # (B, S, K, C)
        spec = list(self.mlp[1:])
        h = SharedMLP(spec, dtype=self.dtype)(grouped, train=train)
        pooled = jnp.max(h, axis=2)  # (B, S, C_out)
        return new_xyz, pooled


class PointnetSAModuleMSG(nn.Module):
    """Multi-scale grouping set abstraction."""

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = False):
        new_xyz = fps(xyz, self.npoint)
        outs = []
        for radius, nsample, mlp in zip(self.radii, self.nsamples, self.mlps):
            grouped = QueryAndGroup(radius, nsample, self.use_xyz)(xyz, new_xyz, features)
            h = SharedMLP(list(mlp[1:]), dtype=self.dtype)(grouped, train=train)
            outs.append(jnp.max(h, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointnetFPModule(nn.Module):
    """Feature propagation via 3-NN inverse-distance interpolation
    (pointnet2_modules.py FP module)."""

    mlp: Sequence[int]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats, train: bool = False):
        from ..ops.points import three_interpolate, three_nn

        if known is not None:
            dist, idx = three_nn(unknown, known)
            inv = 1.0 / jnp.maximum(dist, 1e-8)
            weight = inv / inv.sum(-1, keepdims=True)
            interp = three_interpolate(
                known_feats.transpose(0, 2, 1), idx, weight
            ).transpose(0, 2, 1)
        else:
            interp = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1])
            )
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP(list(self.mlp), dtype=self.dtype)(interp, train=train)


@ENCODERS.register_module()
class PointNet2SSG(nn.Module):
    """Single-scale PointNet++ global encoder (pointnet2.py:8-80)."""

    additioinal_dim: int = 4  # (sic) reference spelling kept for config parity
    zdim: int = 256
    num_anchors: int = 4
    dropout: float = 0.5
    dtype: Optional[jnp.dtype] = None

    def sa_stack(self):
        extra = self.additioinal_dim
        return [
            PointnetSAModule(
                mlp=[extra + 3, 64, 64, 128], npoint=512, radius=0.2, nsample=64,
                dtype=self.dtype,
            ),
            PointnetSAModule(
                mlp=[128 + 3, 128, 128, 256], npoint=128, radius=0.4, nsample=64,
                dtype=self.dtype,
            ),
            PointnetSAModule(mlp=[256 + 3, 256, 512, 1024], dtype=self.dtype),
        ]

    @nn.compact
    def __call__(self, pointcloud, train: bool = False):
        B = pointcloud.shape[0]
        xyz = pointcloud[..., :3]
        features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None
        for module in self.sa_stack():
            xyz, features = module(xyz, features, train=train)
        g = features[:, 0]  # (B, 1024)
        h = nn.Dense(512, use_bias=False, dtype=self.dtype)(g)
        h = TorchBatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Dense(256, use_bias=False, dtype=self.dtype)(h)
        h = TorchBatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = nn.Dense(self.zdim * self.num_anchors, dtype=self.dtype)(h)
        return h.reshape(B, self.num_anchors, self.zdim)


@ENCODERS.register_module()
class PointNet2MSG(PointNet2SSG):
    """Multi-scale variant (pointnet2.py:82-115)."""

    def sa_stack(self):
        extra = self.additioinal_dim
        return [
            PointnetSAModuleMSG(
                npoint=512,
                radii=[0.1, 0.2, 0.4],
                nsamples=[16, 32, 128],
                mlps=[
                    [extra + 3, 32, 32, 64],
                    [extra + 3, 64, 64, 128],
                    [extra + 3, 64, 96, 128],
                ],
                dtype=self.dtype,
            ),
            PointnetSAModuleMSG(
                npoint=128,
                radii=[0.2, 0.4, 0.8],
                nsamples=[32, 64, 128],
                mlps=[
                    [64 + 128 + 128 + 3, 64, 64, 128],
                    [64 + 128 + 128 + 3, 128, 128, 256],
                    [64 + 128 + 128 + 3, 128, 128, 256],
                ],
                dtype=self.dtype,
            ),
            PointnetSAModule(mlp=[128 + 256 + 256 + 3, 256, 512, 1024], dtype=self.dtype),
        ]
