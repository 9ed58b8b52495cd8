"""Decomposers: part-token mixers producing global features + anchors.

Re-implements the reference's legacy decomposer path (reference:
python/difffacto/models/decomposers/mixer.py:88-399, transformer.py:162-263):
part latents are mixed by self-attention, an MLP regresses per-part anchor
coordinates, and an aggregator produces a global feature. Kept channel-last
and trimmed to the option subset actually exercised (mlp_type 0/1,
global_mlp_type 0/1, residual attention).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..nn.attention import BasicTransformerBlock, CrossAttention
from ..nn.layers import FeedForward, MLP
from ..utils.registry import DECOMPOSERS


@DECOMPOSERS.register_module()
class ComponentMixer(nn.Module):
    """(B, K, C) part latents -> (global_feature, anchors (B, K, 3), mixed latents).

    Mirrors mixer.py:88-299 behavior for the shipped option subset.
    """

    num_anchors: int
    part_latent_dim: int
    point_dim: int = 3
    include_attention: bool = False
    nheads: int = 8
    include_global_feature: bool = False
    global_mlp_type: int = 0
    normalize_latent: bool = False
    mlp_type: int = 0
    res: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, part_latent, train: bool = False):
        B, K, C = part_latent.shape
        if self.mlp_type == 0:
            coarse = MLP(
                [512, 256, self.num_anchors * self.point_dim], dtype=self.dtype, name="mlp"
            )(part_latent.reshape(B, -1)).reshape(B, self.num_anchors, self.point_dim)
        else:
            feat = MLP([256, 512], dtype=self.dtype, name="mlp")(part_latent)
            pooled = jnp.max(feat, axis=1)
            coarse = MLP(
                [256, self.num_anchors * self.point_dim], dtype=self.dtype, name="anchor_regressor"
            )(pooled).reshape(B, self.num_anchors, self.point_dim)

        h = part_latent
        if self.include_attention:
            a = CrossAttention(
                query_dim=C, heads=self.nheads, dim_head=C // self.nheads,
                dtype=self.dtype, name="attention",
            )(nn.LayerNorm(name="norm1")(h))
            h = a + h if self.res else a
            f = FeedForward(C, dtype=self.dtype, name="ff")(nn.LayerNorm(name="norm2")(h))
            h = f + h if self.res else f

        global_feature = None
        if self.include_global_feature:
            if self.global_mlp_type == 0:
                global_feature = MLP([512, C], dtype=self.dtype, name="aggregator")(
                    h.reshape(B, -1)
                )
            else:
                g = MLP([256, 512], dtype=self.dtype, name="aggregator")(h)
                global_feature = MLP([C], dtype=self.dtype, name="aggregator_mlp")(
                    jnp.max(g, axis=1)
                )
        if self.normalize_latent:
            if global_feature is not None:
                global_feature = global_feature / jnp.linalg.norm(
                    global_feature, axis=-1, keepdims=True
                )
            h = h / jnp.linalg.norm(h, axis=-1, keepdims=True)
        return global_feature, coarse, h


@DECOMPOSERS.register_module()
class ComponentMixerV2(ComponentMixer):
    """V2 keeps the same interface with attention always on (mixer.py:301-399)."""

    include_attention: bool = True


@DECOMPOSERS.register_module()
class PartCodeTransformer(nn.Module):
    """Deep transformer over part tokens -> (global z, per-part codes)
    (decomposers/transformer.py:162-263)."""

    input_channels: int = 3
    output_channels: int = 3
    n_ctx: int = 4
    width: int = 512
    layers: int = 12
    heads: int = 8
    class_cond: bool = True
    param_cond: bool = True
    param_dim: int = 6
    use_mask_in_transformer: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, params: Sequence[jnp.ndarray] = (), mask=None, train: bool = False):
        """x (B, K, C); params: extra (B, K, param_dim) tensors; mask (B, K)."""
        B, K, _ = x.shape
        if self.param_cond and params:
            x = jnp.concatenate([x, *params], axis=-1)
        if self.class_cond:
            class_emb = self.param(
                "class_embedding", nn.initializers.normal(1.0), (self.n_ctx, self.n_ctx)
            )
            x = jnp.concatenate(
                [x, jnp.broadcast_to(class_emb[None], (B, K, self.n_ctx))], axis=-1
            )
        h = nn.Dense(self.width, dtype=self.dtype, name="input_proj")(x)
        h = nn.LayerNorm(name="ln_pre")(h)
        attn_mask = mask if self.use_mask_in_transformer else None
        for i in range(self.layers):
            h = BasicTransformerBlock(
                dim=self.width, n_heads=self.heads, d_head=self.width // self.heads,
                single_attn=True, dtype=self.dtype, name=f"block_{i}",
            )(h, None, attn_mask, None, not train)
        h = nn.LayerNorm(name="ln_post")(h)
        codes = nn.Dense(
            self.output_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="output_proj",
        )(h)
        if mask is not None:
            h = h * mask[..., None]
            pooled = jnp.max(h + (1 - mask[..., None]) * -1e5, axis=1)
        else:
            pooled = jnp.max(h, axis=1)
        z = MLP([self.width, self.width], dtype=self.dtype, name="aggregate")(pooled)
        return z, codes


@DECOMPOSERS.register_module()
class PartCodeTransformerV2(PartCodeTransformer):
    """V2 splits ``output_channels`` evenly across the ``n_ctx`` part tokens
    and flattens the per-token codes back to one vector
    (decomposers/transformer.py:263-299); optional post-MLP on the pooled z."""

    post_mlp: bool = False

    @nn.compact
    def __call__(self, x, params: Sequence[jnp.ndarray] = (), mask=None, train: bool = False):
        B = x.shape[0]
        assert self.output_channels % self.n_ctx == 0
        per_part = self.output_channels // self.n_ctx
        inner = PartCodeTransformer(
            input_channels=self.input_channels,
            output_channels=per_part,
            n_ctx=self.n_ctx,
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            class_cond=self.class_cond,
            param_cond=self.param_cond,
            param_dim=self.param_dim,
            use_mask_in_transformer=self.use_mask_in_transformer,
            dtype=self.dtype,
            name="inner",
        )
        z, codes = inner(x, params, mask, train)
        if self.post_mlp:
            z = MLP([self.width, self.width], dtype=self.dtype, name="post")(z)
        return z, codes.reshape(B, self.output_channels)
