"""Cross-diffusion denoiser networks.

``TransformerNet`` re-implements the reference denoiser (reference:
python/difffacto/models/diffusions/nets/attention.py:309-440): per-point
tokens (x_t ++ per-point params ++ class one-hot) cross-attend to the 4 part
context tokens (part code ++ params ++ class ++ t-embedding) through
``depth`` single-attention blocks. Channel-last (B, N, C) layout; the whole
net is one XLA program per diffusion step and is scanned over timesteps by
the diffusion module.

``PointwiseNet`` is the concat-squash MLP alternative
(nets/pointwisenet.py:9-99) used by the PDM baseline.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.attention import BasicTransformerBlock
from ..nn.layers import FeedForward, timestep_embedding
from ..utils.registry import NETS


@NETS.register_module()
class TransformerNet(nn.Module):
    """Args mirror the reference constructor (attention.py:318-383).

    Call signature (all channel-last):
      x: (B, N, in_channels) noisy points (+whatever the diffusion prepends)
      t: (B,) timesteps (already scaled by the diffusion)
      ctx: (B, K, ctx_raw) part tokens, ctx_raw == context_dim arg
      anchors/variances: (B, N, 3) per-point params (cat_params_to_x)
      seg_mask: (B, N) int anchor assignment (cat_class_to_x)
      valid_id: (B, K) part-presence mask
    """

    in_channels: int
    out_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    dropout: float = 0.0
    context_dim: Optional[int] = None
    n_class: int = 4
    class_cond: bool = False
    cat_params_to_x: bool = False
    cat_class_to_x: bool = False
    single_attn: bool = False
    mask_out_unreferenced_code: bool = True
    add_class_cond: bool = False
    add_t_to_x: bool = False
    res: bool = False
    include_std: bool = False
    use_checkpoint: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x,
        t,
        ctx,
        anchors=None,
        variances=None,
        seg_mask=None,
        valid_id=None,
        deterministic: bool = True,
    ):
        inner = self.n_heads * self.d_head
        B, N = x.shape[0], x.shape[1]

        if isinstance(ctx, (list, tuple)):
            ctx = jnp.concatenate(ctx, axis=-1)
        if self.class_cond and not self.add_class_cond:
            eye = jnp.broadcast_to(
                jnp.eye(self.n_class, dtype=ctx.dtype)[None], (B, self.n_class, self.n_class)
            )
            ctx = jnp.concatenate([ctx, eye], axis=-1)
        t_dim = 256 if not self.add_t_to_x else inner
        t_embed = FeedForward(
            t_dim, dropout=self.dropout, glu=True, dtype=self.dtype, name="time_embed"
        )(timestep_embedding(t, t_dim), deterministic)
        if not self.add_t_to_x:
            ctx = jnp.concatenate(
                [ctx, jnp.broadcast_to(t_embed[:, None], (B, ctx.shape[1], t_dim))],
                axis=-1,
            )

        if self.cat_params_to_x:
            var_feat = jnp.sqrt(variances) if self.include_std else variances
            x = jnp.concatenate([x, anchors, var_feat], axis=-1)
        if self.cat_class_to_x:
            onehot = jax.nn.one_hot(seg_mask.astype(jnp.int32), self.n_class, dtype=x.dtype)
            x = jnp.concatenate([x, onehot], axis=-1)
        in_ch = x.shape[-1]

        x_in = x
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        if self.add_t_to_x:
            h = h + t_embed[:, None]
        h = nn.LayerNorm(dtype=self.dtype, name="pre_norm")(h)

        mask = valid_id if self.mask_out_unreferenced_code else None
        block_cls = BasicTransformerBlock
        if self.use_checkpoint:
            block_cls = nn.remat(BasicTransformerBlock, static_argnums=(4,))
        for i in range(self.depth):
            h = block_cls(
                dim=inner,
                n_heads=self.n_heads,
                d_head=self.d_head,
                dropout=self.dropout,
                context_dim=ctx.shape[-1],
                single_attn=self.single_attn,
                dtype=self.dtype,
                name=f"block_{i}",
            )(h, ctx, mask, None, deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="post_norm")(h)

        zero_out = in_ch == self.out_channels or self.res
        kinit = nn.initializers.zeros if zero_out else nn.initializers.lecun_normal()
        out = nn.Dense(
            self.out_channels,
            kernel_init=kinit,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj_out",
        )(h)
        if x_in.shape[-1] == out.shape[-1]:
            return out + x_in
        if self.res:
            return out + x_in[..., : out.shape[-1]]
        return out


class ConcatSquashDense(nn.Module):
    """Dense modulated by context gate+bias (pointwisenet.py ConcatSquashLinear)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, ctx):
        gate = jax.nn.sigmoid(nn.Dense(self.features, dtype=self.dtype, name="hyper_gate")(ctx))
        bias = nn.Dense(self.features, use_bias=False, dtype=self.dtype, name="hyper_bias")(ctx)
        return nn.Dense(self.features, dtype=self.dtype, name="layer")(x) * gate + bias


@NETS.register_module()
class PointwiseNet(nn.Module):
    """Concat-squash MLP denoiser (nets/pointwisenet.py:9-99).

    ctx vector per shape = [latent, t-embed(sin/cos of t)] modulates each layer.
    """

    point_dim: int = 3
    context_dim: int = 256
    residual: bool = True
    hidden: Sequence[int] = (128, 256, 512, 256, 128)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t, ctx, **_):
        if isinstance(ctx, (list, tuple)):
            ctx = jnp.concatenate([c.reshape(c.shape[0], -1) for c in ctx], axis=-1)
        tf = t.astype(jnp.float32)[:, None]
        time_emb = jnp.concatenate([tf, jnp.sin(tf), jnp.cos(tf)], axis=-1)
        cond = jnp.concatenate([time_emb, ctx], axis=-1)[:, None, :]
        h = x
        for i, f in enumerate(self.hidden):
            h = ConcatSquashDense(f, dtype=self.dtype, name=f"cs_{i}")(h, cond)
            h = jax.nn.leaky_relu(h)
        h = ConcatSquashDense(self.point_dim, dtype=self.dtype, name="cs_out")(h, cond)
        return x + h if self.residual else h
