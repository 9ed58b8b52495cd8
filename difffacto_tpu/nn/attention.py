"""Cross-attention blocks, channel-last and fused-friendly.

Replaces reference attention (reference:
python/difffacto/models/diffusions/nets/attention.py:161-306). On TPU the
denoiser's attention is N point-tokens cross-attending to 4 part tokens —
an O(N*4) dot-product XLA fuses trivially, so no memory-efficient/xformers
path is needed; one einsum pair rides the MXU.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import FeedForward


class CrossAttention(nn.Module):
    """Multi-head cross attention (attention.py:161-204).

    x: (B, N, query_dim); context: (B, M, context_dim) or None (self-attn);
    mask: (B, M) with 1 = attend, 0 = masked out.
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, context=None, mask=None, deterministic: bool = True):
        h, d = self.heads, self.dim_head
        inner = h * d
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        B, N = q.shape[0], q.shape[1]
        M = k.shape[1]
        q = q.reshape(B, N, h, d)
        k = k.reshape(B, M, h, d)
        v = v.reshape(B, M, h, d)

        scale = d ** -0.5
        sim = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        if mask is not None:
            neg = jnp.finfo(sim.dtype).min
            sim = jnp.where(mask[:, None, None, :].astype(bool), sim, neg)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, inner)
        out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class BasicTransformerBlock(nn.Module):
    """Pre-LN transformer block (attention.py:259-306).

    ``single_attn=True`` (the shipped configs) drops the first attention;
    the remaining one is cross-attention when ``context`` is given, else
    self-attention. ``adaln`` injects shift/scale from a conditioning vector
    ``y`` into the FF norm (used by the aligner's cond_noise_type=2).
    """

    dim: int
    n_heads: int
    d_head: int
    dropout: float = 0.0
    context_dim: Optional[int] = None
    gated_ff: bool = True
    single_attn: bool = False
    adaln: bool = False
    y_dim: int = 32
    use_checkpoint: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, context=None, mask=None, y=None, deterministic: bool = True):
        if not self.single_attn:
            x = (
                CrossAttention(
                    query_dim=self.dim,
                    context_dim=self.context_dim,
                    heads=self.n_heads,
                    dim_head=self.d_head,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    name="attn1",
                )(nn.LayerNorm(dtype=self.dtype, name="norm1")(x), context, mask, deterministic)
                + x
            )
        x = (
            CrossAttention(
                query_dim=self.dim,
                context_dim=self.context_dim,
                heads=self.n_heads,
                dim_head=self.d_head,
                dropout=self.dropout,
                dtype=self.dtype,
                name="attn2",
            )(nn.LayerNorm(dtype=self.dtype, name="norm2")(x), context, mask, deterministic)
            + x
        )
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        if self.adaln:
            emb = nn.Dense(2 * self.dim, dtype=self.dtype, name="emb_layers")(
                jax.nn.silu(y)
            )
            shift, scale = jnp.split(emb, 2, axis=-1)
            h = h * (1.0 + scale[:, None]) + shift[:, None]
        x = (
            FeedForward(
                self.dim, dropout=self.dropout, glu=self.gated_ff, dtype=self.dtype, name="ff"
            )(h, deterministic)
            + x
        )
        return x
