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

from .layers import FeedForward, FusedLNFF


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

    # Context lengths at or below this use the fused small-ctx path.
    SMALL_CTX: int = 8

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
        scale = d ** -0.5

        if context is not None and M <= self.SMALL_CTX and N > M:
            out = self._small_ctx_attention(q, k, v, mask, scale)
        else:
            qh = q.reshape(B, N, h, d)
            kh = k.reshape(B, M, h, d)
            vh = v.reshape(B, M, h, d)
            sim = jnp.einsum("bnhd,bmhd->bhnm", qh, kh) * scale
            if mask is not None:
                neg = jnp.finfo(sim.dtype).min
                sim = jnp.where(mask[:, None, None, :].astype(bool), sim, neg)
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, vh).reshape(B, N, inner)
        out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)

    def _small_ctx_attention(self, q, k, v, mask, scale):
        """Fused attention for a tiny static context (the 4 part tokens).

        The naive einsum materializes (B, h, N, M) with M=4 in the minor
        (lane) dimension — XLA pads it to 128, turning a trivial score matrix
        into ~0.5 GB of HBM traffic per denoiser step. Instead the tiny K/V
        are laid out as block-diagonal (inner, h*M) matrices so scores and
        the weighted sum are TWO dense (N x inner)@(inner x h*M) matmuls with
        a grouped softmax in between; nothing wider than h*M lanes is ever
        materialized. Identical math and parameters to the naive path.
        """
        h, d = self.heads, self.dim_head
        inner = h * d
        B, N = q.shape[0], q.shape[1]
        M = k.shape[1]
        G = h * M

        # k, v: (B, M, inner) -> block-diagonal (B, inner, G) / (B, G, inner);
        # tiny tensors, assembled with one one-hot einsum each.
        kh = k.reshape(B, M, h, d)
        vh = v.reshape(B, M, h, d)
        eye = jnp.eye(h, dtype=q.dtype)  # (h, h)
        # k_bd[b, (h1 d), (h2 m)] = kh[b, m, h2, d] * eye[h1, h2]
        k_bd = jnp.einsum("bmhd,gh->bgdhm", kh, eye).reshape(B, inner, G)
        # v_bd[b, (h1 m), (h2 d)] = vh[b, m, h1, d] * eye[h1, h2]
        v_bd = jnp.einsum("bmhd,hg->bhmgd", vh, eye).reshape(B, G, inner)

        s = jnp.einsum("bnc,bcg->bng", q, k_bd) * scale  # (B, N, G)
        # Grouped softmax over each head's M lanes: a per-(b, n) constant
        # shift is valid for every group simultaneously.
        c = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
        e = jnp.exp(s - c)
        if mask is not None:
            lane_mask = jnp.tile(mask.astype(e.dtype), (1, h))  # (B, G)
            e = e * lane_mask[:, None, :]
        group_sum = jnp.kron(jnp.eye(h, dtype=e.dtype), jnp.ones((M, M), e.dtype))
        denom = jnp.einsum("bng,gk->bnk", e, group_sum)
        w = e / jnp.maximum(denom, jnp.finfo(e.dtype).tiny)
        return jnp.einsum("bng,bgc->bnc", w, v_bd)  # (B, N, inner)


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
                )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x), context, mask, deterministic)
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
            )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x), context, mask, deterministic)
            + x
        )
        if self.gated_ff and not self.adaln:
            # Fused pre-LN GEGLU FF (Pallas kernel on the TPU sampling path).
            return FusedLNFF(
                self.dim, dropout=self.dropout, dtype=self.dtype, name="ffn"
            )(x, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
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
