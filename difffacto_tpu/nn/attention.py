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
        if mask is not None:
            # Sink masked lanes BEFORE the max-shift so an absent part token
            # with a large score cannot drag the shift and flush the valid
            # lanes' exp() to zero.
            lane_mask = jnp.tile(mask.astype(s.dtype), (1, h))  # (B, G)
            s = s + (lane_mask[:, None, :] - 1.0) * jnp.asarray(1e30, s.dtype)
        # Grouped softmax over each head's M lanes: a per-(b, n) constant
        # shift is valid for every group simultaneously.
        c = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
        e = jnp.exp(s - c)
        if mask is not None:
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
    def __call__(
        self,
        x,
        context=None,
        mask=None,
        y=None,
        deterministic: bool = True,
        export_params: bool = False,
    ):
        inner = self.n_heads * self.d_head
        if (
            self.single_attn
            and self.gated_ff
            and not self.adaln
            and inner == self.dim
        ):
            return self._fused_layout(x, context, mask, deterministic, export_params)
        assert not export_params, "export_params requires the fused flat layout"
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

    # ------------------------------------------------------- fused layout
    def _fused_layout(self, x, context, mask, deterministic, export_params=False):
        """Single-attn + GEGLU block with FLAT parameters so the TPU sampling
        path can run the whole block as ONE Pallas kernel
        (ops/fused_block.py). Training/CPU compute the identical math in XLA
        from the same parameters."""
        D = self.dim
        h_, dh = self.n_heads, self.d_head
        cdim = context.shape[-1] if context is not None else D
        ki = nn.initializers.lecun_normal()
        norm2_scale = self.param("norm2_scale", nn.initializers.ones, (D,), jnp.float32)
        norm2_bias = self.param("norm2_bias", nn.initializers.zeros, (D,), jnp.float32)
        wq = self.param("wq", ki, (D, D), jnp.float32)
        wk = self.param("wk", ki, (cdim, D), jnp.float32)
        wv = self.param("wv", ki, (cdim, D), jnp.float32)
        wout = self.param("wout", ki, (D, D), jnp.float32)
        bout = self.param("bout", nn.initializers.zeros, (D,), jnp.float32)
        inner_ff = D * 4
        ffn_ln_scale = self.param("ffn_ln_scale", nn.initializers.ones, (D,), jnp.float32)
        ffn_ln_bias = self.param("ffn_ln_bias", nn.initializers.zeros, (D,), jnp.float32)
        ffn_w1 = self.param("ffn_w1", ki, (D, 2 * inner_ff), jnp.float32)
        ffn_b1 = self.param("ffn_b1", nn.initializers.zeros, (2 * inner_ff,), jnp.float32)
        ffn_w2 = self.param("ffn_w2", ki, (inner_ff, D), jnp.float32)
        ffn_b2 = self.param("ffn_b2", nn.initializers.zeros, (D,), jnp.float32)

        if export_params:
            # Hand the flat params to the caller (TransformerNet) so it can
            # stack all blocks into ONE whole-trunk kernel launch
            # (ops/fused_core.py). Declaration above keeps the param tree
            # identical to the computing paths.
            return {
                "norm2_scale": norm2_scale, "norm2_bias": norm2_bias,
                "wq": wq, "wk": wk, "wv": wv, "wout": wout, "bout": bout,
                "ffn_ln_scale": ffn_ln_scale, "ffn_ln_bias": ffn_ln_bias,
                "ffn_w1": ffn_w1, "ffn_b1": ffn_b1,
                "ffn_w2": ffn_w2, "ffn_b2": ffn_b2,
            }

        cdt = self.dtype or x.dtype
        scale = dh**-0.5
        B, N = x.shape[0], x.shape[1]
        M = context.shape[1] if context is not None else N

        import os

        interp = (
            jax.default_backend() != "tpu"
            and os.environ.get("DIFFFACTO_PALLAS_INTERPRET", "") == "1"
        )
        use_kernel = (
            deterministic
            and context is not None
            and M <= 8
            and D % 128 == 0
            and (jax.default_backend() == "tpu" or interp)
        )
        if use_kernel:
            from ..ops.fused_block import fused_denoiser_block_call
            from ..ops.fused_ff import pick_tile

            tile = pick_tile(N)
            if tile:
                ctx_c = context.astype(cdt)
                k = (ctx_c @ wk.astype(cdt)).reshape(B, M, h_, dh)
                v = (ctx_c @ wv.astype(cdt)).reshape(B, M, h_, dh)
                eye = jnp.eye(h_, dtype=cdt)
                k_bd = jnp.einsum("bmhd,gh->bgdhm", k, eye).reshape(B, D, h_ * M)
                v_bd = jnp.einsum("bmhd,hg->bhmgd", v, eye).reshape(B, h_ * M, D)
                lane_mask = (
                    jnp.tile(mask.astype(cdt), (1, h_))
                    if mask is not None
                    else jnp.ones((B, h_ * M), cdt)
                )
                gsum = jnp.kron(jnp.eye(h_, dtype=cdt), jnp.ones((M, M), cdt))
                return fused_denoiser_block_call(
                    x.astype(cdt), k_bd, v_bd, lane_mask, gsum,
                    norm2_scale.astype(cdt), norm2_bias.astype(cdt),
                    wq.astype(cdt), wout.astype(cdt), bout,
                    ffn_ln_scale.astype(cdt), ffn_ln_bias.astype(cdt),
                    ffn_w1.astype(cdt), ffn_b1,
                    ffn_w2.astype(cdt), ffn_b2,
                    scale, tile=tile, interpret=interp,
                ).astype(x.dtype)

        # ---- unfused path, identical math and parameters
        # LN statistics in f32 even when cdt is bf16 — or wider if the input
        # already is (f64 under the x64 train-dynamics goldens; promote_types
        # keeps production f32/bf16 behavior bit-identical).
        ln_dt = jnp.promote_types(jnp.float32, x.dtype)
        xf = x.astype(ln_dt)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        hq = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * norm2_scale + norm2_bias).astype(cdt)
        kv_src = context.astype(cdt) if context is not None else hq
        q = (hq @ wq.astype(cdt)).reshape(B, N, h_, dh)
        k = (kv_src @ wk.astype(cdt)).reshape(B, M, h_, dh)
        v = (kv_src @ wv.astype(cdt)).reshape(B, M, h_, dh)
        sim = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        if mask is not None:
            sim = jnp.where(mask[:, None, None, :].astype(bool), sim, jnp.finfo(sim.dtype).min)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        out = out @ wout.astype(cdt) + bout.astype(cdt)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        x = x + out.astype(x.dtype)

        # GEGLU feed-forward, same params as the kernel path
        xf = x.astype(ln_dt)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        hf = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * ffn_ln_scale + ffn_ln_bias).astype(cdt)
        hg = hf @ ffn_w1.astype(cdt) + ffn_b1.astype(cdt)
        a, g = jnp.split(hg, 2, axis=-1)
        act = a * jax.nn.gelu(g)
        act = nn.Dropout(self.dropout)(act, deterministic=deterministic)
        out = act @ ffn_w2.astype(cdt) + ffn_b2.astype(cdt)
        return x + out.astype(x.dtype)
