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

import os
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.attention import BasicTransformerBlock
from ..nn.layers import (
    DenseParams,
    FeedForward,
    LNParams,
    ln_affine,
    timestep_embedding,
)
from ..utils.registry import NETS

def _pallas_interpret() -> bool:
    """Force the whole-trunk Pallas kernel in interpret mode off-TPU (CPU
    parity tests exercise the exact kernel program). Read per call so tests
    can toggle it."""
    return os.environ.get("DIFFFACTO_PALLAS_INTERPRET", "") == "1"


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
        # proj_in/proj_out and the pre/post norms own bare params (same trees
        # as nn.Dense / nn.LayerNorm) so the whole-network kernel can fuse
        # them; unfused paths apply the same math inline.
        pin_k, pin_b = DenseParams(in_ch, inner, name="proj_in")()
        zero_out = in_ch == self.out_channels or self.res
        kinit = nn.initializers.zeros if zero_out else nn.initializers.lecun_normal()
        pout_k, pout_b = DenseParams(
            inner, self.out_channels, kernel_init=kinit, name="proj_out"
        )()
        pre_scale, pre_bias = LNParams(inner, name="pre_norm")()
        post_scale, post_bias = LNParams(inner, name="post_norm")()

        mask = valid_id if self.mask_out_unreferenced_code else None
        block_cls = BasicTransformerBlock
        if self.use_checkpoint:
            block_cls = nn.remat(BasicTransformerBlock, static_argnums=(4,))
        blocks = [
            block_cls(
                dim=inner,
                n_heads=self.n_heads,
                d_head=self.d_head,
                dropout=self.dropout,
                context_dim=ctx.shape[-1],
                single_attn=self.single_attn,
                dtype=self.dtype,
                name=f"block_{i}",
            )
            for i in range(self.depth)
        ]

        out = self._network(
            x, ctx, mask, blocks,
            (pin_k, pin_b), (pout_k, pout_b),
            pre_scale, pre_bias, post_scale, post_bias,
            t_embed if self.add_t_to_x else None,
            deterministic,
        )
        if x_in.shape[-1] == out.shape[-1]:
            return out + x_in
        if self.res:
            return out + x_in[..., : out.shape[-1]]
        return out

    def _network(
        self, x, ctx, mask, blocks, pin, pout,
        pre_scale, pre_bias, post_scale, post_bias, t_embed, deterministic,
    ):
        """proj_in -> pre-LN -> depth blocks -> post-LN -> proj_out.

        On the TPU sampling path the whole trunk (pre-LN + all blocks +
        post-LN) runs as ONE Pallas launch (ops/fused_core.py) with every
        block's flat params stacked along a leading depth axis: the
        (B, N, inner) hidden states make a single HBM round trip per
        diffusion step. proj_in/proj_out stay in XLA — fusing them into the
        kernel was measured and regresses (180 -> 143 shapes/s) because the
        13-lane input / 6-lane output blocks force degenerate layouts.
        Training / CPU / odd shapes use the identical math through the
        per-block modules.
        """
        inner = self.n_heads * self.d_head
        pin_k, pin_b = pin
        pout_k, pout_b = pout
        cdt = self.dtype or x.dtype
        B, N = x.shape[0], x.shape[1]
        M = ctx.shape[1]
        kernel_ok = (
            self.single_attn
            and not self.use_checkpoint
            and inner % 128 == 0
            and M <= 8
            and (jax.default_backend() == "tpu" or _pallas_interpret())
        )
        # Training path: same trunk as ONE custom-VJP Pallas kernel pair
        # (ops/fused_core_train.py). In-kernel dropout needs the TPU hardware
        # PRNG, so with dropout>0 the kernel only engages on real TPUs.
        import os as _os

        train_kernel_ok = (
            kernel_ok
            and not deterministic
            and _os.environ.get("DIFFFACTO_NO_TRAIN_KERNEL", "") != "1"
            and (self.dropout == 0.0 or jax.default_backend() == "tpu")
        )
        use_stack = kernel_ok and (deterministic or train_kernel_ok)
        if use_stack:
            from ..ops.fused_core import fused_denoiser_core_call
            from ..ops.fused_core_train import fused_trunk_train_call
            from ..ops.fused_ff import pick_tile

            tile = pick_tile(N)
            if tile:
                flats = [
                    blk(x, ctx, mask, None, deterministic, export_params=True)
                    for blk in blocks
                ]

                def stk(key, dt=cdt):
                    return jnp.stack([f[key] for f in flats]).astype(dt)

                nh, dh = self.n_heads, self.d_head
                ctx_c = ctx.astype(cdt)
                depth = len(blocks)
                wk_s, wv_s = stk("wk"), stk("wv")  # (depth, cdim, inner)
                k = jnp.einsum("bmc,icd->ibmd", ctx_c, wk_s).reshape(depth, B, M, nh, dh)
                v = jnp.einsum("bmc,icd->ibmd", ctx_c, wv_s).reshape(depth, B, M, nh, dh)
                eye = jnp.eye(nh, dtype=cdt)
                # block-diagonal K/V layout, per block (see
                # nn/attention.CrossAttention._small_ctx_attention)
                k_bd = jnp.einsum("ibmhd,gh->ibgdhm", k, eye).reshape(
                    depth, B, inner, nh * M
                )
                v_bd = jnp.einsum("ibmhd,hg->ibhmgd", v, eye).reshape(
                    depth, B, nh * M, inner
                )
                lane_mask = (
                    jnp.tile(mask.astype(cdt), (1, nh))
                    if mask is not None
                    else jnp.ones((B, nh * M), cdt)
                )
                gsum = jnp.kron(eye, jnp.ones((M, M), cdt))
                # Head/tail fusion, A/B-measured per side (bench.py, r2):
                # proj_in fused INTO the kernel wins (178.1/178.6 -> 182.1/
                # 182.4 shapes/s — the raw 13-lane input block reads 5x less
                # HBM than the projected 128-lane hidden); proj_out fused
                # LOSES badly (146.4 — the narrow 6-lane OUTPUT block forces
                # a degenerate store layout), explaining the combined 180->143
                # regression first measured at commit 622b4cc. Defaults:
                # head ON (kill switch DIFFFACTO_FUSE_HEAD=0), tail OFF
                # (DIFFFACTO_FUSE_TAIL=1 to re-measure).
                fuse_head = (
                    deterministic
                    and t_embed is None
                    and _os.environ.get("DIFFFACTO_FUSE_HEAD", "1") == "1"
                )
                fuse_tail = (
                    deterministic
                    and _os.environ.get("DIFFFACTO_FUSE_TAIL", "") == "1"
                )
                if fuse_head:
                    h0 = x.astype(cdt)
                else:
                    h0 = (x.astype(cdt) @ pin_k.astype(cdt) + pin_b.astype(cdt))
                    if t_embed is not None:  # add_t_to_x: bias h0 pre-trunk
                        h0 = h0 + t_embed.astype(cdt)[:, None]
                trunk_args = (
                    h0, k_bd, v_bd, lane_mask, gsum,
                    pre_scale.astype(cdt), pre_bias.astype(cdt),
                    post_scale.astype(cdt), post_bias.astype(cdt),
                    stk("norm2_scale"), stk("norm2_bias"),
                    stk("wq"), stk("wout"), stk("bout", jnp.float32),
                    stk("ffn_ln_scale"), stk("ffn_ln_bias"),
                    stk("ffn_w1"), stk("ffn_b1", jnp.float32),
                    stk("ffn_w2"), stk("ffn_b2", jnp.float32),
                )
                if deterministic:
                    hk = fused_denoiser_core_call(
                        *trunk_args,
                        dh**-0.5, tile=tile,
                        interpret=jax.default_backend() != "tpu",
                        pin_w=pin_k.astype(cdt) if fuse_head else None,
                        pin_b=pin_b.astype(jnp.float32) if fuse_head else None,
                        pout_w=pout_k.astype(cdt) if fuse_tail else None,
                        pout_b=pout_b.astype(jnp.float32) if fuse_tail else None,
                    )
                    if fuse_tail:
                        return hk.astype(x.dtype)
                else:
                    if self.dropout > 0.0:
                        seed = jax.random.randint(
                            self.make_rng("dropout"), (1, 1), 0, 2**31 - 1,
                            dtype=jnp.int32,
                        )
                    else:
                        seed = jnp.zeros((1, 1), jnp.int32)
                    train_tile = int(
                        _os.environ.get("DIFFFACTO_TRAIN_KERNEL_TILE", "256")
                    )
                    hk = fused_trunk_train_call(
                        seed, *trunk_args,
                        scale=dh**-0.5,
                        tile=min(train_tile, tile),
                        dropout_p=float(self.dropout),
                        interpret=jax.default_backend() != "tpu",
                    )
                return (hk @ pout_k.astype(cdt) + pout_b.astype(cdt)).astype(x.dtype)

        # ---- unfused composition, identical math and parameters
        h = (x.astype(cdt) @ pin_k.astype(cdt) + pin_b.astype(cdt))
        if t_embed is not None:
            h = h + t_embed[:, None]
        h = ln_affine(h, pre_scale, pre_bias)
        for blk in blocks:
            h = blk(h, ctx, mask, None, deterministic)
        h = ln_affine(h, post_scale, post_bias)
        return (h.astype(cdt) @ pout_k.astype(cdt) + pout_b.astype(cdt)).astype(x.dtype)


@NETS.register_module()
class LDMNet(nn.Module):
    """Latent-diffusion denoiser over the K part tokens
    (attention.py:443-546): t-embedding as an extra (masked-in) token or an
    additive bias, class embedding added, blocks may cross-attend to ctx."""

    in_channels: int
    out_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    dropout: float = 0.0
    context_dim: Optional[int] = None
    n_class: int = 4
    class_cond: bool = False
    single_attn: bool = False
    mask_out_unreferenced_code: bool = True
    cond_time_as_token: bool = True
    use_checkpoint: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t, ctx=None, anchors=None, variances=None, seg_mask=None,
                 valid_id=None, deterministic: bool = True):
        """x (B, K, in_channels): the noisy part latents."""
        inner = self.n_heads * self.d_head
        B, K, _ = x.shape
        if isinstance(ctx, (list, tuple)):
            ctx = jnp.concatenate(ctx, axis=-1) if ctx else None
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        t_embed = FeedForward(
            inner, dropout=self.dropout, glu=True, dtype=self.dtype, name="time_embed"
        )(timestep_embedding(t, 256)[:, :inner] if inner <= 256 else timestep_embedding(t, inner),
          deterministic)
        mask = valid_id if self.mask_out_unreferenced_code else None
        extra = 0
        if self.cond_time_as_token:
            h = jnp.concatenate([t_embed[:, None], h], axis=1)
            extra = 1
            if mask is not None:
                mask = jnp.concatenate([jnp.ones((B, 1), mask.dtype), mask], axis=1)
        else:
            h = h + t_embed[:, None]
        if self.class_cond:
            class_emb = self.param(
                "class_emb", nn.initializers.normal(1.0), (self.n_class, inner), jnp.float32
            )
            pad = jnp.zeros((extra, inner), h.dtype)
            h = h + jnp.concatenate([pad, class_emb.astype(h.dtype)], axis=0)[None]
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_norm")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                dim=inner, n_heads=self.n_heads, d_head=self.d_head,
                dropout=self.dropout,
                context_dim=ctx.shape[-1] if ctx is not None else None,
                single_attn=self.single_attn, dtype=self.dtype, name=f"block_{i}",
            )(h, ctx, mask, None, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="post_norm")(h)
        if extra:
            h = h[:, extra:]
        return nn.Dense(
            self.out_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj_out",
        )(h)


@NETS.register_module()
class UNet(nn.Module):
    """1D attention 'UNet' denoiser (nets/unet.py:296-341): GroupNorm+SiLU
    input stack, time-embedding MLP, alternating prior-/language-conditioned
    transformer blocks with scale-shift norm, zero-init residual output."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    embed_dim: int = 128
    dropout: float = 0.0
    prior_dim: int = 512
    language_dim: int = 64
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t, ctx=None, anchors=None, variances=None, seg_mask=None,
                 valid_id=None, language_code=None, deterministic: bool = True):
        inner = self.n_heads * self.d_head
        x_in = x
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-6)(x)
        h = jax.nn.silu(h)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        emb = nn.Dense(self.embed_dim, dtype=self.dtype)(timestep_embedding(t, self.embed_dim))
        emb = nn.Dense(self.embed_dim, dtype=self.dtype)(jax.nn.silu(emb))
        prior = ctx
        if isinstance(prior, (list, tuple)):
            prior = jnp.concatenate(prior, axis=-1) if prior else None
        for i in range(self.depth):
            # scale-shift conditioning on the time embedding
            ss = nn.Dense(2 * inner, dtype=self.dtype, name=f"emb_{i}")(jax.nn.silu(emb))
            scale, shift = jnp.split(ss, 2, axis=-1)
            h = nn.LayerNorm(epsilon=1e-5, name=f"ln_{i}")(h) * (1 + scale[:, None]) + shift[:, None]
            h = BasicTransformerBlock(
                dim=inner, n_heads=self.n_heads, d_head=self.d_head,
                dropout=self.dropout,
                context_dim=prior.shape[-1] if prior is not None else None,
                single_attn=True, dtype=self.dtype, name=f"prior_block_{i}",
            )(h, prior, valid_id, None, deterministic)
            if language_code is not None:
                h = BasicTransformerBlock(
                    dim=inner, n_heads=self.n_heads, d_head=self.d_head,
                    dropout=self.dropout, context_dim=language_code.shape[-1],
                    single_attn=True, dtype=self.dtype, name=f"lang_block_{i}",
                )(h, language_code, None, None, deterministic)
        out = nn.Dense(
            self.in_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="proj_out",
        )(h)
        return out + x_in


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
class PointwiseNet2(nn.Module):
    """Concat-squash MLP with per-part context gathering
    (nets/pointwisenet2.py:10-103): selected layers re-gather per-part
    context by the anchor assignment before modulating."""

    in_channels: int = 3
    out_channels: int = 3
    context_dim: int = 256
    num_anchors: int = 4
    res: bool = True
    include_anchors: bool = False
    gather_layers: tuple = (1, 3)
    hidden: Sequence[int] = (128, 256, 512, 256, 128)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t, ctx, anchors=None, variances=None, seg_mask=None,
                 valid_id=None, deterministic: bool = True):
        """x (B, N, C); ctx (B, K, context_dim); seg_mask (B, N)."""
        if isinstance(ctx, (list, tuple)):
            ctx = jnp.concatenate(ctx, axis=-1)
        from ..models.part_encoder import gather_per_point

        tf = t.astype(jnp.float32)[:, None]
        time_emb = jnp.concatenate([tf, jnp.sin(tf), jnp.cos(tf)], axis=-1)[:, None, :]
        per_point_ctx = gather_per_point(ctx, seg_mask.astype(jnp.int32))
        cond = jnp.concatenate(
            [jnp.broadcast_to(time_emb, per_point_ctx.shape[:2] + (3,)), per_point_ctx],
            axis=-1,
        )
        h = x
        for i, f in enumerate(self.hidden):
            h = ConcatSquashDense(f, dtype=self.dtype, name=f"cs_{i}")(h, cond)
            h = jax.nn.leaky_relu(h)
        h = ConcatSquashDense(self.out_channels, dtype=self.dtype, name="cs_out")(h, cond)
        return x + h if self.res and x.shape[-1] == h.shape[-1] else h


@NETS.register_module()
class PointwiseNet(nn.Module):
    """Concat-squash MLP denoiser (nets/pointwisenet.py:9-99).

    ctx vector per shape = [latent, t-embed(sin/cos of t)] modulates each layer.
    """

    point_dim: int = 3
    context_dim: int = 256
    residual: bool = True
    hidden: Sequence[int] = (128, 256, 512, 256, 128)
    # Reference-config aliases (pointwisenet.py:64): in_channels/out_channels
    # name the point dims and ``res`` the residual flag. When given they win,
    # so reference net dicts build unchanged.
    in_channels: Optional[int] = None
    out_channels: Optional[int] = None
    res: Optional[bool] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t, ctx, anchors=None, variances=None, seg_mask=None,
                 valid_id=None, deterministic: bool = True):
        """ctx entries may be global (B, F)/(B, 1, F) — broadcast to every
        point — or per-point (B, N, F), matching the reference's two context
        layouts (pointwisenet.py:91-94)."""
        if isinstance(ctx, (list, tuple)):
            ctx = jnp.concatenate(
                [c if c.ndim == 3 else c[:, None, :] for c in ctx], axis=-1
            )
        elif ctx.ndim == 2:
            ctx = ctx[:, None, :]
        tf = t.astype(jnp.float32)[:, None]
        time_emb = jnp.concatenate([tf, jnp.sin(tf), jnp.cos(tf)], axis=-1)[:, None, :]
        cond = jnp.concatenate(
            [jnp.broadcast_to(time_emb, ctx.shape[:2] + (3,)), ctx], axis=-1
        )
        out_dim = self.out_channels if self.out_channels is not None else self.point_dim
        residual = self.res if self.res is not None else self.residual
        h = x
        for i, f in enumerate(self.hidden):
            h = ConcatSquashDense(f, dtype=self.dtype, name=f"cs_{i}")(h, cond)
            h = jax.nn.leaky_relu(h)
        h = ConcatSquashDense(out_dim, dtype=self.dtype, name="cs_out")(h, cond)
        return x + h if residual and x.shape[-1] == h.shape[-1] else h


@NETS.register_module()
class PointwiseNetLatent(nn.Module):
    """Concat-squash LATENT denoiser with per-token conditioning
    (reference nets/pointwisenet.py:9-59): each of the K part-latent tokens
    is modulated by [t-embed(3) | its prior token | the (broadcast) code],
    with ``use_part_ind`` zeroing the code for unselected parts — the
    language-editing gating used by LatentDiffusionDrift."""

    in_channels: int = 256
    out_channels: int = 256
    context_dim: int = 256
    res: bool = True
    use_part_ind: bool = False
    hidden: Sequence[int] = (128, 256, 512, 256, 128)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t, prior, code=None, part_indicator=None,
                 deterministic: bool = True):
        """x (B, K, C) noisy part latents; prior (B, K, P); code (B, F) or
        (B, K, F); part_indicator (B, K)."""
        B, K, _ = x.shape
        tf = t.astype(jnp.float32).reshape(B, 1, 1)
        time_emb = jnp.concatenate([tf, jnp.sin(tf), jnp.cos(tf)], axis=-1)
        ctx = [jnp.broadcast_to(time_emb, (B, K, 3)), prior]
        if code is not None:
            if code.ndim == 2:
                code = code[:, None]
            code = jnp.broadcast_to(code, (B, K, code.shape[-1]))
            if self.use_part_ind and part_indicator is not None:
                code = code * part_indicator[..., None]
            ctx.append(code)
        cond = jnp.concatenate(ctx, axis=-1)

        h = x
        for i, f in enumerate(self.hidden):
            h = ConcatSquashDense(f, dtype=self.dtype, name=f"cs_{i}")(h, cond)
            h = jax.nn.leaky_relu(h)
        h = ConcatSquashDense(self.out_channels, dtype=self.dtype, name="cs_out")(h, cond)
        return h + x if self.res else h
