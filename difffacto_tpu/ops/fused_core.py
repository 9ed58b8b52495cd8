"""Pallas TPU kernel: the ENTIRE denoiser in one launch per token tile.

Extends ops/fused_block.py (one transformer block per launch) to the whole
network: [optional proj_in] -> pre-LN -> depth x [LN2 -> q-proj -> small-ctx
attention -> out-proj -> residual -> LN -> GEGLU FF -> residual] -> post-LN
-> [optional proj_out], with every block's parameters stacked on a leading
``depth`` axis and resident in VMEM. With head+tail fused the per-step HBM
traffic is ONE read of the 13-channel denoiser input and ONE write of the
3/6-channel output — the (tokens, 128) hidden states never touch HBM.

Per-block math is byte-identical to ops/fused_block.py (which remains in use
for standalone blocks, e.g. the part aligner). K/V over the tiny context
(4 part tokens, reference attention.py:309-440 uses single_attn cross
attention only) are computed outside in XLA and passed in block-diagonal
layout stacked per block.

VMEM budget at D=128, inner=512, depth=5, tile=1024: stacked weights ~2.5 MB
+ one (tile, 2*inner) f32 GEGLU transient ~4 MB + in/out tiles — comfortably
under the ~16 MB/core limit; ``tile`` can drop to 512 if a wider model needs
headroom.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _core_kernel(
    depth: int,
    has_head: bool,
    has_tail: bool,
    *refs,
):
    it = iter(refs)
    x_ref = next(it)            # (1, T, IN) raw input or (1, T, D) hidden
    if has_head:
        pin_w_ref = next(it)    # (IN, D)
        pin_b_ref = next(it)    # (D,)
    kbd_ref = next(it)          # (depth, 1, D, G)
    vbd_ref = next(it)          # (depth, 1, G, D)
    mask_ref = next(it)         # (1, 1, G)
    pres_ref, preb_ref = next(it), next(it)      # pre-LN scale/bias (D,)
    posts_ref, postb_ref = next(it), next(it)    # post-LN scale/bias (D,)
    n2s_ref, n2b_ref = next(it), next(it)        # (depth, D)
    wq_ref = next(it)                            # (depth, D, D)
    wout_ref, bout_ref = next(it), next(it)      # (depth, D, D), (depth, D)
    ffs_ref, ffb_ref = next(it), next(it)        # (depth, D)
    w1_ref, b1_ref = next(it), next(it)          # (depth, D, 2i), (depth, 2i)
    w2_ref, b2_ref = next(it), next(it)          # (depth, i, D), (depth, D)
    if has_tail:
        pout_w_ref = next(it)   # (D, OUT)
        pout_b_ref = next(it)   # (OUT,)
    gsum_ref = next(it)         # (G, G)
    scale_ref = next(it)        # (1, 1) SMEM
    o_ref = next(it)            # output

    x = x_ref[0]

    def ln(v, s, b):
        vf = v.astype(jnp.float32)
        mu = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.mean((vf - mu) ** 2, axis=-1, keepdims=True)
        return ((vf - mu) * jax.lax.rsqrt(var + 1e-5) * s.astype(jnp.float32)[None]
                + b.astype(jnp.float32)[None]).astype(v.dtype)

    if has_head:
        x = (
            jnp.dot(x, pin_w_ref[:], preferred_element_type=jnp.float32)
            + pin_b_ref[:].astype(jnp.float32)
        ).astype(x.dtype)

    x = ln(x, pres_ref[:], preb_ref[:])

    for i in range(depth):  # static unroll; per-block math == fused_block.py
        # ---- attention over the tiny context
        h = ln(x, n2s_ref[i], n2b_ref[i])
        q = jnp.dot(h, wq_ref[i], preferred_element_type=jnp.float32).astype(x.dtype)
        s = jnp.dot(q, kbd_ref[i, 0], preferred_element_type=jnp.float32) * scale_ref[0, 0]
        m = mask_ref[0].astype(jnp.float32)
        s = s + (m - 1.0) * 1e30  # sink masked lanes before the max-shift
        c = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - c) * m
        denom = jnp.dot(e, gsum_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
        w = (e / jnp.maximum(denom, 1e-30)).astype(x.dtype)
        attn = jnp.dot(w, vbd_ref[i, 0], preferred_element_type=jnp.float32).astype(x.dtype)
        o = jnp.dot(attn, wout_ref[i], preferred_element_type=jnp.float32) + bout_ref[
            i
        ].astype(jnp.float32)
        x = x + o.astype(x.dtype)

        # ---- GEGLU feed-forward with pre-LN
        h = ln(x, ffs_ref[i], ffb_ref[i])
        hg = jnp.dot(h, w1_ref[i], preferred_element_type=jnp.float32) + b1_ref[
            i
        ].astype(jnp.float32)
        inner = hg.shape[-1] // 2
        a, g = hg[:, :inner], hg[:, inner:]
        act = (a * jax.nn.gelu(g)).astype(x.dtype)
        out = jnp.dot(act, w2_ref[i], preferred_element_type=jnp.float32) + b2_ref[
            i
        ].astype(jnp.float32)
        x = x + out.astype(x.dtype)

    x = ln(x, posts_ref[:], postb_ref[:])
    if has_tail:
        x = (
            jnp.dot(x, pout_w_ref[:], preferred_element_type=jnp.float32)
            + pout_b_ref[:].astype(jnp.float32)
        ).astype(x.dtype)
    o_ref[0] = x


def fused_denoiser_core_call(
    x, k_bd, v_bd, lane_mask, gsum,
    pre_scale, pre_bias, post_scale, post_bias,
    n2_scale, n2_bias, wq, wout, bout,
    ff_scale, ff_bias, w1, b1, w2, b2,
    scale: float, tile: int = 1024, interpret: bool = False,
    pin_w=None, pin_b=None, pout_w=None, pout_b=None,
):
    """Launch the whole-network kernel.

    x (B, N, D) hidden — or (B, N, IN) raw denoiser input when ``pin_w`` is
    given (proj_in fused). k_bd (depth, B, D, G); v_bd (depth, B, G, D);
    lane_mask (B, G); gsum (G, G) = kron(I_heads, ones(M, M)); pre/post_* (D,);
    per-block params stacked on a leading depth axis; ``pout_w/pout_b`` fuse
    proj_out so the kernel writes (B, N, OUT) directly.
    """
    B, N = x.shape[:2]
    depth, _, D, G = k_bd.shape
    has_head = pin_w is not None
    has_tail = pout_w is not None
    if N % tile != 0:
        t = tile
        while t >= 128 and N % t != 0:
            t //= 2
        tile = t if t >= 128 else N
    grid = (B, max(N // tile, 1))
    two_inner = w1.shape[-1]
    scale_arr = jnp.full((1, 1), scale, jnp.float32)

    def rep(shape):  # replicated (grid-invariant) operand
        nz = len(shape)
        return pl.BlockSpec(shape, lambda b, n, _nz=nz: (0,) * _nz, memory_space=pltpu.VMEM)

    in_ch = x.shape[-1]
    out_ch = pout_w.shape[-1] if has_tail else D
    operands = [x]
    in_specs = [
        pl.BlockSpec((1, tile, in_ch), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM)
    ]
    if has_head:
        operands += [pin_w, pin_b]
        in_specs += [rep((in_ch, D)), rep((D,))]
    operands += [
        x_ for x_ in (
            k_bd, v_bd, lane_mask[:, None, :],
            pre_scale, pre_bias, post_scale, post_bias,
            n2_scale, n2_bias, wq, wout, bout,
            ff_scale, ff_bias, w1, b1, w2, b2,
        )
    ]
    in_specs += [
        pl.BlockSpec((depth, 1, D, G), lambda b, n: (0, b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((depth, 1, G, D), lambda b, n: (0, b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, G), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        rep((D,)), rep((D,)), rep((D,)), rep((D,)),
        rep((depth, D)), rep((depth, D)),
        rep((depth, D, D)),
        rep((depth, D, D)), rep((depth, D)),
        rep((depth, D)), rep((depth, D)),
        rep((depth, D, two_inner)), rep((depth, two_inner)),
        rep((depth, two_inner // 2, D)), rep((depth, D)),
    ]
    if has_tail:
        operands += [pout_w, pout_b]
        in_specs += [rep((D, out_ch)), rep((out_ch,))]
    operands += [gsum, scale_arr]
    in_specs += [
        rep((G, G)),
        pl.BlockSpec((1, 1), lambda b, n: (0, 0), memory_space=pltpu.SMEM),
    ]

    return pl.pallas_call(
        functools.partial(_core_kernel, depth, has_head, has_tail),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile, out_ch), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, out_ch), x.dtype),
        interpret=interpret,
    )(*operands)
