"""Pallas TPU mega-kernel: one whole denoiser block per token tile.

Fuses LN2 -> q-projection -> small-ctx attention (block-diagonal K/V +
grouped softmax) -> output projection -> residual -> LN3 -> GEGLU FF ->
residual. The per-token activations make exactly ONE HBM round trip per
block instead of ~8 (each LN/projection/softmax/residual materializes a
(tokens, 128) tensor when left to XLA).

K/V over the tiny context (4 part tokens) are computed outside in XLA
(negligible) and passed in block-diagonal layout per batch element; the grid
is (B, N/tile) so each invocation reads its batch element's K/V.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_kernel(
    x_ref,        # (1, T, D)
    kbd_ref,      # (1, D, G)
    vbd_ref,      # (1, G, D)
    mask_ref,     # (1, 1, G)
    n2s_ref, n2b_ref,          # LN2 scale/bias (D,)
    wq_ref,                    # (D, D)
    wout_ref, bout_ref,        # (D, D), (D,)
    ffs_ref, ffb_ref,          # FF LN scale/bias (D,)
    w1_ref, b1_ref,            # (D, 2*inner), (2*inner,)
    w2_ref, b2_ref,            # (inner, D), (D,)
    gsum_ref,                  # (G, G) grouped-softmax sum matrix
    scale_ref,                 # (1, 1) attention scale in SMEM
    o_ref,        # (1, T, D)
):
    x = x_ref[0]  # (T, D)
    D = x.shape[-1]

    def ln(v, s, b):
        vf = v.astype(jnp.float32)
        mu = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.mean((vf - mu) ** 2, axis=-1, keepdims=True)
        return ((vf - mu) * jax.lax.rsqrt(var + 1e-5) * s.astype(jnp.float32)[None]
                + b.astype(jnp.float32)[None]).astype(v.dtype)

    # ---- attention over the tiny context
    h = ln(x, n2s_ref[:], n2b_ref[:])
    q = jnp.dot(h, wq_ref[:], preferred_element_type=jnp.float32).astype(x.dtype)
    s = jnp.dot(q, kbd_ref[0], preferred_element_type=jnp.float32) * scale_ref[0, 0]
    m = mask_ref[0].astype(jnp.float32)
    s = s + (m - 1.0) * 1e30  # sink masked lanes before the max-shift
    c = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - c) * m
    denom = jnp.dot(e, gsum_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)
    w = (e / jnp.maximum(denom, 1e-30)).astype(x.dtype)
    attn = jnp.dot(w, vbd_ref[0], preferred_element_type=jnp.float32).astype(x.dtype)
    o = jnp.dot(attn, wout_ref[:], preferred_element_type=jnp.float32) + bout_ref[
        :
    ].astype(jnp.float32)
    x = x + o.astype(x.dtype)

    # ---- GEGLU feed-forward with pre-LN
    h = ln(x, ffs_ref[:], ffb_ref[:])
    hg = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:].astype(
        jnp.float32
    )
    inner = hg.shape[-1] // 2
    a, g = hg[:, :inner], hg[:, inner:]
    act = (a * jax.nn.gelu(g)).astype(x.dtype)
    out = jnp.dot(act, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[
        :
    ].astype(jnp.float32)
    o_ref[0] = x + out.astype(x.dtype)


def fused_denoiser_block_call(
    x, k_bd, v_bd, lane_mask, gsum, n2_scale, n2_bias, wq, wout, bout,
    ff_scale, ff_bias, w1, b1, w2, b2, scale: float, tile: int = 1024,
    interpret: bool = False,
):
    """Launch the mega-kernel. gsum: (G, G) grouped-sum matrix
    (kron(I_heads, ones(M, M)))."""
    B, N, D = x.shape
    G = k_bd.shape[-1]
    if N % tile != 0:
        t = tile
        while t >= 128 and N % t != 0:
            t //= 2
        tile = t if t >= 128 else N
    grid = (B, max(N // tile, 1))
    two_inner = w1.shape[1]
    scale_arr = jnp.full((1, 1), scale, jnp.float32)
    return pl.pallas_call(
        _block_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, D), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, G), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, D), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda b, n: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda b, n: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda b, n: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda b, n: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda b, n: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, two_inner), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((two_inner,), lambda b, n: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((two_inner // 2, D), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda b, n: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, G), lambda b, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, n: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, D), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        interpret=interpret,
    )(
        x, k_bd, v_bd, lane_mask[:, None, :], n2_scale, n2_bias, wq, wout, bout,
        ff_scale, ff_bias, w1, b1, w2, b2, gsum, scale_arr,
    )
