"""Pallas TPU kernels: whole-trunk denoiser forward+backward for TRAINING.

``ops/fused_core.py`` fuses the denoiser trunk for the sampling path
(forward-only, deterministic). This module makes the same trunk trainable: a
custom-VJP pair of kernels (forward with optional in-kernel dropout, backward
with recompute), so the training step's denoiser fwd+bwd — measured 130 ms of
the 169 ms f32 step at batch 128 x 2048 pts (tools/tpu_train_profile.py) —
runs at the fused kernel's arithmetic intensity instead of XLA's ~20%-MFU
op-by-op schedule.

Design:

* The forward kernel computes exactly ``fused_core.py``'s trunk math (no
  head/tail), plus dropout after the attention out-projection and on the
  GEGLU activations — the two Dropout sites of the reference block
  (reference: python/difffacto/models/diffusions/nets/attention.py:190-204,
  60-94). Masks come from the TPU hardware PRNG
  (``pltpu.prng_seed``/``prng_random_bits``) seeded per
  (seed, batch, tile, block, site), so the backward kernel regenerates the
  exact masks instead of storing them.
* The backward kernel recomputes the forward per token tile (saving each
  block's input and post-attention hidden in VMEM — 2*depth (tile, D)
  tensors), then walks the blocks in reverse producing dx, d(k/v context
  projections), and every weight grad. Weight-grad accumulators live in VMEM
  across the whole sequential grid (constant output index maps, f32);
  dk_bd/dv_bd accumulate across the token-tile grid axis per batch row.
* Interpret-mode caveat: ``prng_random_bits`` is a zeros-stub under the CPU
  interpreter, so the keep-test is written as ``bits < keep_threshold``,
  which degenerates to keep-everything (scaled) rather than drop-everything.
  CPU parity tests exercise dropout_p=0 only; dropout statistics and
  fwd/bwd mask agreement are verified on real TPU by
  tools/tpu_kernel_check.py --train.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ----------------------------------------------------------------- helpers


def _ln_stats(v):
    vf = v.astype(jnp.float32)
    mu = jnp.mean(vf, axis=-1, keepdims=True)
    xc = vf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + 1e-5)
    return xc * r, r


def _ln(v, s, b, out_dtype):
    xhat, _ = _ln_stats(v)
    y = xhat * s.astype(jnp.float32)[None] + b.astype(jnp.float32)[None]
    return y.astype(out_dtype)


def _ln_bwd(v, s, dy):
    """dy f32 -> (dv f32, dscale (1,D) f32, dbias (1,D) f32)."""
    xhat, r = _ln_stats(v)
    ds = jnp.sum(dy * xhat, axis=0, keepdims=True)
    db = jnp.sum(dy, axis=0, keepdims=True)
    dxh = dy * s.astype(jnp.float32)[None]
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    return r * (dxh - m1 - xhat * m2), ds, db


_GELU_K0 = 0.7978845608028654  # sqrt(2/pi)
_GELU_K1 = 0.044715


def _gelu_prime(g):
    """d/dg of the tanh-approximate gelu (jax.nn.gelu default)."""
    u = _GELU_K0 * (g + _GELU_K1 * g * g * g)
    t = jnp.tanh(u)
    du = _GELU_K0 * (1.0 + 3.0 * _GELU_K1 * g * g)
    return 0.5 * (1.0 + t) + 0.5 * g * (1.0 - t * t) * du


def _drop_mask(seed_ref, b, n, block, site, shape, p):
    """Regenerable dropout multiplier: keep w.p. (1-p), scaled 1/(1-p).

    ``bits < keep_threshold`` so the interpreter's zeros-stub keeps all.

    Mosaic allows at most 2 seed values, so (b, n, block, site) are packed:
    distinct within one launch, and the per-call ``seed`` decorrelates
    steps."""
    pltpu.prng_seed(seed_ref[0, 0] + b * 7919, n * 64 + block * 2 + site)
    bits = pltpu.prng_random_bits(shape)
    bits = jax.lax.bitcast_convert_type(bits, jnp.uint32)
    keep_threshold = np.uint32(round((1.0 - p) * 4294967296.0))
    keep = bits < jnp.uint32(keep_threshold)
    return keep.astype(jnp.float32) / (1.0 - p)


def _attn_fwd(u, n2s, n2b, wq_i, kbd_i, vbd_i, m, gs, scale, cdt):
    """Block attention recompute. Returns (h, q, w, attn); math identical to
    ops/fused_core.py's per-block attention."""
    h = _ln(u, n2s, n2b, cdt)
    q = jnp.dot(h, wq_i, preferred_element_type=jnp.float32).astype(cdt)
    s = jnp.dot(q, kbd_i, preferred_element_type=jnp.float32) * scale
    s = s + (m - 1.0) * 1e30
    c = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - c) * m
    denom = jnp.dot(e, gs, preferred_element_type=jnp.float32)
    w = e / jnp.maximum(denom, 1e-30)
    attn = jnp.dot(w.astype(cdt), vbd_i, preferred_element_type=jnp.float32).astype(cdt)
    return h, q, w, attn


# ----------------------------------------------------------- forward kernel


def _trunk_train_fwd_kernel(depth, dropout_p, *refs):
    (x_ref, kbd_ref, vbd_ref, mask_ref, pres_ref, preb_ref, posts_ref,
     postb_ref, n2s_ref, n2b_ref, wq_ref, wout_ref, bout_ref, ffs_ref,
     ffb_ref, w1_ref, b1_ref, w2_ref, b2_ref, gsum_ref, scale_ref,
     seed_ref, o_ref) = refs
    b, n = pl.program_id(0), pl.program_id(1)
    x = x_ref[0]
    cdt = x.dtype
    scale = scale_ref[0, 0]
    m = mask_ref[0].astype(jnp.float32)
    gs = gsum_ref[:].astype(jnp.float32)

    x = _ln(x, pres_ref[:], preb_ref[:], cdt)
    for i in range(depth):
        _, _, _, attn = _attn_fwd(
            x, n2s_ref[i], n2b_ref[i], wq_ref[i], kbd_ref[i, 0],
            vbd_ref[i, 0], m, gs, scale, cdt,
        )
        o = jnp.dot(attn, wout_ref[i], preferred_element_type=jnp.float32) + \
            bout_ref[i].astype(jnp.float32)
        if dropout_p > 0.0:
            o = o * _drop_mask(seed_ref, b, n, i, 0, o.shape, dropout_p)
        x = x + o.astype(cdt)

        h2 = _ln(x, ffs_ref[i], ffb_ref[i], cdt)
        hg = jnp.dot(h2, w1_ref[i], preferred_element_type=jnp.float32) + \
            b1_ref[i].astype(jnp.float32)
        inner = hg.shape[-1] // 2
        a, g = hg[:, :inner], hg[:, inner:]
        act = a * jax.nn.gelu(g)
        if dropout_p > 0.0:
            act = act * _drop_mask(seed_ref, b, n, i, 1, act.shape, dropout_p)
        out = jnp.dot(act.astype(cdt), w2_ref[i], preferred_element_type=jnp.float32) + \
            b2_ref[i].astype(jnp.float32)
        x = x + out.astype(cdt)

    o_ref[0] = _ln(x, posts_ref[:], postb_ref[:], cdt)


# ---------------------------------------------------------- backward kernel


def _trunk_train_bwd_kernel(depth, dropout_p, *refs):
    (x_ref, dy_ref, kbd_ref, vbd_ref, mask_ref, pres_ref, preb_ref,
     posts_ref, postb_ref, n2s_ref, n2b_ref, wq_ref, wout_ref, bout_ref,
     ffs_ref, ffb_ref, w1_ref, b1_ref, w2_ref, b2_ref, gsum_ref, scale_ref,
     seed_ref,
     dx_ref, dkbd_ref, dvbd_ref, dpres_ref, dpreb_ref, dposts_ref,
     dpostb_ref, dn2s_ref, dn2b_ref, dwq_ref, dwout_ref, dbout_ref,
     dffs_ref, dffb_ref, dw1_ref, db1_ref, dw2_ref, db2_ref) = refs
    b, n = pl.program_id(0), pl.program_id(1)
    x0 = x_ref[0]
    cdt = x0.dtype
    scale = scale_ref[0, 0]
    m = mask_ref[0].astype(jnp.float32)
    gs = gsum_ref[:].astype(jnp.float32)

    # ---- forward recompute, saving block inputs / post-attn hiddens
    us, ups = [], []
    x = _ln(x0, pres_ref[:], preb_ref[:], cdt)
    for i in range(depth):
        us.append(x)
        _, _, _, attn = _attn_fwd(
            x, n2s_ref[i], n2b_ref[i], wq_ref[i], kbd_ref[i, 0],
            vbd_ref[i, 0], m, gs, scale, cdt,
        )
        o = jnp.dot(attn, wout_ref[i], preferred_element_type=jnp.float32) + \
            bout_ref[i].astype(jnp.float32)
        if dropout_p > 0.0:
            o = o * _drop_mask(seed_ref, b, n, i, 0, o.shape, dropout_p)
        x = x + o.astype(cdt)
        ups.append(x)
        h2 = _ln(x, ffs_ref[i], ffb_ref[i], cdt)
        hg = jnp.dot(h2, w1_ref[i], preferred_element_type=jnp.float32) + \
            b1_ref[i].astype(jnp.float32)
        inner = hg.shape[-1] // 2
        a, g = hg[:, :inner], hg[:, inner:]
        act = a * jax.nn.gelu(g)
        if dropout_p > 0.0:
            act = act * _drop_mask(seed_ref, b, n, i, 1, act.shape, dropout_p)
        out = jnp.dot(act.astype(cdt), w2_ref[i], preferred_element_type=jnp.float32) + \
            b2_ref[i].astype(jnp.float32)
        x = x + out.astype(cdt)

    # ---- backward walk
    d, dposts_p, dpostb_p = _ln_bwd(x, posts_ref[:], dy_ref[0].astype(jnp.float32))

    dn2s_p = [None] * depth
    dn2b_p = [None] * depth
    dwq_p = [None] * depth
    dwout_p = [None] * depth
    dbout_p = [None] * depth
    dffs_p = [None] * depth
    dffb_p = [None] * depth
    dw1_p = [None] * depth
    db1_p = [None] * depth
    dw2_p = [None] * depth
    db2_p = [None] * depth
    dkbd_p = [None] * depth
    dvbd_p = [None] * depth

    for i in reversed(range(depth)):
        u, up = us[i], ups[i]

        # ---- feed-forward backward (v = up + out(up))
        h2 = _ln(up, ffs_ref[i], ffb_ref[i], cdt)
        hg = jnp.dot(h2, w1_ref[i], preferred_element_type=jnp.float32) + \
            b1_ref[i].astype(jnp.float32)
        inner = hg.shape[-1] // 2
        a, g = hg[:, :inner], hg[:, inner:]
        gl = jax.nn.gelu(g)
        act = a * gl
        if dropout_p > 0.0:
            m2 = _drop_mask(seed_ref, b, n, i, 1, act.shape, dropout_p)
            act = act * m2
        # matmul inputs in the compute dtype (f32 accumulation): mixed
        # f32xbf16 dots would run at the f32 MXU rate and erase the bf16
        # speedup (measured: bf16 bwd == f32 bwd before this cast)
        d_c = d.astype(cdt)
        d_act = jnp.dot(d_c, w2_ref[i].T, preferred_element_type=jnp.float32)
        dw2_p[i] = jnp.dot(act.T.astype(cdt), d_c,
                           preferred_element_type=jnp.float32)
        db2_p[i] = jnp.sum(d, axis=0, keepdims=True)
        if dropout_p > 0.0:
            d_act = d_act * m2
        da = d_act * gl
        dg = d_act * a * _gelu_prime(g)
        dhg = jnp.concatenate([da, dg], axis=-1)
        dh2 = jnp.dot(dhg.astype(cdt), w1_ref[i].T,
                      preferred_element_type=jnp.float32)
        dw1_p[i] = jnp.dot(h2.T, dhg.astype(cdt),
                           preferred_element_type=jnp.float32)
        db1_p[i] = jnp.sum(dhg, axis=0, keepdims=True)
        dup_ln, dffs_p[i], dffb_p[i] = _ln_bwd(up, ffs_ref[i], dh2)
        dup = d + dup_ln

        # ---- attention backward (up = u + o(u))
        h, q, w, attn = _attn_fwd(
            u, n2s_ref[i], n2b_ref[i], wq_ref[i], kbd_ref[i, 0],
            vbd_ref[i, 0], m, gs, scale, cdt,
        )
        d_o = dup
        if dropout_p > 0.0:
            m1 = _drop_mask(seed_ref, b, n, i, 0, d_o.shape, dropout_p)
            d_o = d_o * m1
        d_attn = jnp.dot(d_o.astype(cdt), wout_ref[i].T,
                         preferred_element_type=jnp.float32)
        dwout_p[i] = jnp.dot(attn.T, d_o.astype(cdt),
                             preferred_element_type=jnp.float32)
        dbout_p[i] = jnp.sum(d_o, axis=0, keepdims=True)
        dw_soft = jnp.dot(d_attn.astype(cdt), vbd_ref[i, 0].T,
                          preferred_element_type=jnp.float32)
        dvbd_p[i] = jnp.dot(w.T.astype(cdt), d_attn.astype(cdt),
                            preferred_element_type=jnp.float32)
        t_ = jnp.dot(dw_soft * w, gs, preferred_element_type=jnp.float32)
        ds = w * (dw_soft - t_)
        dq = jnp.dot(ds.astype(cdt), kbd_ref[i, 0].T,
                     preferred_element_type=jnp.float32) * scale
        dkbd_p[i] = jnp.dot(q.T, ds.astype(cdt),
                            preferred_element_type=jnp.float32) * scale
        dh = jnp.dot(dq.astype(cdt), wq_ref[i].T,
                     preferred_element_type=jnp.float32)
        dwq_p[i] = jnp.dot(h.T, dq.astype(cdt),
                           preferred_element_type=jnp.float32)
        du_ln, dn2s_p[i], dn2b_p[i] = _ln_bwd(u, n2s_ref[i], dh)
        d = dup + du_ln

    dx0, dpres_p, dpreb_p = _ln_bwd(x0, pres_ref[:], d)
    dx_ref[0] = dx0.astype(dx_ref.dtype)

    # ---- accumulate into the grid-persistent grad buffers
    first = jnp.logical_and(b == 0, n == 0)
    first_b = n == 0

    def acc(ref, val, cond):
        @pl.when(cond)
        def _():
            ref[...] = val

        @pl.when(jnp.logical_not(cond))
        def _():
            ref[...] = ref[...] + val

    acc(dkbd_ref, jnp.stack(dkbd_p)[:, None], first_b)
    acc(dvbd_ref, jnp.stack(dvbd_p)[:, None], first_b)
    acc(dpres_ref, dpres_p, first)
    acc(dpreb_ref, dpreb_p, first)
    acc(dposts_ref, dposts_p, first)
    acc(dpostb_ref, dpostb_p, first)
    acc(dn2s_ref, jnp.concatenate(dn2s_p, axis=0), first)
    acc(dn2b_ref, jnp.concatenate(dn2b_p, axis=0), first)
    acc(dwq_ref, jnp.stack(dwq_p), first)
    acc(dwout_ref, jnp.stack(dwout_p), first)
    acc(dbout_ref, jnp.concatenate(dbout_p, axis=0), first)
    acc(dffs_ref, jnp.concatenate(dffs_p, axis=0), first)
    acc(dffb_ref, jnp.concatenate(dffb_p, axis=0), first)
    acc(dw1_ref, jnp.stack(dw1_p), first)
    acc(db1_ref, jnp.concatenate(db1_p, axis=0), first)
    acc(dw2_ref, jnp.stack(dw2_p), first)
    acc(db2_ref, jnp.concatenate(db2_p, axis=0), first)


# ------------------------------------------------------------ call wrappers


def _pick_grid_tile(N, tile):
    if N % tile != 0:
        t = tile
        while t >= 128 and N % t != 0:
            t //= 2
        tile = t if t >= 128 else N
    return tile


def _rep(shape):
    nz = len(shape)
    return pl.BlockSpec(shape, lambda b, n, _nz=nz: (0,) * _nz,
                        memory_space=pltpu.VMEM)


def _param_specs(depth, D, G, two_inner):
    return [
        pl.BlockSpec((depth, 1, D, G), lambda b, n: (0, b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((depth, 1, G, D), lambda b, n: (0, b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, G), lambda b, n: (b, 0, 0), memory_space=pltpu.VMEM),
        _rep((D,)), _rep((D,)), _rep((D,)), _rep((D,)),
        _rep((depth, D)), _rep((depth, D)),
        _rep((depth, D, D)), _rep((depth, D, D)), _rep((depth, D)),
        _rep((depth, D)), _rep((depth, D)),
        _rep((depth, D, two_inner)), _rep((depth, two_inner)),
        _rep((depth, two_inner // 2, D)), _rep((depth, D)),
        _rep((G, G)),
        pl.BlockSpec((1, 1), lambda b, n: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda b, n: (0, 0), memory_space=pltpu.SMEM),
    ]


def _trunk_fwd_call(seed, x, k_bd, v_bd, lane_mask, gsum, params,
                    scale, tile, dropout_p, interpret):
    B, N, D = x.shape
    depth, _, _, G = k_bd.shape
    two_inner = params[11].shape[-1]  # w1
    tile = _pick_grid_tile(N, tile)
    grid = (B, max(N // tile, 1))
    scale_arr = jnp.full((1, 1), scale, jnp.float32)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    in_specs = [
        pl.BlockSpec((1, tile, D), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM)
    ] + _param_specs(depth, D, G, two_inner)
    operands = [x, k_bd, v_bd, lane_mask[:, None, :], *params, gsum, scale_arr, seed_arr]
    return pl.pallas_call(
        functools.partial(_trunk_train_fwd_kernel, depth, dropout_p),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, D), lambda b, n: (b, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        interpret=interpret,
    )(*operands)


def _trunk_bwd_call(seed, x, dy, k_bd, v_bd, lane_mask, gsum, params,
                    scale, tile, dropout_p, interpret):
    B, N, D = x.shape
    depth, _, _, G = k_bd.shape
    two_inner = params[11].shape[-1]  # w1
    inner = two_inner // 2
    tile = _pick_grid_tile(N, tile)
    grid = (B, max(N // tile, 1))
    scale_arr = jnp.full((1, 1), scale, jnp.float32)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    in_specs = [
        pl.BlockSpec((1, tile, D), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, D), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
    ] + _param_specs(depth, D, G, two_inner)
    operands = [x, dy, k_bd, v_bd, lane_mask[:, None, :], *params, gsum,
                scale_arr, seed_arr]

    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((B, N, D), x.dtype),            # dx
        jax.ShapeDtypeStruct((depth, B, D, G), f32),         # dk_bd
        jax.ShapeDtypeStruct((depth, B, G, D), f32),         # dv_bd
        jax.ShapeDtypeStruct((1, D), f32),                   # dpre_s
        jax.ShapeDtypeStruct((1, D), f32),                   # dpre_b
        jax.ShapeDtypeStruct((1, D), f32),                   # dpost_s
        jax.ShapeDtypeStruct((1, D), f32),                   # dpost_b
        jax.ShapeDtypeStruct((depth, D), f32),               # dn2s
        jax.ShapeDtypeStruct((depth, D), f32),               # dn2b
        jax.ShapeDtypeStruct((depth, D, D), f32),            # dwq
        jax.ShapeDtypeStruct((depth, D, D), f32),            # dwout
        jax.ShapeDtypeStruct((depth, D), f32),               # dbout
        jax.ShapeDtypeStruct((depth, D), f32),               # dffs
        jax.ShapeDtypeStruct((depth, D), f32),               # dffb
        jax.ShapeDtypeStruct((depth, D, two_inner), f32),    # dw1
        jax.ShapeDtypeStruct((depth, two_inner), f32),       # db1
        jax.ShapeDtypeStruct((depth, inner, D), f32),        # dw2
        jax.ShapeDtypeStruct((depth, D), f32),               # db2
    ]
    out_specs = [
        pl.BlockSpec((1, tile, D), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((depth, 1, D, G), lambda b, n: (0, b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((depth, 1, G, D), lambda b, n: (0, b, 0, 0), memory_space=pltpu.VMEM),
        _rep((1, D)), _rep((1, D)), _rep((1, D)), _rep((1, D)),
        _rep((depth, D)), _rep((depth, D)),
        _rep((depth, D, D)), _rep((depth, D, D)), _rep((depth, D)),
        _rep((depth, D)), _rep((depth, D)),
        _rep((depth, D, two_inner)), _rep((depth, two_inner)),
        _rep((depth, inner, D)), _rep((depth, D)),
    ]
    return pl.pallas_call(
        functools.partial(_trunk_train_bwd_kernel, depth, dropout_p),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)


# --------------------------------------------------------------- custom vjp

@functools.lru_cache(maxsize=None)
def _trunk_vjp(depth, scale, tile, dropout_p, interpret):
    @jax.custom_vjp
    def f(seed, x, k_bd, v_bd, lane_mask, gsum, pre_s, pre_b, post_s, post_b,
          n2s, n2b, wq, wout, bout, ffs, ffb, w1, b1, w2, b2):
        params = (pre_s, pre_b, post_s, post_b, n2s, n2b, wq, wout, bout,
                  ffs, ffb, w1, b1, w2, b2)
        return _trunk_fwd_call(seed, x, k_bd, v_bd, lane_mask, gsum, params,
                               scale, tile, dropout_p, interpret)

    def f_fwd(*args):
        return f(*args), args

    def f_bwd(res, dy):
        (seed, x, k_bd, v_bd, lane_mask, gsum, *flat) = res
        params = tuple(flat)
        (dx, dkbd, dvbd, dpre_s, dpre_b, dpost_s, dpost_b, dn2s, dn2b, dwq,
         dwout, dbout, dffs, dffb, dw1, db1, dw2, db2) = _trunk_bwd_call(
            seed, x, dy, k_bd, v_bd, lane_mask, gsum, params,
            scale, tile, dropout_p, interpret,
        )
        pgrads = (dpre_s[0], dpre_b[0], dpost_s[0], dpost_b[0], dn2s, dn2b,
                  dwq, dwout, dbout, dffs, dffb, dw1, db1, dw2, db2)
        return (
            np.zeros(np.shape(seed), jax.dtypes.float0),
            dx.astype(x.dtype),
            dkbd.astype(k_bd.dtype),
            dvbd.astype(v_bd.dtype),
            jnp.zeros_like(lane_mask),
            jnp.zeros_like(gsum),
        ) + tuple(g.astype(p.dtype) for g, p in zip(pgrads, params))

    f.defvjp(f_fwd, f_bwd)
    return f


def fused_trunk_train_call(
    seed, x, k_bd, v_bd, lane_mask, gsum,
    pre_scale, pre_bias, post_scale, post_bias,
    n2_scale, n2_bias, wq, wout, bout,
    ff_scale, ff_bias, w1, b1, w2, b2,
    scale: float, tile: int = 256, dropout_p: float = 0.0,
    interpret: bool = False,
):
    """Differentiable whole-trunk denoiser (training path).

    Same operand layout as ops/fused_core.py's ``fused_denoiser_core_call``
    (no head/tail), plus ``seed`` (int32, any shape; folded into the dropout
    PRNG) and ``dropout_p``. Returns (B, N, D); gradients flow to x, k_bd,
    v_bd and all parameters via the Pallas backward kernel.
    """
    depth = k_bd.shape[0]
    f = _trunk_vjp(depth, float(scale), int(tile), float(dropout_p),
                   bool(interpret))
    return f(seed, x, k_bd, v_bd, lane_mask, gsum, pre_scale, pre_bias,
             post_scale, post_bias, n2_scale, n2_bias, wq, wout, bout,
             ff_scale, ff_bias, w1, b1, w2, b2)
