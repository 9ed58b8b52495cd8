"""TPU-side parity + micro-bench for the fused denoiser block kernel.

Compares ops/fused_block.fused_denoiser_block_call against the identical
unfused XLA math (same layout as nn/attention.BasicTransformerBlock's
_fused_layout fallback path) on random bf16 inputs, then times the kernel.

Run on the real TPU:  python tools/tpu_kernel_check.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from difffacto_tpu.ops.fused_block import fused_denoiser_block_call

B, N, D, H, M = 128, 2048, 128, 8, 4
DH = D // H
CDIM = 522


def main():
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 16)
    cdt = jnp.bfloat16
    x = jax.random.normal(ks[0], (B, N, D), cdt)
    ctx = jax.random.normal(ks[1], (B, M, CDIM), cdt)
    wq = jax.random.normal(ks[2], (D, D), jnp.float32) * 0.05
    wk = jax.random.normal(ks[3], (CDIM, D), jnp.float32) * 0.05
    wv = jax.random.normal(ks[4], (CDIM, D), jnp.float32) * 0.05
    wout = jax.random.normal(ks[5], (D, D), jnp.float32) * 0.05
    bout = jax.random.normal(ks[6], (D,), jnp.float32) * 0.1
    n2s = 1.0 + 0.1 * jax.random.normal(ks[7], (D,), jnp.float32)
    n2b = 0.1 * jax.random.normal(ks[8], (D,), jnp.float32)
    ffs = 1.0 + 0.1 * jax.random.normal(ks[9], (D,), jnp.float32)
    ffb = 0.1 * jax.random.normal(ks[10], (D,), jnp.float32)
    inner = 4 * D
    w1 = jax.random.normal(ks[11], (D, 2 * inner), jnp.float32) * 0.05
    b1 = 0.1 * jax.random.normal(ks[12], (2 * inner,), jnp.float32)
    w2 = jax.random.normal(ks[13], (inner, D), jnp.float32) * 0.05
    b2 = 0.1 * jax.random.normal(ks[14], (D,), jnp.float32)
    mask = jnp.ones((B, M), cdt)
    scale = DH**-0.5

    @jax.jit
    def fused(x):
        k = (ctx @ wk.astype(cdt)).reshape(B, M, H, DH)
        v = (ctx @ wv.astype(cdt)).reshape(B, M, H, DH)
        eye = jnp.eye(H, dtype=cdt)
        k_bd = jnp.einsum("bmhd,gh->bgdhm", k, eye).reshape(B, D, H * M)
        v_bd = jnp.einsum("bmhd,hg->bhmgd", v, eye).reshape(B, H * M, D)
        lane_mask = jnp.tile(mask, (1, H))
        gsum = jnp.kron(jnp.eye(H, dtype=cdt), jnp.ones((M, M), cdt))
        return fused_denoiser_block_call(
            x, k_bd, v_bd, lane_mask, gsum,
            n2s.astype(cdt), n2b.astype(cdt), wq.astype(cdt),
            wout.astype(cdt), bout, ffs.astype(cdt), ffb.astype(cdt),
            w1.astype(cdt), b1, w2.astype(cdt), b2, scale,
        )

    @jax.jit
    def unfused(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        hq = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * n2s + n2b).astype(cdt)
        q = (hq @ wq.astype(cdt)).reshape(B, N, H, DH)
        k = (ctx @ wk.astype(cdt)).reshape(B, M, H, DH)
        v = (ctx @ wv.astype(cdt)).reshape(B, M, H, DH)
        sim = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * scale
        attn = jax.nn.softmax(sim, axis=-1).astype(cdt)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        out = out @ wout.astype(cdt) + bout.astype(cdt)
        x = x + out.astype(x.dtype)
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        hf = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * ffs + ffb).astype(cdt)
        hg = hf @ w1.astype(cdt) + b1.astype(cdt)
        a, g = jnp.split(hg, 2, axis=-1)
        act = a * jax.nn.gelu(g)
        out = act @ w2.astype(cdt) + b2.astype(cdt)
        return x + out.astype(x.dtype)

    yf = fused(x).block_until_ready()
    yu = unfused(x).block_until_ready()
    err = jnp.max(jnp.abs(yf.astype(jnp.float32) - yu.astype(jnp.float32)))
    ref = jnp.max(jnp.abs(yu.astype(jnp.float32)))
    print(f"max_abs_err={float(err):.5f}  max_ref={float(ref):.3f}  "
          f"rel={float(err / ref):.5f}")

    for name, fn in [("fused", fused), ("unfused", unfused)]:
        fn(x).block_until_ready()
        t0 = time.perf_counter()
        iters = 50
        for _ in range(iters):
            y = fn(x)
        y.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        # FF: 2*D*2i + 2*i*D = 6*D*inner MAC/token; attn: ~2*D*D (q,out) + D*HM*2
        macs = B * N * (6 * D * inner + 2 * D * D + 2 * D * H * M)
        print(f"{name}: {dt * 1e3:.3f} ms/call  {2 * macs / dt / 1e12:.2f} TFLOP/s")


if __name__ == "__main__":
    main()
