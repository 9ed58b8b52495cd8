"""TPU-side parity + micro-bench for the fused denoiser block kernel.

Compares ops/fused_block.fused_denoiser_block_call against the identical
unfused XLA math (same layout as nn/attention.BasicTransformerBlock's
_fused_layout fallback path) on random bf16 inputs, then times the kernel.

Run on the real TPU:  python tools/tpu_kernel_check.py

``--train`` instead validates the TRAINING trunk kernel pair
(ops/fused_core_train.py) with in-kernel dropout, which the CPU interpreter
cannot exercise (prng_random_bits is a zeros-stub there):
  * same seed -> bit-identical output; different seed -> different output;
  * mean over many seeds approaches the p=0 output (E[dropout(x)] = x);
  * the masks are EXPORTED via a small Pallas kernel and the whole trunk is
    rebuilt in plain XLA with those masks: forward values and every gradient
    (params, x) must match the custom-VJP kernels analytically — proving the
    backward kernel regenerates exactly the forward's masks. (Directional
    finite differences are useless here: FD through the tunnel is noisy and
    repeated same-program dispatches get content-cached.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from difffacto_tpu.utils import install_tool_watchdog

install_tool_watchdog()  # tunnel hangs must not outlive the tool (VERDICT r2)

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


def train_check():
    import numpy as np

    from difffacto_tpu.ops.fused_core_train import fused_trunk_train_call

    depth, Bt, Nt, Dt, Ht, Mt = 2, 4, 512, 128, 8, 4
    dh = Dt // Ht
    G = Ht * Mt
    inner = 4 * Dt
    p = 0.2
    rng = np.random.RandomState(3)

    def f32(*shape, s=0.05):
        return jnp.asarray(rng.randn(*shape) * s, jnp.float32)

    x = f32(Bt, Nt, Dt, s=1.0)
    k_bd_src = f32(depth, Bt, Mt, Ht, dh, s=0.3)
    v_bd_src = f32(depth, Bt, Mt, Ht, dh, s=0.3)
    eye = jnp.eye(Ht, dtype=jnp.float32)
    k_bd = jnp.einsum("ibmhd,gh->ibgdhm", k_bd_src, eye).reshape(depth, Bt, Dt, G)
    v_bd = jnp.einsum("ibmhd,hg->ibhmgd", v_bd_src, eye).reshape(depth, Bt, G, Dt)
    lane_mask = jnp.ones((Bt, G), jnp.float32)
    gsum = jnp.kron(eye, jnp.ones((Mt, Mt), jnp.float32))
    params = dict(
        pre_scale=1.0 + f32(Dt), pre_bias=f32(Dt),
        post_scale=1.0 + f32(Dt), post_bias=f32(Dt),
        n2_scale=1.0 + f32(depth, Dt), n2_bias=f32(depth, Dt),
        wq=f32(depth, Dt, Dt), wout=f32(depth, Dt, Dt), bout=f32(depth, Dt),
        ff_scale=1.0 + f32(depth, Dt), ff_bias=f32(depth, Dt),
        w1=f32(depth, Dt, 2 * inner), b1=f32(depth, 2 * inner),
        w2=f32(depth, inner, Dt), b2=f32(depth, Dt),
    )
    cot = f32(Bt, Nt, Dt, s=1.0)
    order = list(params)

    def run(seed, w1, xx, pp=p):
        pr = dict(params)
        pr["w1"] = w1
        return fused_trunk_train_call(
            jnp.full((1, 1), seed, jnp.int32), xx, k_bd, v_bd, lane_mask,
            gsum, *[pr[k] for k in order], scale=dh**-0.5, tile=256,
            dropout_p=pp,
        )

    run_j = jax.jit(run, static_argnames=("pp",))
    y1 = run_j(7, params["w1"], x)
    y2 = run_j(7, params["w1"], x)
    y3 = run_j(8, params["w1"], x)
    print("same-seed identical:", bool(jnp.all(y1 == y2)),
          " diff-seed differs:", bool(jnp.any(y1 != y3)))

    y0 = run_j(0, params["w1"], x, pp=0.0)
    acc = jnp.zeros_like(y0)
    S = 64
    for s in range(S):
        acc = acc + run_j(1000 + s, params["w1"], x)
    mean_err = float(jnp.abs(acc / S - y0).mean() / jnp.abs(y0).mean())
    print(f"mean-over-{S}-seeds vs p=0 rel err: {mean_err:.4f} (expect ~0.1)")

    # ---- definitive fwd/bwd mask-agreement check: export the in-kernel
    # masks with a tiny Pallas kernel, rebuild the trunk in plain XLA with
    # those masks, and compare values AND every gradient analytically.
    # (Directional finite differences through the tunnel are too noisy and
    # repeated same-program dispatches get content-cached — see CLAUDE.md.)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from difffacto_tpu.ops.fused_core_train import _drop_mask

    tile = 256

    def mask_export_kernel(seed_ref, m1_ref, m2_ref):
        b, n = pl.program_id(0), pl.program_id(1)
        for i in range(depth):
            m1_ref[i, 0] = _drop_mask(seed_ref, b, n, i, 0, (tile, Dt), p)
            m2_ref[i, 0] = _drop_mask(seed_ref, b, n, i, 1, (tile, inner), p)

    m1, m2 = pl.pallas_call(
        mask_export_kernel,
        grid=(Bt, Nt // tile),
        in_specs=[pl.BlockSpec((1, 1), lambda b, n: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec((depth, 1, tile, Dt), lambda b, n: (0, b, n, 0)),
            pl.BlockSpec((depth, 1, tile, inner), lambda b, n: (0, b, n, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((depth, Bt, Nt, Dt), jnp.float32),
            jax.ShapeDtypeStruct((depth, Bt, Nt, inner), jnp.float32),
        ],
    )(jnp.full((1, 1), 7, jnp.int32))
    drop_frac = float((np.asarray(m1) == 0).mean())
    print(f"exported mask drop fraction: {drop_frac:.4f} (expect ~{p})")

    def ln_f(v, s, bb):
        mu = v.mean(-1, keepdims=True)
        var = ((v - mu) ** 2).mean(-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + 1e-5) * s + bb

    def ref_trunk(xx, pr):
        h = ln_f(xx, pr["pre_scale"], pr["pre_bias"])
        for i in range(depth):
            hq = ln_f(h, pr["n2_scale"][i], pr["n2_bias"][i])
            q = hq @ pr["wq"][i]
            s = jnp.einsum("bnd,bdg->bng", q, k_bd[i]) * (dh**-0.5)
            c = jax.lax.stop_gradient(jnp.max(s, -1, keepdims=True))
            e = jnp.exp(s - c)
            den = jnp.einsum("bng,gk->bnk", e, gsum)
            w = e / jnp.maximum(den, 1e-30)
            attn = jnp.einsum("bng,bgd->bnd", w, v_bd[i])
            o = (attn @ pr["wout"][i] + pr["bout"][i]) * m1[i]
            h = h + o
            h2 = ln_f(h, pr["ff_scale"][i], pr["ff_bias"][i])
            hg = h2 @ pr["w1"][i] + pr["b1"][i]
            a, g = jnp.split(hg, 2, axis=-1)
            act = a * jax.nn.gelu(g) * m2[i]
            h = h + act @ pr["w2"][i] + pr["b2"][i]
        return ln_f(h, pr["post_scale"], pr["post_bias"])

    @jax.jit
    def both_grads(pr, xx):
        def loss_k(pr_, xx_):
            y = fused_trunk_train_call(
                jnp.full((1, 1), 7, jnp.int32), xx_, k_bd, v_bd, lane_mask,
                gsum, *[pr_[k] for k in order], scale=dh**-0.5, tile=tile,
                dropout_p=p,
            )
            return jnp.sum(y * cot), y

        def loss_r(pr_, xx_):
            y = ref_trunk(xx_, pr_)
            return jnp.sum(y * cot), y

        (_, yk), gk = jax.value_and_grad(loss_k, argnums=(0, 1), has_aux=True)(pr, xx)
        (_, yr), gr = jax.value_and_grad(loss_r, argnums=(0, 1), has_aux=True)(pr, xx)
        return yk, yr, gk, gr

    pr = dict(params)
    yk, yr, (gpk, gxk), (gpr, gxr) = both_grads(pr, x)
    yerr = float(jnp.abs(yk - yr).max())
    # the exported masks are already scaled by 1/(1-p) inside _drop_mask
    print(f"fwd kernel-vs-XLA(masked) max abs err: {yerr:.5f} "
          f"(|y|max={float(jnp.abs(yr).max()):.2f})")
    gx_err = float(jnp.abs(gxk - gxr).max() / (jnp.abs(gxr).max() + 1e-9))
    print(f"dx rel err: {gx_err:.6f}")
    worst = 0.0
    for kname in order:
        e = float(jnp.abs(gpk[kname] - gpr[kname]).max()
                  / (jnp.abs(gpr[kname]).max() + 1e-9))
        worst = max(worst, e)
        if e > 3e-3:
            print(f"  param grad mismatch {kname}: rel {e:.5f}")
    print(f"worst param-grad rel err: {worst:.6f}")


if __name__ == "__main__":
    if "--train" in sys.argv:
        train_check()
    else:
        main()
