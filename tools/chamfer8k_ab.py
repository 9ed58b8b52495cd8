"""A/B chamfer formulations at car scale (8192 pts) on the real TPU.

MEASUREMENT LESSON (r5, now in CLAUDE.md): standalone repeated dispatches
through the axon tunnel are untrustworthy in BOTH directions — chaining
inputs as ``x + result*1e-7`` does NOT help when the perturbation is below
f32 eps of the operand (x ~ 0.3 -> ulp ~ 3.6e-8): the inputs are
BIT-IDENTICAL and the worker content-cache replays the old answer (an
earlier version of this tool "measured" 1.7 ms/pair that way, while the
per-dispatch tunnel overhead simultaneously inflated small-work variants to
~53 "ms/pair"). Every number here therefore comes from ITERS chained
evaluations inside ONE jitted scan — device-bound, no per-dispatch overhead,
no content-cache.

Device-true results at 8 x 8192x8192 (v5e, r5) — steady-state rounds of the
in-dispatch loop (the FIRST timed round in a process is also unreliable:
0.0 or ~10 ms/pair artifacts; trust rounds 2+):
  chamfer_split_tiled (scan, shipped)  ~0.96 ms/pair
  full (no scan)                       ~0.95 ms/pair
  i.e. the shipped code was ALWAYS at its ~0.9 ms/pair HBM bound; the
  "52.8 ms/pair" in the first car rehearsal was per-dispatch tunnel
  overhead, and an intermediate 6.7 ms/pair scan reading was a
  first-timed-round artifact. A Pallas kernel was built anyway and measured
  ~2 ms/pair at exact f32 precision (MXU multi-pass dominates) — removed.

Run: python tools/chamfer8k_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from difffacto_tpu.utils import install_tool_watchdog

install_tool_watchdog()

import numpy as np

ITERS = 16


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from difffacto_tpu.ops.chamfer import chamfer_split, chamfer_split_tiled
    from difffacto_tpu.ops.points import square_distance

    from difffacto_tpu.utils import enable_compile_cache

    enable_compile_cache()
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    B, n = 8, 8192
    x0 = jnp.asarray((rng.randn(B, n, 3) * 0.3).astype(np.float32))
    y0 = jnp.asarray((rng.randn(B, n, 3) * 0.3).astype(np.float32))

    @functools.partial(jax.jit, static_argnums=(2,))
    def tiled_scan_k3(x, y, tile=2048):
        Bn, N, _ = x.shape
        M = y.shape[1]

        def body(dl, yt):
            d2 = square_distance(x, yt)
            return jnp.minimum(dl, jnp.min(d2, 2)), jnp.min(d2, 1)

        y_t = y.reshape(Bn, M // tile, tile, 3).transpose(1, 0, 2, 3)
        dl0 = jnp.full((Bn, N), jnp.inf, jnp.float32)
        dl, drt = jax.lax.scan(body, dl0, y_t)
        return dl, drt.transpose(1, 0, 2).reshape(Bn, M)

    def make_loop(fn):
        @jax.jit
        def loop(x, y):
            def body(carry, _):
                xs, acc = carry
                dl, dr = fn(xs, y)
                m = dl.mean() + dr.mean()
                # 1e-3-relative perturbation: WELL above f32 ulp, so every
                # scan iteration computes on genuinely different data
                return (x * (1.0 + m * 1e-3), acc + m), None

            (_, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), None, length=ITERS)
            return acc

        return loop

    variants = {
        "dispatch_default": lambda a, b: chamfer_split_tiled(a, b),
        "full": chamfer_split,
        "tiled_scan_k3": lambda a, b: tiled_scan_k3(a, b),
    }
    for name, fn in variants.items():
        loop = make_loop(fn)
        acc = loop(x0, y0)
        acc.block_until_ready()  # compile
        times = []
        x = x0
        for _ in range(3):
            # CUMULATIVE chain through a HOST round-trip: float(acc) both
            # evolves x round-over-round (a converged device-side chain goes
            # bit-identical and the content-cache replays) and forces a real
            # host sync — without it every round measured 0.0 even with
            # block_until_ready (observed)
            x = x * (1.0 + float(acc) * 1e-3)
            t0 = time.perf_counter()
            acc = loop(x, y0)
            acc.block_until_ready()
            times.append((time.perf_counter() - t0) / (ITERS * B) * 1e3)
        steady = times[1:] or times
        print(f"{name}: {min(steady):.3f} ms/pair steady (rounds {[round(t, 2) for t in times]})")


if __name__ == "__main__":
    main()
