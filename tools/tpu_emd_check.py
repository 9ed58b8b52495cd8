"""TPU-side accuracy + throughput check for the hybrid Pallas EMD.

Compares the Sinkhorn-warm-started auction kernel (ops/emd_pallas.py)
against the XLA auction (ops/emd.py) on random 2048-pt cloud pairs, then
measures pairwise-matrix throughput through metrics/eval.pairwise_cd_emd
(the shape the generation protocol actually runs).

Timing rule (CLAUDE.md): standalone repeated dispatches content-cache
through the axon tunnel; every timed sweep here feeds fresh data derived
from the previous result.

Run: python tools/tpu_emd_check.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from difffacto_tpu.ops.emd import emd_cost
    from difffacto_tpu.ops.emd_pallas import emd_assignment_hybrid

    rng = np.random.RandomState(0)
    B, n = 4, 2048
    a = jnp.asarray(rng.randn(B, n, 3) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(B, n, 3) * 0.3, jnp.float32)

    # accuracy: hybrid vs XLA auction at a mid iteration budget (the full
    # 10000-iter auction dispatch can outlive the tunnel watchdog)
    auc = np.asarray(emd_cost(a, b, 0.002, 1500))
    assign = np.asarray(emd_assignment_hybrid(a, b))
    an, bn = np.asarray(a), np.asarray(b)
    hyb = []
    dups = 0
    for i in range(B):
        d = np.sqrt(((an[i][:, None] - bn[i][None]) ** 2).sum(-1))
        hyb.append(d[np.arange(n), assign[i]].mean())
        dups += n - len(np.unique(assign[i]))
    hyb = np.asarray(hyb)
    print("auction@1500:", np.round(auc, 5))
    print("hybrid:      ", np.round(hyb, 5))
    print(f"rel diff: {np.abs(hyb - auc).max() / auc.mean():.4f}  "
          f"duplicates: {dups}/{B * n}")

    # protocol-shaped throughput
    from difffacto_tpu.metrics import eval as ev

    S, R = 4, 128
    sample = rng.randn(S, n, 3).astype(np.float32) * 0.3
    ref = rng.randn(R, n, 3).astype(np.float32) * 0.3
    ev.pairwise_cd_emd(sample, ref, batch_size=32)  # compile
    t0 = time.perf_counter()
    cd, emd_m = ev.pairwise_cd_emd(sample + 0.01, ref, batch_size=32)
    dt = time.perf_counter() - t0
    print(f"pairwise CD+EMD: {dt / (S * R) * 1e3:.1f} ms/pair "
          f"(400-shape protocol est {3 * 400 * 400 * dt / (S * R) / 60:.0f} min; "
          f"XLA auction at eval settings measured ~700 ms/pair = ~4 days)")


if __name__ == "__main__":
    main()
