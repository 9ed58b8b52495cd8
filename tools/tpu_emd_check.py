"""TPU-side accuracy + throughput check for the hybrid Pallas EMD.

Compares the Sinkhorn-warm-started auction kernel (ops/emd_pallas.py)
against the XLA auction (ops/emd.py) on random 2048-pt cloud pairs, then
measures pairwise-matrix throughput through metrics/eval.pairwise_cd_emd
(the shape the generation protocol actually runs).

Timing rule (CLAUDE.md): standalone repeated dispatches content-cache
through the axon tunnel; every timed sweep here feeds fresh data derived
from the previous result.

Run: python tools/tpu_emd_check.py         # accuracy + protocol throughput
     python tools/tpu_emd_check.py --ab    # knob sweep: sinkhorn_rows x
                                           # auction_iters (accuracy + ms/pair)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from difffacto_tpu.utils import install_tool_watchdog

install_tool_watchdog()  # tunnel hangs must not outlive the tool (VERDICT r2)

import numpy as np


def ab_sweep():
    """A/B the sinkhorn-row-subsample + tile-skip knobs on protocol-shaped
    work. Each config is a distinct program (env knobs key the eval caches),
    so the tunnel content-cache can't alias sweeps; inputs vary per sweep."""
    import jax.numpy as jnp

    from difffacto_tpu.metrics import eval as ev
    from difffacto_tpu.ops.emd import emd_cost
    from difffacto_tpu.ops.emd_pallas import emd_assignment_hybrid

    rng = np.random.RandomState(0)
    B, n = 8, 2048
    an = (rng.randn(B, n, 3) * 0.3).astype(np.float32)
    bn = (rng.randn(B, n, 3) * 0.3).astype(np.float32)
    a, b = jnp.asarray(an), jnp.asarray(bn)
    auc = np.asarray(emd_cost(a, b, 0.002, 1500))
    print("auction@1500 mean:", auc.mean().round(5))

    S, R = 4, 128
    sample = (rng.randn(S, n, 3) * 0.3).astype(np.float32)
    ref = (rng.randn(R, n, 3) * 0.3).astype(np.float32)

    # (sinkhorn_rows, auction_iters, sinkhorn_iters, sinkhorn_inner, decay)
    configs = [
        (0, 150, 150, 30, 0.4),
        (1024, 150, 150, 30, 0.4),
        (1024, 150, 250, 25, 0.5),   # deeper anneal: trade cheap sinkhorn
        (1024, 100, 250, 25, 0.5),   # ...for fewer expensive auction iters
        (1024, 300, 150, 30, 0.4),
        (512, 300, 150, 30, 0.4),
        (0, 300, 150, 30, 0.4),
    ]
    for ci, (rows, a_iters, s_iters, s_inner, decay) in enumerate(configs):
        assign = np.asarray(
            emd_assignment_hybrid(
                a, b, sinkhorn_rows=rows, auction_iters=a_iters,
                sinkhorn_iters=s_iters, sinkhorn_inner=s_inner,
                eps_decay=decay,
            )
        )
        hyb, dups = [], 0
        for i in range(B):
            d = np.sqrt(((an[i][:, None] - bn[i][None]) ** 2).sum(-1))
            hyb.append(d[np.arange(n), assign[i]].mean())
            dups += n - len(np.unique(assign[i]))
        rel = np.abs(np.asarray(hyb) - auc).max() / auc.mean()

        os.environ["DIFFFACTO_EMD_SINKHORN_ROWS"] = str(rows)
        os.environ["DIFFFACTO_EMD_AUCTION_ITERS"] = str(a_iters)
        os.environ["DIFFFACTO_EMD_SINKHORN_ITERS"] = str(s_iters)
        if s_inner == 30 and decay == 0.4:  # pairwise path only knows ITERS
            ev.pairwise_cd_emd(sample, ref, batch_size=32)  # compile config
            t0 = time.perf_counter()
            ev.pairwise_cd_emd(sample + 0.01 * (1 + ci), ref, batch_size=32)
            mspair = (time.perf_counter() - t0) / (S * R) * 1e3
            ms = f"{mspair:5.2f} ms/pair"
        else:
            ms = "   (direct kernel only)"
        print(
            f"rows={rows or n:4d} auction={a_iters:3d} sink={s_iters}x"
            f"{s_inner}@{decay}: {ms}  rel_err={rel:.4f}  dup={dups}/{B * n}"
        )


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
    # 10000-iter auction dispatch can outlive the tunnel watchdog); both
    # auction-bidding variants (f32 recompute vs bf16 VMEM cache)
    auc = np.asarray(emd_cost(a, b, 0.002, 1500))
    an, bn = np.asarray(a), np.asarray(b)
    print("auction@1500:", np.round(auc, 5))
    for from_cache in (False, True):
        assign = np.asarray(
            emd_assignment_hybrid(a, b, auction_from_cache=from_cache)
        )
        hyb = []
        dups = 0
        for i in range(B):
            d = np.sqrt(((an[i][:, None] - bn[i][None]) ** 2).sum(-1))
            hyb.append(d[np.arange(n), assign[i]].mean())
            dups += n - len(np.unique(assign[i]))
        hyb = np.asarray(hyb)
        print(f"hybrid(auction_from_cache={from_cache}):", np.round(hyb, 5))
        print(f"  rel diff: {np.abs(hyb - auc).max() / auc.mean():.4f}  "
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
    mspair = dt / (S * R) * 1e3

    # symmetric X-vs-X sweep (the 1-NNA self matrices): triangle + mirror
    Ss = 32  # 496 upper-triangle pairs: one 512-pair dispatch, 3% padding
    selfpts = rng.randn(Ss, n, 3).astype(np.float32) * 0.3
    ev.pairwise_self_cd_emd(selfpts, batch_size=32)  # compile
    t0 = time.perf_counter()
    ev.pairwise_self_cd_emd(selfpts + 0.01, batch_size=32)
    dt_s = time.perf_counter() - t0
    npairs = Ss * (Ss - 1) // 2  # 496 real; 512 computed incl. padding
    ms_self = dt_s / npairs * 1e3
    # protocol: 400x400 rect + 2 triangles of 400 -> 160k + 2*79.8k pairs
    est = (400 * 400 * mspair + 2 * (400 * 399 // 2) * ms_self) / 1e3 / 60
    print(f"pairwise CD+EMD: {mspair:.1f} ms/pair rect, {ms_self:.1f} ms/pair "
          f"self-triangle ({npairs} pairs in {dt_s:.1f} s); 400-shape protocol "
          f"est {est:.0f} min (XLA auction at eval settings ~700 ms/pair = days)")


if __name__ == "__main__":
    if "--ab" in sys.argv:
        ab_sweep()
    else:
        main()
