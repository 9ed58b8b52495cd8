"""Same-data A/B of the two eval-EMD implementations on protocol-shaped data.

VERDICT (r1) asked for the 1-NNA-EMD parity claim to be backed by a
same-implementation A/B on at least one realistic slice: this generates S
shapes from a trained checkpoint (the val_gen path: flow prior -> CIMLE
aligner -> reverse diffusion -> bbox-normalize) plus S reference shapes, and
runs compute_all_metrics twice over the SAME arrays —

  * hybrid:  the Pallas Sinkhorn-warm-started auction (TPU default), and
  * auction: the XLA while_loop auction at the reference eval settings
    (eps=0.002, early-exit, iter cap via --auction-iters; the reference's
    10^4 with no early exit is the CUDA setting, emd_module.py:41-42) —

then prints both metric dicts and the deltas. The auction pass is slow
(~0.7 s/pair); S=32 -> ~2k pairs ~= 25 min on 1x v5e. Dispatch sizes are
forced down (1 row / 1 chunk per dispatch) to stay under the tunnel worker
watchdog.

Run: python tools/emd_impl_ab.py --config-file configs/bench_protocol_tpu.py \
         [--num 32] [--auction-iters 3000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from difffacto_tpu.utils import install_tool_watchdog

install_tool_watchdog()  # tunnel hangs must not outlive the tool (VERDICT r2)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", default="configs/bench_protocol_tpu.py")
    ap.add_argument("--num", type=int, default=32)
    ap.add_argument(
        "--auction-iters", type=int, default=3000,
        help="XLA-auction iteration cap (early exit usually converges sooner; "
        "the full reference 10^4 risks per-dispatch watchdog limits)",
    )
    args = ap.parse_args()

    # small dispatches so the slow auction sweeps stay under the tunnel
    # watchdog: 1 row x 1 ref chunk of 8 pairs per dispatch (a full-row
    # dispatch at auction eval iterations crashed the TPU worker); must be
    # set before metrics/eval is imported
    os.environ["DIFFFACTO_PAIRWISE_ROWS"] = "1"
    os.environ["DIFFFACTO_PAIRWISE_SELF_CHUNKS"] = "1"
    os.environ["DIFFFACTO_PAIRWISE_REF_BLOCK"] = "1"

    from difffacto_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from difffacto_tpu.config import Config
    from difffacto_tpu.data import sample_part_presence
    from difffacto_tpu.metrics import compute_all_metrics
    from difffacto_tpu.runner import Runner

    cfg = Config(args.config_file)
    runner = Runner(cfg=cfg)
    S = args.num

    rng_np = np.random.RandomState(runner.seed)
    presence = sample_part_presence(rng_np, S, runner.model.num_anchors)
    from difffacto_tpu.models import sample_generation

    out = sample_generation(
        runner.model,
        runner.state.variables(),
        jax.random.PRNGKey(runner.seed + 17),
        S,
        valid_id=jnp.asarray(presence),
        epoch=runner.epoch,
    )
    K = runner.model.cimle_sample_num if runner.model.cimle else 1
    gen = np.asarray(out["pred"]).reshape(S, K, -1, 3)[:, 0]
    refs = []
    for vb in runner.val_loader:
        refs.append(np.asarray(vb["ref"]))
        if sum(r.shape[0] for r in refs) >= S:
            break
    refs = np.concatenate(refs)[:S]

    from difffacto_tpu.data.dataset_utils import bbox_normalize

    gen = bbox_normalize(gen)
    refs = bbox_normalize(refs)

    results = {}
    for impl in ("hybrid", "auction"):
        os.environ["DIFFFACTO_EMD_IMPL"] = impl
        os.environ["DIFFFACTO_EMD_ITERS"] = str(args.auction_iters)
        t0 = time.perf_counter()
        m = compute_all_metrics(gen, refs, batch_size=8, one_way=False)
        dt = time.perf_counter() - t0
        results[impl] = m
        print(f"[{impl}] {dt:.0f} s")
        for k in sorted(m):
            if "EMD" in k or "CD" in k:
                print(f"  {k}: {m[k]:.5f}")
    print("deltas (hybrid - auction):")
    for k in sorted(results["hybrid"]):
        d = results["hybrid"][k] - results["auction"][k]
        print(f"  {k}: {d:+.5f}")


if __name__ == "__main__":
    main()
