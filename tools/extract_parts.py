"""Split generated shapes into fixed-size per-part clouds for part-level eval.

Covers the reference's per-part packing scripts (reference:
tools/process_data_for_parts.py / process_data_for_parts_eval.py, broken as
shipped — stale ``anchor_diff`` imports): from a val npz dump holding
``pred`` + a seg mask, extract each part's points, optionally canonicalize
(zero-mean, clipped per-axis std like dataset_utils pc_norm shape_canonical),
FPS/pad to a fixed count, and save one npz per category with arrays
``part_<k>`` (S_k, npoint, 3).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description="per-part cloud extraction")
    ap.add_argument("--dump", required=True, help="npz with pred + seg mask")
    ap.add_argument("--output", required=True)
    ap.add_argument("--pred-key", default="pred")
    ap.add_argument("--mask-key", default=None,
                    help="default: pred_seg_mask, else seg_mask, else ref_seg_mask")
    ap.add_argument("--npoint", type=int, default=512)
    ap.add_argument("--n-class", type=int, default=4)
    ap.add_argument("--canonical", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto_tpu.ops.points import fps

    z = np.load(args.dump, allow_pickle=True)
    pred = np.asarray(z[args.pred_key], np.float32)
    if pred.ndim == 4:
        pred = pred[:, 0]
    mask = None
    for key in ([args.mask_key] if args.mask_key else
                ["pred_seg_mask", "seg_mask", "ref_seg_mask"]):
        if key and key in z:
            mask = np.asarray(z[key])
            break
    assert mask is not None, "no seg mask found in dump"

    out = {}
    for k in range(args.n_class):
        parts = []
        for b in range(pred.shape[0]):
            pts = pred[b][mask[b] == k]
            if len(pts) < 10:  # straggler parts are dropped like the dataset
                continue
            if args.canonical:
                pts = pts - pts.mean(0, keepdims=True)
                std = np.clip(pts.std(0, keepdims=True), 1e-2, 1.0)
                pts = pts / std
            if len(pts) >= args.npoint:
                pts = np.asarray(fps(jnp.asarray(pts[None]), args.npoint))[0]
            else:
                reps = np.random.RandomState(b).choice(
                    len(pts), args.npoint - len(pts)
                )
                pts = np.concatenate([pts, pts[reps]])
            parts.append(pts)
        if parts:
            out[f"part_{k}"] = np.stack(parts)
            print(f"part {k}: {out[f'part_{k}'].shape}")
    np.savez(args.output, **out)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
