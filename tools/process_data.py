"""Preprocess raw part datasets into fixed-size packed arrays.

Re-implements the reference preprocessing tools (reference:
tools/process_data.py:10-34, tools/fps_shape.py:19-92) on the XLA FPS op:
dense per-shape clouds are furthest-point downsampled to a fixed count and
packed into one npz consumable by the ShapeNetParts/Partnet datasets.

Input formats: .h5 (keys 'points'/'labels', if h5py is available), .npz with
the same keys, or a directory of whitespace .txt files (xyz... label).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_any(path):
    if path.endswith(".h5"):
        import h5py  # optional

        with h5py.File(path, "r") as f:
            return np.asarray(f["points"]), np.asarray(f["labels"])
    if path.endswith(".npz"):
        z = np.load(path, allow_pickle=True)
        return np.asarray(z["points"]), np.asarray(z["labels"])
    if os.path.isdir(path):
        from difffacto_tpu.native import fast_loadtxt

        pts, labs = [], []
        for fn in sorted(os.listdir(path)):
            if not fn.endswith(".txt"):
                continue
            data = fast_loadtxt(os.path.join(path, fn))
            pts.append(data[:, :3])
            labs.append(data[:, -1].astype(np.int32))
        return pts, labs
    raise ValueError(f"unsupported input: {path}")


def main():
    ap = argparse.ArgumentParser(description="pack part clouds via FPS")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--npoints", type=int, default=2048)
    ap.add_argument("--label-base", type=int, default=0, help="subtract from labels")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto_tpu.ops.points import fps, gather_points_nd, furthest_point_sample

    points, labels = load_any(args.input)
    out_pts, out_labs = [], []
    for pc, lab in zip(points, labels):
        pc = np.asarray(pc, np.float32)
        lab = np.asarray(lab, np.int32) - args.label_base
        if pc.shape[0] < args.npoints:
            reps = int(np.ceil(args.npoints / pc.shape[0]))
            pc = np.tile(pc, (reps, 1))[: args.npoints]
            lab = np.tile(lab, reps)[: args.npoints]
        idx = np.asarray(furthest_point_sample(jnp.asarray(pc[None]), args.npoints))[0]
        out_pts.append(pc[idx])
        out_labs.append(lab[idx])
    np.savez_compressed(
        args.output,
        points=np.stack(out_pts),
        labels=np.stack(out_labs).astype(np.int8),
    )
    print(f"packed {len(out_pts)} shapes x {args.npoints} pts -> {args.output}")


if __name__ == "__main__":
    main()
