"""FPS-downsample dense per-part clouds with per-part normalization.

Re-implements the reference tool (reference: tools/fps_shape.py:19-92, which
shipped broken — stale imports): dense shapes + labels in, fixed-npoint
FPS-sampled shapes with per-part canonical stats out, saved as npz.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="npz with points (S,N,3), labels (S,N)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--npoints", type=int, default=2048)
    ap.add_argument("--n_class", type=int, default=4)
    ap.add_argument("--clip", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difffacto_tpu.data.dataset_utils import pc_norm
    from difffacto_tpu.ops.points import furthest_point_sample

    z = np.load(args.input, allow_pickle=True)
    points, labels = np.asarray(z["points"]), np.asarray(z["labels"])
    out_pts, out_labels, out_shifts, out_scales = [], [], [], []
    for pc, lab in zip(points, labels):
        idx = np.asarray(
            furthest_point_sample(jnp.asarray(pc[None], jnp.float32), args.npoints)
        )[0]
        pc, lab = pc[idx].astype(np.float32), lab[idx]
        pc, _, _ = pc_norm(pc, "shape_unit")
        shifts = np.zeros((args.n_class, 3), np.float32)
        scales = np.ones((args.n_class, 3), np.float32)
        for i in range(args.n_class):
            m = lab == i
            if m.sum() >= 10:
                _, s, c = pc_norm(pc[m], "shape_canonical", clip=args.clip)
                shifts[i], scales[i] = s[0], c[0]
        out_pts.append(pc)
        out_labels.append(lab)
        out_shifts.append(shifts)
        out_scales.append(scales)
    np.savez_compressed(
        args.output,
        points=np.stack(out_pts),
        labels=np.stack(out_labels).astype(np.int8),
        part_shift=np.stack(out_shifts),
        part_scale=np.stack(out_scales),
    )
    print(f"wrote {len(out_pts)} shapes -> {args.output}")


if __name__ == "__main__":
    main()
