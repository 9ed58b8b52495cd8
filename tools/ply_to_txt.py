"""Convert dense .ply part scans (+ .labels files) to whitespace .txt packs.

Covers the reference's coalesced-data converter (reference:
tools/colasce_to_txt.py:1-22, which is broken as shipped — stale
``anchor_diff`` import and hardcoded cluster paths): for every
``<id>_ori.ply`` + ``<id>_ori.labels`` pair, drop all-zero padding points and
write ``<id>.txt`` rows of [x y z (extra props...) label]. No plyfile
dependency — a small numpy reader handles ascii and binary_little_endian
vertex elements.
"""

import argparse
import os
import sys

import numpy as np

_PLY_DTYPES = {
    "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "short": "<i2", "ushort": "<u2", "int": "<i4", "int32": "<i4",
    "uint": "<u4", "uint32": "<u4",
}


def load_ply_vertices(path):
    """Read the vertex element of a .ply file -> (N, num_props) float32."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"not a ply file: {path}")
        fmt = None
        count = 0
        props = []
        in_vertex = False
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unexpected EOF in ply header")
            tok = line.decode("ascii", "ignore").strip().split()
            if not tok:
                continue
            if tok[0] == "format":
                fmt = tok[1]
            elif tok[0] == "element":
                in_vertex = tok[1] == "vertex"
                if in_vertex:
                    count = int(tok[2])
            elif tok[0] == "property" and in_vertex:
                if tok[1] == "list":
                    raise ValueError("list property in vertex element")
                props.append((tok[2], _PLY_DTYPES[tok[1]]))
            elif tok[0] == "end_header":
                break
        if fmt == "ascii":
            rows = [f.readline().split() for _ in range(count)]
            return np.asarray(rows, np.float32)
        if fmt != "binary_little_endian":
            raise ValueError(f"unsupported ply format {fmt}")
        dt = np.dtype(props)
        raw = np.frombuffer(f.read(count * dt.itemsize), dtype=dt, count=count)
        return np.stack([raw[name].astype(np.float32) for name, _ in props], axis=1)


def main():
    ap = argparse.ArgumentParser(description="ply(+labels) -> txt pack")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--save-dir", required=True)
    ap.add_argument("--label-offset", type=int, default=23,
                    help="added to (label-1); reference uses -1+24 for lamps")
    args = ap.parse_args()

    os.makedirs(args.save_dir, exist_ok=True)
    fns = sorted(os.listdir(args.data_dir))
    ids = [f[:-8] for f in fns if f.endswith("_ori.ply")]
    print(f"{len(ids)} shapes")
    for fn in ids:
        pts = load_ply_vertices(os.path.join(args.data_dir, fn + "_ori.ply"))
        seg = (
            np.loadtxt(os.path.join(args.data_dir, fn + "_ori.labels")).astype(np.int64)
            + args.label_offset
        )
        mask = np.abs(pts[:, :3]).sum(1) != 0
        out = np.concatenate(
            [pts[mask], seg[mask, None].astype(np.float32)], axis=-1
        )
        np.savetxt(os.path.join(args.save_dir, f"{fn}.txt"), out)
    print("done")


if __name__ == "__main__":
    main()
