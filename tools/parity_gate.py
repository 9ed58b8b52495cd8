"""Turnkey parity gate: reference pretrained weights -> 1-NNA table.

The reference defines parity as the MMD/COV/1-NNA table its eval prints for
each category when resuming `pretrained/<cat>.pth`
(reference: configs/gen_chair.py:157, runner/runner.py:399-468,
datasets/evaluation_utils.py:500-541). This script runs that gate in ONE
command once the two environment-blocked inputs exist:

  data/shapenet_part/        the real ShapeNet-Part tree
                             (<synset>/  *.txt with (N,7) rows,
                              train_test_split/shuffled_*_file_list.json)
  pretrained/<cat>.pth       the reference checkpoints (chair, airplane,
                              car, lamp)

Usage:
  python tools/parity_gate.py                          # all four categories
  python tools/parity_gate.py --cats chair lamp --gen_num 400

Per category it launches `tools/run_net.py --task val_gen` as a subprocess
(fresh process = fresh config singleton + fresh TPU client), ingesting the
torch `.pth` directly via cfg.resume_path (runner/runner.py `.pth` branch,
numerically verified by tests/test_full_ingest.py), then writes
work_dirs/parity_gate/results.json and a markdown table to stdout.
"""

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CATS = ["chair", "airplane", "car", "lamp"]

# headline columns of the reference eval table (evaluation_utils.py:500-541)
TABLE_KEYS = [
    ("1-NN-CD-acc", "1-NNA-CD"),
    ("1-NN-EMD-acc", "1-NNA-EMD"),
    ("lgan_cov-CD", "COV-CD"),
    ("lgan_cov-EMD", "COV-EMD"),
    ("lgan_mmd-CD", "MMD-CD"),
    ("lgan_mmd-EMD", "MMD-EMD"),
]


def preflight(cats, data_root, pretrained_dir):
    problems = []
    split_dir = os.path.join(data_root, "train_test_split")
    if not os.path.isdir(data_root):
        problems.append(
            f"missing {data_root}/ — place the ShapeNet-Part tree there "
            "(synset dirs of (N,7) txt files)"
        )
    elif not os.path.isdir(split_dir):
        problems.append(
            f"missing {split_dir}/ — needs shuffled_{{train,val,test}}_file_list.json"
        )
    for cat in cats:
        pth = os.path.join(pretrained_dir, f"{cat}.pth")
        if not os.path.exists(pth):
            problems.append(f"missing {pth} — the reference pretrained checkpoint")
    return problems


def run_category(cat, gen_num, extra_env=None):
    """Run val_gen for one category; return (metrics dict, work log path)."""
    cfg = os.path.join(REPO, "configs", f"gen_{cat}.py")
    log_path = os.path.join(REPO, "work_dirs", "parity_gate", f"{cat}.log")
    os.makedirs(os.path.dirname(log_path), exist_ok=True)
    cmd = [
        sys.executable,
        os.path.join(REPO, "tools", "run_net.py"),
        "--config-file", cfg,
        "--task", "val_gen",
        "--gen_num", str(gen_num),
        "--prefix", "parity",
    ]
    env = dict(os.environ)
    if extra_env:
        env.update(extra_env)
    with open(log_path, "w") as log:
        proc = subprocess.run(cmd, stdout=subprocess.PIPE, stderr=log, env=env,
                              cwd=REPO, text=True)
    metrics = {}
    for line in proc.stdout.splitlines():
        m = re.match(r"^([\w./-]+):\s+(-?[\d.eE+-]+)$", line.strip())
        if m:
            try:
                metrics[m.group(1)] = float(m.group(2))
            except ValueError:
                pass
    if proc.returncode != 0 or not metrics:
        raise RuntimeError(
            f"{cat}: val_gen failed (rc={proc.returncode}); see {log_path} "
            f"(last stdout: {proc.stdout.strip().splitlines()[-3:] if proc.stdout.strip() else '<empty>'})"
        )
    return metrics, log_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cats", nargs="+", default=CATS, choices=CATS)
    ap.add_argument("--gen_num", type=int, default=400)
    ap.add_argument("--data-root", default=os.path.join(REPO, "data", "shapenet_part"))
    ap.add_argument("--pretrained-dir", default=os.path.join(REPO, "pretrained"))
    ap.add_argument(
        "--allow-missing", action="store_true",
        help="run whatever categories have their inputs; skip the rest",
    )
    args = ap.parse_args()

    problems = preflight(args.cats, args.data_root, args.pretrained_dir)
    if problems:
        print("parity gate: inputs missing:", file=sys.stderr)
        for p in problems:
            print(f"  - {p}", file=sys.stderr)
        if not args.allow_missing:
            sys.exit(2)
        args.cats = [
            c for c in args.cats
            if os.path.exists(os.path.join(args.pretrained_dir, f"{c}.pth"))
        ]
        if not args.cats or not os.path.isdir(args.data_root):
            sys.exit(2)

    results = {}
    for cat in args.cats:
        print(f"== {cat}: convert + generate {args.gen_num} + eval ==", flush=True)
        metrics, log_path = run_category(cat, args.gen_num)
        results[cat] = metrics
        print(f"   done ({log_path})", flush=True)

    out_path = os.path.join(REPO, "work_dirs", "parity_gate", "results.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)

    header = "| category | " + " | ".join(label for _, label in TABLE_KEYS) + " |"
    print("\n" + header)
    print("|" + "---|" * (len(TABLE_KEYS) + 1))
    for cat, metrics in results.items():
        cells = []
        for key, _ in TABLE_KEYS:
            v = metrics.get(key)
            cells.append(f"{v:.4f}" if v is not None else "—")
        print(f"| {cat} | " + " | ".join(cells) + " |")
    print(f"\nfull metrics: {out_path}")


if __name__ == "__main__":
    main()
