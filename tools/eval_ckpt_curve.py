"""Evaluate a directory of checkpoints with the generation protocol.

Builds ONE Runner (so the jitted generation/eval pipelines compile once),
then for each checkpoint: load(model_only=False) -> generate_samples ->
print a JSON line. Used for epochs-vs-1-NNA convergence curves.

  python tools/eval_ckpt_curve.py --config-file configs/bench_train_long_tpu.py \
      --gen_num 64 [--ckpts ckpt_100.msgpack ...]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from difffacto_tpu.utils import install_tool_watchdog

# a 10-ckpt curve at ~245 s/ckpt plus the first-eval ref block is ~1.5 h;
# budget generously — the watchdog only guards against a dead tunnel
install_tool_watchdog(6 * 3600.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--gen_num", type=int, default=64)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--ckpts", nargs="*", default=None,
                   help="explicit checkpoint paths; default: all ckpt_*.msgpack "
                        "in <work_dir>/checkpoints sorted by epoch")
    p.add_argument("--out", default=None, help="also append JSON lines here")
    p.add_argument(
        "--ddim", type=int, default=0,
        help="evaluate with DDIM fast sampling at this many steps "
             "(reference eval option: 25 quad steps, eta=1 — "
             "anchored_diffusion.py:114-126, configs/gen_chair.py:81-84)",
    )
    p.add_argument("--ddim-discretize", default="quad", choices=["uniform", "quad"])
    p.add_argument("--ddim-eta", type=float, default=1.0)
    args = p.parse_args()

    from difffacto_tpu.config import get_cfg, init_cfg
    from difffacto_tpu.runner import Runner
    from difffacto_tpu.utils import enable_compile_cache

    enable_compile_cache()
    init_cfg(args.config_file)
    cfg = get_cfg()
    # We drive checkpoint loading explicitly below; without auto_resume=False
    # the Runner would ALSO load the work_dir's newest checkpoint at
    # construction (runner.py resume fallback) — a wasted deserialize.
    cfg.resume_path = None
    cfg.auto_resume = False
    if args.ddim:
        cfg.model.diffusion.ddim_sampling = True
        cfg.model.diffusion.ddim_nsteps = args.ddim
        cfg.model.diffusion.ddim_discretize = args.ddim_discretize
        cfg.model.diffusion.ddim_eta = args.ddim_eta

    runner = Runner(cfg=cfg)
    ckpts = args.ckpts or sorted(
        glob.glob(os.path.join(runner.work_dir, "checkpoints/ckpt_*.msgpack")),
        key=lambda f: int(os.path.basename(f)[5:-8]),
    )
    for path in ckpts:
        runner.load(path, model_only=False)
        t0 = time.time()
        metrics = runner.generate_samples(num_gen=args.gen_num, batch=args.batch)
        row = {
            "ckpt": os.path.basename(path),
            "epoch": runner.epoch,
            "eval_s": round(time.time() - t0, 1),
            **{k: float(v) for k, v in metrics.items()},
        }
        line = json.dumps(row)
        print(line, flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
