"""CLI entry point: train / validate / generate with a config file.

Replaces the reference CLI (reference: tools/run_net.py:8-121) — same flag
surface (--config-file, --task, --seed, ...) minus the torch launcher
plumbing: multi-chip parallelism is a device mesh inside one process, not
torchrun ranks.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="DiffFacto-TPU runner")
    p.add_argument("--config-file", required=True)
    p.add_argument(
        "--task",
        default="train",
        choices=["train", "val", "val_gen", "interpolation", "mixing"],
    )
    p.add_argument(
        "--runner",
        default="auto",
        choices=["auto", "default", "pretrain", "gan", "language"],
        help="runner family; replaces the reference's separate "
        "run_pretrain/run_cgan/run_language entry scripts (broken as "
        "shipped, stale anchor_diff imports). 'auto' reads cfg.runner.",
    )
    p.add_argument(
        "--launcher",
        choices=["none", "jax"],
        default="none",
        help="job launcher (reference run_net.py:11-15 '--launcher pytorch'); "
        "'jax' calls jax.distributed.initialize() for multi-host pods — "
        "coordinator/rank come from the TPU environment. No-op on one host.",
    )
    p.add_argument("--local_rank", type=int, default=0)
    p.add_argument(
        "--sync_bn",
        action="store_true",
        help="accepted for CLI parity; batch-norm statistics are ALWAYS "
        "pmean-synced across the mesh here (SyncBN by construction).",
    )
    p.add_argument("--save_dir", default=".")
    p.add_argument("--prefix", default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--deterministic", action="store_true")
    p.add_argument("--no_eval", action="store_true")
    p.add_argument("--short_val", action="store_true")
    p.add_argument("--gen_num", type=int, default=400)
    p.add_argument("--param_sample_num", type=int, default=10)
    p.add_argument("--part_id", type=int, default=0)
    p.add_argument("--interpolation_dir", default=None)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    # After the platform switch: the persistent cache dir is keyed per
    # platform (remote-tunnel CPU-AOT entries are not feature-safe locally).
    from difffacto_tpu.utils import enable_compile_cache

    enable_compile_cache()

    if args.launcher != "none":
        from difffacto_tpu.parallel import initialize_distributed

        initialize_distributed(strict=True)

    from difffacto_tpu.config import get_cfg, init_cfg
    from difffacto_tpu.runner import (
        GanRunner,
        LanguageRunner,
        PretrainRunner,
        Runner,
    )

    init_cfg(args.config_file)
    cfg = get_cfg()
    if args.prefix:
        cfg.work_dir = os.path.join("work_dirs", cfg.name + "_" + args.prefix)

    kind = args.runner
    if kind == "auto":
        kind = cfg.get("runner", "default")
    runner_cls = {
        "default": Runner,
        "pretrain": PretrainRunner,
        "gan": GanRunner,
        "language": LanguageRunner,
    }[kind]
    runner = runner_cls(args=args, cfg=cfg)
    if args.task == "train":
        runner.run()
    elif args.task == "val":
        runner.val()
    elif args.task == "val_gen":
        metrics = runner.generate_samples(num_gen=args.gen_num)
        for k, v in metrics.items():
            print(f"{k}: {v}")
    elif args.task == "interpolation":
        from difffacto_tpu.runner.editing import run_interpolation

        run_interpolation(runner, args)
    elif args.task == "mixing":
        from difffacto_tpu.runner.editing import run_mixing

        run_mixing(runner, args)


if __name__ == "__main__":
    main()
