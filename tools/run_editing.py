"""Editing entry points under one working CLI.

The reference scattered these across broken scripts importing a stale package
name (tools/run_mixing.py, run_sample_one_part.py, optimize_noise.py,
shape_edit.py — SURVEY.md §2.7); this exposes every editing flow from one
consistent tool.

Examples:
  python tools/run_editing.py --config-file configs/gen_chair.py --mode mixing
  python tools/run_editing.py --config-file configs/gen_chair.py --mode interpolation --part_id 2
  python tools/run_editing.py --config-file configs/gen_chair.py --mode sample_one_part --part_id 1
  python tools/run_editing.py --config-file configs/gen_chair.py --mode optimize_noise
  python tools/run_editing.py --config-file configs/gen_chair.py --mode shape_edit --part_id 1
  python tools/run_editing.py --config-file configs/gen_chair.py --mode interpolate_params
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument(
        "--mode",
        required=True,
        choices=[
            "mixing",
            "interpolation",
            "interpolate_params",
            "sample_one_part",
            "optimize_noise",
            "shape_edit",
        ],
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--part_id", type=int, default=2)
    ap.add_argument("--sample_num_each", type=int, default=10)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from difffacto_tpu.config import get_cfg, init_cfg
    from difffacto_tpu.runner import Runner
    from difffacto_tpu.runner.editing import (
        combine_latent,
        interpolate_latent,
        interpolate_params,
        optimize_noise,
        sample_one_part,
        shape_edit,
    )
    from difffacto_tpu.runner.runner import device_batch

    init_cfg(args.config_file)
    runner = Runner(args=args, cfg=get_cfg())
    rng = jax.random.PRNGKey(args.seed)
    variables = runner.state.variables()
    out_dir = os.path.join(runner.work_dir, args.mode)
    os.makedirs(out_dir, exist_ok=True)

    batch = device_batch(next(iter(runner.val_loader)))
    if args.mode == "mixing":
        out = combine_latent(runner.model, variables, rng, batch)
    elif args.mode == "interpolation":
        out = interpolate_latent(runner.model, variables, rng, batch, part_id=args.part_id)
    elif args.mode == "interpolate_params":
        out = interpolate_params(runner.model, variables, rng, batch, part_id=args.part_id)
    elif args.mode == "sample_one_part":
        import jax.numpy as jnp

        # encode the batch to latents first (the reference loads a saved pkl)
        from difffacto_tpu.models import AnchorDiffAE

        codes = runner.model.apply(
            variables, batch["input"], batch["attn_map"], False,
            method=AnchorDiffAE.encode_part_code,
        )
        mean = np.asarray(batch["part_shift"])
        logvar = 2 * np.log(np.clip(np.asarray(batch["part_scale"]), 1e-3, None))
        out = sample_one_part(
            runner.model, variables, rng, np.asarray(codes),
            np.asarray(batch["present"]), mean, logvar,
            np.asarray(batch["ref_seg_mask"]), part_id=args.part_id,
            sample_num_each=args.sample_num_each,
        )
    elif args.mode == "optimize_noise":
        z, history = optimize_noise(runner.model, variables, rng, batch, steps=args.steps)
        out = {"z": np.asarray(z), "loss_history": np.asarray(history)}
    elif args.mode == "shape_edit":
        import jax.numpy as jnp

        target_mean = jnp.zeros((batch["ref"].shape[0], 3)).at[:, 1].set(0.5)
        out = shape_edit(
            runner.model, variables, rng, batch, edit_part_id=args.part_id,
            edit_part_mean=target_mean, steps=args.steps,
        )
    np.savez(os.path.join(out_dir, f"{args.mode}.npz"),
             **{k: v for k, v in out.items() if isinstance(v, np.ndarray)})
    print(f"{args.mode} -> {out_dir}/{args.mode}.npz")


if __name__ == "__main__":
    main()
