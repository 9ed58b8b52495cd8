"""Convert a reference PyTorch checkpoint to a native msgpack checkpoint.

Usage:
  python tools/convert_torch_ckpt.py --config-file configs/gen_chair.py \
      --input pretrained/chair.pth --output work_dirs/gen_chair/checkpoints/ckpt_0.msgpack

On mismatches the tool prints a readable diff report (missing target
leaves, unexpected/unconsumed model keys, shape mismatches) and exits 3
instead of stack-tracing; --lenient writes the partially-converted
checkpoint anyway (reference resume is likewise partial-tolerant,
runner/runner.py:492-522).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def print_report(report):
    print(
        f"conversion report: {report['written']}/{report['template_leaves']} "
        f"target leaves filled, {len(report['expected_leftovers'])} expected "
        "non-model leftovers (optimizer/extras)"
    )
    for key, title in (
        ("problems", "PROBLEMS (shape mismatches / aborted sections)"),
        ("suspicious", "UNCONSUMED MODEL KEYS (mapping gaps)"),
        ("missing", "TARGET LEAVES LEFT AT INIT (absent from the .pth)"),
    ):
        items = report[key]
        if items:
            print(f"  {title}: {len(items)}")
            for it in items[:20]:
                print(f"    - {it}")
            if len(items) > 20:
                print(f"    ... and {len(items) - 20} more")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--lenient", action="store_true",
        help="write the checkpoint even when the report has problems",
    )
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    from flax import serialization

    from difffacto_tpu.config import get_cfg, init_cfg
    from difffacto_tpu.models import AnchorDiffAE
    from difffacto_tpu.parallel.train import TrainState
    from difffacto_tpu.parallel.optim import build_optimizer_from_cfg
    from difffacto_tpu.utils.registry import MODELS, build_from_cfg
    from difffacto_tpu.utils.torch_ingest import ingest_with_report

    init_cfg(args.config_file)
    cfg = get_cfg()
    model = build_from_cfg(cfg.model.dump(), MODELS)

    import numpy as np
    import jax.numpy as jnp

    B, N, K = 2, cfg.model.npoints, cfg.model.num_anchors
    seg = np.repeat(np.arange(K), N // K)[None].repeat(B, 0)
    batch = {
        "input": jnp.zeros((B, N, 3), jnp.float32),
        "ref": jnp.zeros((B, N, 3), jnp.float32),
        "ref_seg_mask": jnp.asarray(seg, jnp.int32),
        "seg_mask": jnp.asarray(seg, jnp.int32),
        "ref_attn_map": jnp.asarray(np.eye(K, dtype=np.float32)[seg]),
        "attn_map": jnp.asarray(np.eye(K, dtype=np.float32)[seg]),
        "present": jnp.ones((B, K), jnp.float32),
        "dp_present": jnp.ones((B, K), jnp.float32),
        "part_shift": jnp.zeros((B, K, 3), jnp.float32),
        "part_scale": jnp.ones((B, K, 3), jnp.float32),
        "noise": jnp.zeros((B, 1), jnp.float32),
    }
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sample": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = jax.jit(lambda r, b: model.init(r, b, 0, method=AnchorDiffAE.loss))(
        rngs, batch
    )
    tx = build_optimizer_from_cfg(dict(type="Adam", lr=1e-3))
    state = TrainState.create(jax.device_get(variables), tx)
    state, report = ingest_with_report(args.input, model, state)
    print_report(report)
    # An empty model dict or wholly mis-prefixed keys would "convert" into a
    # checkpoint of pure init weights — written == 0 is a failure, not a
    # clean conversion (ADVICE r3).
    bad = report["problems"] or report["suspicious"] or report["written"] == 0
    if report["written"] == 0:
        print("conversion wrote ZERO leaves — input has no mappable model weights",
              file=sys.stderr)
    if bad and not args.lenient:
        print("conversion FAILED (use --lenient to write anyway)", file=sys.stderr)
        sys.exit(3)

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))
    print(f"converted {args.input} -> {args.output}")


if __name__ == "__main__":
    main()
