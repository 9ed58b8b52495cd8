"""Convert a reference PyTorch checkpoint to a native msgpack checkpoint.

Usage:
  python tools/convert_torch_ckpt.py --config-file configs/gen_chair.py \
      --input pretrained/chair.pth --output work_dirs/gen_chair/checkpoints/ckpt_0.msgpack
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--cpu", action="store_true")
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
    from difffacto_tpu.utils.torch_ingest import load_reference_checkpoint

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
    state = load_reference_checkpoint(args.input, model, state)

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))
    print(f"converted {args.input} -> {args.output}")


if __name__ == "__main__":
    main()
