"""Benchmark: 2048-point chair generation throughput (shapes/sec/chip).

The reference's headline workload (BASELINE.md): unconditional generation of
2048-point chairs — flow prior -> CIMLE aligner -> T=100 reverse diffusion.
Runs the flagship gen_chair model (untrained weights; throughput is
weight-independent) on the real TPU and prints ONE JSON line.

vs_baseline divides by REFERENCE_SHAPES_PER_SEC, an analytic estimate of the
PyTorch+CUDA reference on one A100 (see BASELINE.md "Measured baselines"):
~2 MFLOP-MAC/token/step denoiser, T=100, batch 128, ~30% MFU -> ~40 shapes/s.
Replace with a measured number when one exists.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_SHAPES_PER_SEC = 40.0

BATCH = 256  # +3% over 128 (head/tail amortization, CLAUDE.md ledger); serving-throughput config
NPOINTS = 2048
WARMUP = 1
ITERS = 3


def main():
    import jax

    from difffacto_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from __graft_entry__ import _model_cfg
    from difffacto_tpu.models import AnchorDiffAE, sample_generation
    from difffacto_tpu.utils.registry import MODELS, build_from_cfg

    mcfg = _model_cfg(npoints=NPOINTS)
    mcfg["cimle_sample_num"] = 1  # gen_chair eval protocol (configs/gen_chair.py)
    mcfg["dtype"] = jnp.bfloat16  # MXU-native compute; schedule math stays f32
    model = build_from_cfg(mcfg, MODELS)

    # init the full variable tree through the training loss (covers every
    # submodule the generation path touches) on a tiny batch
    from __graft_entry__ import _example_batch

    batch = _example_batch(B=2, npoints=NPOINTS)
    variables = jax.jit(lambda r, b: model.init(r, b, 0, method=AnchorDiffAE.loss))(
        {
            "params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
        },
        batch,
    )

    valid = jnp.ones((BATCH, 4), jnp.float32)

    def run(seed):
        out = sample_generation(
            model, variables, jax.random.PRNGKey(seed), BATCH, valid_id=valid
        )
        return out["pred"]

    # compile + warmup
    run(0).block_until_ready()
    for i in range(WARMUP):
        run(i + 1).block_until_ready()

    t0 = time.perf_counter()
    for i in range(ITERS):
        run(100 + i).block_until_ready()
    dt = time.perf_counter() - t0

    shapes_per_sec = BATCH * ITERS / dt
    n_chips = jax.device_count()
    result = {
        "metric": "chair_gen_2048pt_shapes_per_sec_per_chip",
        "value": round(shapes_per_sec / n_chips, 3),
        "unit": "shapes/sec/chip",
        "vs_baseline": round(shapes_per_sec / n_chips / REFERENCE_SHAPES_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
