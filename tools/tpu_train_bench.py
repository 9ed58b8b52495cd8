"""Training-step throughput on the real TPU.

Measures the full jitted train step (encoder + aligner + flow prior +
q_sample + denoiser fwd/bwd + clip + Adam) for the flagship chair config at
the reference's batch 128 / 2048 points (reference schedule:
configs/train_chair_stage2.py) and prints shapes/sec and step time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from difffacto_tpu.utils import install_tool_watchdog

install_tool_watchdog()  # tunnel hangs must not outlive the tool (VERDICT r2)

BATCH = 128
NPOINTS = 2048
WARMUP = 2
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _model_cfg
    from difffacto_tpu.parallel import (
        build_optimizer_from_cfg,
        init_train_state,
        make_train_step,
    )
    from difffacto_tpu.utils.registry import MODELS, build_from_cfg

    mcfg = _model_cfg(npoints=NPOINTS)
    mcfg["gen"] = False
    mcfg["encoder"]["gen"] = False
    if "--bf16" in sys.argv:
        # bf16 module compute (params/optimizer/chain math stay f32).
        mcfg["dtype"] = jnp.bfloat16
        print("denoiser/encoder compute dtype: bfloat16")
    model = build_from_cfg(mcfg, MODELS)
    tx = build_optimizer_from_cfg(
        dict(type="Adam", lr=2e-3, weight_decay=0.0),
        scheduler_cfg=dict(
            type="LinearLR", start_lr=2e-3, end_lr=1e-4, start_epoch=4000,
            end_epoch=8000,
        ),
        iters_per_epoch=1,
        max_norm=10.0,
    )
    batch = _example_batch(B=BATCH, npoints=NPOINTS)
    state = init_train_state(model, tx, batch)
    step = make_train_step(model, tx, donate=True)

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state, metrics = step(state, batch, rng, 0)
    jax.block_until_ready(metrics)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"total_loss={float(metrics['total_loss']):.4f}")
    for i in range(WARMUP):
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 1), 0)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i), 0)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"train step: {dt * 1e3:.1f} ms  ({BATCH / dt:.1f} shapes/s)  "
          f"epoch(2658 chairs)={2658 / (BATCH / dt):.2f}s")


if __name__ == "__main__":
    main()
