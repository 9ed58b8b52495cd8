"""Decompose the training step's wall-clock on the real TPU.

The full jitted step (fwd + bwd + clip + Adam) runs at ~174 ms f32 /
~154 ms bf16 at batch 128 x 2048 pts (tools/tpu_train_bench.py), far below
the denoiser-matmul roofline. This tool attributes the time by running each
SUBSET of the loss as its own chained training loop.

MEASUREMENT RULES (hard-won, CLAUDE.md LESSON 2):
* Repeated dispatches of one program through the axon tunnel are
  content-cached — a full 174 ms train step "measures" ~3 ms if its inputs
  repeat. Every loop here updates params with the measured gradients
  (params_{i+1} = params_i - 1e-12 * grads), so each dispatch's inputs
  genuinely differ and depend on the previous result.
* Never consume gradients as ``0.0 * sum(g)`` — XLA folds that to zero and
  dead-code-eliminates the whole backward pass.

Usage: python tools/tpu_train_profile.py [--bf16]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from difffacto_tpu.utils import install_tool_watchdog

install_tool_watchdog()  # tunnel hangs must not outlive the tool (VERDICT r2)

BATCH = 128
NPOINTS = 2048
ITERS = 10


def time_step_loop(step, params0, label, iters=ITERS):
    """step(params, seed) -> (params, loss); chained production-style."""
    import jax

    params, loss = step(params0, 0)
    params, loss = step(params, 1)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        params, loss = step(params, 100 + i)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:18s} {dt:7.1f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _model_cfg
    from difffacto_tpu.models import AnchorDiffAE
    from difffacto_tpu.models.anchor_diff import build_diffusion
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
        mcfg["dtype"] = jnp.bfloat16
        print("compute dtype: bfloat16")
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
    batch_stats = state.batch_stats

    diff = build_diffusion(model.diffusion, model.num_timesteps)
    B = BATCH
    K = model.num_anchors
    zdim = mcfg["encoder"]["encoder"]["zdim"]
    ctx0 = jnp.zeros((B, K, zdim + 6), mcfg.get("dtype") or jnp.float32)
    anchors0 = jnp.zeros((B, NPOINTS, 3), jnp.float32)
    variance0 = jnp.ones((B, NPOINTS, 3), jnp.float32)
    seg = batch["seg_mask"]
    valid = jnp.ones((B, K), jnp.float32)

    def sgd_step_of(loss_fn):
        """Build step(params, seed) -> (params - 1e-12*grad, loss)."""

        @jax.jit
        def step(params, seed):
            rng = jax.random.PRNGKey(seed)
            l, g = jax.value_and_grad(lambda p: loss_fn(p, rng))(params)
            new = jax.tree_util.tree_map(lambda p, gg: p - 1e-12 * gg.astype(p.dtype), params, g)
            return new, l

        return step

    def with_stats(params):
        v = {"params": params}
        if batch_stats:
            v["batch_stats"] = batch_stats
        return v

    # ---- full loss (= what make_train_step differentiates)
    def full_loss(params, rng):
        r1, r2 = jax.random.split(rng)
        losses, _ = model.apply(
            with_stats(params), batch, 0, method=AnchorDiffAE.loss,
            rngs={"sample": r1, "dropout": r2}, mutable=["batch_stats"],
        )
        return sum(jnp.mean(v) for k, v in losses.items() if "loss" in k)

    # ---- full production step (grads + clip + Adam), for reference
    prod = make_train_step(model, tx, donate=False)

    def prod_step(carry, seed):
        st = carry
        st, metrics = prod(st, batch, jax.random.PRNGKey(seed), 0)
        return st, metrics["total_loss"]

    time_step_loop(prod_step, state, "full prod step")
    time_step_loop(sgd_step_of(full_loss), state.params, "full f+b (sgd)")

    # ---- forward only, chained by feeding the loss back through params
    @jax.jit
    def fwd_step(params, seed):
        rng = jax.random.PRNGKey(seed)
        l = full_loss(params, rng)
        # perturb one leaf by the loss so the next dispatch's inputs differ
        new = jax.tree_util.tree_map(lambda p: p + 1e-12 * l.astype(p.dtype), params)
        return new, l

    time_step_loop(fwd_step, state.params, "full fwd only")

    # ---- encoder-only losses (fit + prior/kl; no diffusion)
    def enc_loss(params, rng):
        out, _ = model.apply(
            with_stats(params), batch, None, 0, True,
            method=AnchorDiffAE.encode,
            rngs={"sample": rng}, mutable=["batch_stats"],
        )
        loss_dict = out[4]
        return sum(jnp.mean(v) for k, v in loss_dict.items() if "loss" in k)

    time_step_loop(sgd_step_of(enc_loss), state.params, "encoder f+b (sgd)")

    # ---- denoiser-only mse with static ctx
    def den_loss(params, rng):
        v = with_stats(params)

        def model_fn(inp, ts, c, anc, var, sm, vid):
            return model.apply(
                v, inp, ts, c, anc, var, sm, vid, True,
                method=AnchorDiffAE.denoise, rngs={"dropout": rng},
            )

        t = jax.random.randint(rng, (B,), 0, model.num_timesteps)
        dl = diff.training_losses(
            model_fn, rng, batch["input"], t, anchors=anchors0,
            variance=variance0 if diff.learn_variance else None,
            ctx=ctx0, seg_mask=seg, valid_id=valid,
        )
        return dl["mse_loss"]

    time_step_loop(sgd_step_of(den_loss), state.params, "denoiser f+b (sgd)")


if __name__ == "__main__":
    main()
