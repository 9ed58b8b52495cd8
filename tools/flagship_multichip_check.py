"""Flagship-geometry multi-device equivalence check (opt-in tool).

The driver dryrun (__graft_entry__.py) deliberately slims the model to
denoiser depth 1 / flow depth 2 so it fits the driver's budget on this
1-core host; the sharding-equivalence tests (tests/test_parallel.py) use a
tiny model for the same reason. Both lean on the claim that sharding
correctness is depth-independent. This tool MEASURES that claim at the FULL
flagship geometry (reference configs/gen_chair.py: denoiser depth 5,
aligner depth 5, 4 x 14-layer flows) on the virtual 8-CPU mesh:

  1. eval-mode loss + grads: single device == (1, 8) points-only mesh
     (tight), and flat dp(2) == dp x sp (2, 4) (tight). Comparisons are
     LAYOUT-MATCHED on the data axis: with gen=True the part-code
     reparameterization draw depends on the per-device batch shape, so
     different data splits legitimately draw different noise (same design
     as tests/test_parallel.py). Eval mode because train-mode BN batch
     stats amplify f32 reduction-order noise ~300x/layer.
  2. one REAL optimizer step (grads + clip + adam) on the dp(8) mesh and
     the dp x sp (2, 4) mesh, finite losses.

Writes work_dirs/flagship_multichip.json. Warm-cache runtime is dominated
by the depth-5 fwd+bwd jits (~1 min); cold XLA-CPU compiles take several
minutes (the reason this is NOT in the driver dryrun).

Usage: python tools/flagship_multichip_check.py [--npoints 256] [--batch 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from difffacto_tpu.utils import install_tool_watchdog

install_tool_watchdog(3600.0)  # cold XLA-CPU compiles of depth-5 fwd+bwd


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--npoints", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--out", default="work_dirs/flagship_multichip.json")
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    if "xla_cpu_max_isa" not in flags:
        # keep stderr free of the same-host cpu_aot_loader false positives
        # (see __graft_entry__.dryrun_multichip)
        flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
    os.environ["XLA_FLAGS"] = flags
    import jax

    jax.config.update("jax_platforms", "cpu")
    from difffacto_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from difffacto_tpu.config import Config
    from difffacto_tpu.models import AnchorDiffAE
    from difffacto_tpu.models.anchor_diff import ensure_attn_maps
    from difffacto_tpu.parallel import (
        build_optimizer_from_cfg,
        init_train_state,
        make_mesh,
        make_train_step,
        replicate,
        shard_batch,
    )
    from difffacto_tpu.parallel.axes import points_sharded
    from difffacto_tpu.parallel.train import POINT_AXIS_BATCH_KEYS, parse_losses
    from difffacto_tpu.utils.registry import MODELS, build_from_cfg

    assert len(jax.devices()) >= args.devices, jax.devices()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config(os.path.join(repo, "configs/gen_chair.py"))
    mcfg = cfg.model.dump()
    mcfg["npoints"] = args.npoints
    mcfg["ret_traj"] = False
    # FULL flagship geometry — no slimming. This is the point of the tool.
    assert mcfg["diffusion"]["net"]["depth"] == 5
    assert mcfg["encoder"]["part_aligner"]["depth"] == 5
    assert mcfg["encoder"]["latent_flow_depth"] == 14
    model = build_from_cfg(mcfg, MODELS)

    B, N, K = args.batch, args.npoints, 4
    rng = np.random.RandomState(0)
    seg = np.repeat(np.arange(K), N // K)[None].repeat(B, 0)
    pts = rng.randn(B, N, 3).astype(np.float32) * 0.3
    batch = ensure_attn_maps(
        {
            "input": jnp.asarray(pts),
            "ref": jnp.asarray(pts),
            "ref_seg_mask": jnp.asarray(seg, jnp.int32),
            "seg_mask": jnp.asarray(seg, jnp.int32),
            "present": jnp.ones((B, K), jnp.float32),
            "dp_present": jnp.ones((B, K), jnp.float32),
            "part_shift": jnp.asarray(rng.randn(B, K, 3).astype(np.float32) * 0.1),
            "part_scale": jnp.asarray(
                np.abs(rng.randn(B, K, 3)).astype(np.float32) * 0.2 + 0.3
            ),
            "noise": jnp.zeros((B, 1), jnp.float32),
            # explicit t/noise overrides: the only per-point randomness in the
            # loss, so sharded layouts are numerically comparable
            "diffusion_t": jnp.asarray(
                np.random.RandomState(1).randint(0, 100, (B,)), jnp.int32
            ),
            "diffusion_noise": jnp.asarray(
                np.random.RandomState(2).randn(B, N, 3).astype(np.float32)
            ),
        }
    )

    tx = build_optimizer_from_cfg(
        dict(type="Adam", lr=2e-3, weight_decay=0.0), iters_per_epoch=1, max_norm=10.0
    )
    t0 = time.time()
    state = init_train_state(model, tx, batch)
    variables = state.variables()
    t_init = time.time() - t0

    def loss_fn(params, lbatch):
        v = {"params": params}
        if "batch_stats" in variables:
            v["batch_stats"] = variables["batch_stats"]
        outs = model.apply(
            v, lbatch, 0, train=False,
            method=AnchorDiffAE.loss,
            rngs={"sample": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(6)},
        )
        total, _ = parse_losses(outs)
        return total

    report = {"npoints": N, "batch": B, "devices": args.devices, "init_s": t_init}

    t0 = time.time()
    total_1d, grads_1d = jax.jit(jax.value_and_grad(loss_fn))(
        variables["params"], batch
    )
    grads_1d = jax.device_get(grads_1d)  # host-side: trees from different
    total_1d = float(total_1d)           # meshes can't be subtracted on-device
    report["single_device"] = {"loss": total_1d, "wall_s": time.time() - t0}

    def grad_delta(a, b):
        return max(
            jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(
                    lambda x, y: float(
                        np.abs(np.asarray(x) - np.asarray(y)).max()
                    ),
                    a,
                    b,
                )
            )
        )

    def grads_close(a, b, rtol=1e-4, atol=1e-5):
        """Per-leaf allclose, same tolerances as tests/test_parallel.py."""
        return all(
            jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(
                    lambda x, y: bool(
                        np.allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)
                    ),
                    a,
                    b,
                )
            )
        )

    def sp_specs_for(mesh):
        return {
            k: P("data", "points") if k in POINT_AXIS_BATCH_KEYS else P("data")
            for k in batch
        }

    def run_sp(mesh):
        def sp_local(params, lbatch):
            with points_sharded("points"):
                total, grads = jax.value_and_grad(loss_fn)(params, lbatch)
            axes = ("data", "points")
            return jax.lax.pmean(total, axes), jax.lax.pmean(grads, axes)

        return jax.jit(
            shard_map(
                sp_local, mesh=mesh,
                in_specs=(P(), sp_specs_for(mesh)),
                out_specs=(P(), P()),
                check_vma=False,
            )
        )(variables["params"], batch)

    # --- leg 1: single device == (1, 8) points-only mesh (same data split)
    mesh_sp = make_mesh(
        jax.devices()[: args.devices], ("data", "points"), (1, args.devices)
    )
    t0 = time.time()
    total_sp1, grads_sp1 = run_sp(mesh_sp)
    grads_sp1 = jax.device_get(grads_sp1)
    total_sp1 = float(total_sp1)
    d_sp1 = grad_delta(grads_sp1, grads_1d)
    report["sp_1x8_eval"] = {
        "loss": total_sp1,
        "loss_delta": abs(total_sp1 - total_1d),
        "grad_max_abs_delta": d_sp1,
        "wall_s": time.time() - t0,
    }

    # --- leg 2: flat dp(2) == dp x sp (2, 4) (same data split) ----------
    mesh_dp2 = make_mesh(jax.devices()[:2])

    def dp_local(params, lbatch):
        total, grads = jax.value_and_grad(loss_fn)(params, lbatch)
        return jax.lax.pmean(total, "data"), jax.lax.pmean(grads, "data")

    t0 = time.time()
    total_dp2, grads_dp2 = jax.jit(
        shard_map(
            dp_local, mesh=mesh_dp2,
            in_specs=(P(), {k: P("data") for k in batch}),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )(variables["params"], batch)
    grads_dp2 = jax.device_get(grads_dp2)
    total_dp2 = float(total_dp2)
    report["dp2_eval"] = {"loss": total_dp2, "wall_s": time.time() - t0}

    mesh_2d = make_mesh(
        jax.devices()[: args.devices], ("data", "points"), (2, args.devices // 2)
    )
    t0 = time.time()
    total_sp2, grads_sp2 = run_sp(mesh_2d)
    grads_sp2 = jax.device_get(grads_sp2)
    total_sp2 = float(total_sp2)
    d_sp2 = grad_delta(grads_sp2, grads_dp2)
    report["dpsp_2x4_eval"] = {
        "loss": total_sp2,
        "loss_delta_vs_dp2": abs(total_sp2 - total_dp2),
        "grad_max_abs_delta_vs_dp2": d_sp2,
        "wall_s": time.time() - t0,
    }

    ok = (
        np.isclose(total_sp1, total_1d, rtol=1e-5)
        and np.isclose(total_sp2, total_dp2, rtol=1e-5)
        and grads_close(grads_sp1, grads_1d)
        and grads_close(grads_sp2, grads_dp2)
    )
    report["sp_1x8_eval"]["grads_close"] = grads_close(grads_sp1, grads_1d)
    report["dpsp_2x4_eval"]["grads_close"] = grads_close(grads_sp2, grads_dp2)
    mesh_dp = make_mesh(jax.devices()[: args.devices])

    # --- real optimizer steps on both meshes ----------------------------
    for name, mesh in (("dp8_train_step", mesh_dp), ("dpsp_2x4_train_step", mesh_2d)):
        t0 = time.time()
        st = jax.tree_util.tree_map(lambda x: replicate(mesh, x), state)
        sb = shard_batch(mesh, batch)
        step = make_train_step(model, tx, donate=False, mesh=mesh)
        new_state, metrics = step(st, sb, jax.random.PRNGKey(0), 0)
        total = float(metrics["total_loss"])
        report[name] = {"total_loss": total, "wall_s": time.time() - t0}
        ok = ok and np.isfinite(total) and int(new_state.step) == 1

    report["ok"] = bool(ok)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    if not ok:
        print("FLAGSHIP MULTICHIP CHECK FAILED", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
