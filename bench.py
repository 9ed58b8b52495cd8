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
V5E_PEAK_BF16_FLOPS = 197e12  # per-chip bf16 peak, TPU v5e

BATCH = 256  # +3% over 128 (head/tail amortization, CLAUDE.md ledger); serving-throughput config
NPOINTS = 2048
WARMUP = 1
ITERS = 3


def _stray_jax_clients():
    """Other python processes that could be holding the TPU tunnel.

    One stale JAX client blocks a fresh one for minutes (CLAUDE.md); a
    pre-bench sweep means driver benches never race a zombie tunnel client.
    The axon tunnel daemon itself (.tpu_init.py) is expected and excluded.
    """
    import glob

    # Everything in our own ancestor chain (bash/timeout wrappers quote
    # "bench.py" in their cmdline) must not count as a stray.
    skip = set()
    pid = os.getpid()
    while pid > 1 and pid not in skip:
        skip.add(pid)
        try:
            with open(f"/proc/{pid}/stat") as f:
                pid = int(f.read().rsplit(")", 1)[1].split()[1])
        except (OSError, ValueError, IndexError):
            break

    strays = []
    for path in glob.glob("/proc/[0-9]*/cmdline"):
        try:
            pid = int(path.split("/")[2])
            if pid in skip:
                continue
            with open(f"/proc/{pid}/comm") as f:
                comm = f.read().strip()
            if not comm.startswith("python"):
                continue
            with open(path, "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace").strip()
        except (OSError, ValueError):
            continue
        if ".tpu_init.py" in cmd:
            continue
        if any(t in cmd for t in ("pytest", "tools/", "bench.py", "run_net", "__graft_entry__")):
            strays.append((pid, cmd))
    return strays


def _await_quiet_tunnel(max_wait_s: float = 120.0):
    deadline = time.time() + max_wait_s
    strays = _stray_jax_clients()
    while strays and time.time() < deadline:
        print(
            f"bench: waiting for {len(strays)} stray JAX client(s) to exit: "
            + "; ".join(f"pid {p}: {c[:120]}" for p, c in strays),
            file=sys.stderr,
        )
        time.sleep(10)
        strays = _stray_jax_clients()
    if strays:
        print(
            "bench: WARNING — stray JAX clients still alive, bench numbers "
            "may be depressed: " + "; ".join(str(p) for p, _ in strays),
            file=sys.stderr,
        )


def _gen_flops_per_shape(mcfg) -> float:
    """Analytic FLOPs for one generated shape (denoiser dominates, >95%).

    Per point-token per block: q/out projections (2 D^2 MACs), GEGLU FF
    (D x 8D + 4D x D = 12 D^2 MACs), K-token cross-attention scores+sum
    (2 K D MACs); plus proj_in (in_ch -> D) and proj_out (D -> 2*out) per
    step. MAC = 2 FLOP. Matches the hand count behind BASELINE.md's
    reference estimate.
    """
    net = mcfg["diffusion"]["net"]
    D = net["n_heads"] * net["d_head"]
    K = net["n_class"]
    in_ch = net["in_channels"] + 6 + K  # x + per-point params + class one-hot
    out_ch = 2 * net["out_channels"]  # learned variance doubles the output
    per_tok = net["depth"] * (14 * D * D + 2 * K * D) + in_ch * D + D * out_ch
    return 2.0 * per_tok * mcfg["npoints"] * mcfg["num_timesteps"]


def main():
    _await_quiet_tunnel()
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

    n_chips = jax.device_count()
    mesh = None
    eff_batch = BATCH
    valid = jnp.ones((eff_batch, 4), jnp.float32)
    if n_chips > 1:
        # Aggregate mode (v5e-8 north star): per-chip batch stays BATCH, the
        # whole mesh generates BATCH * n_chips shapes per step through the
        # existing dp sharded-generation path. Headline value stays
        # shapes/sec/CHIP (total / n_chips) so driver parsing and baselines
        # are comparable; mesh totals ride along as extra fields.
        from difffacto_tpu.parallel import data_sharding, make_mesh

        mesh = make_mesh(jax.devices())
        eff_batch = BATCH * n_chips
        valid = jax.device_put(jnp.ones((eff_batch, 4), jnp.float32), data_sharding(mesh))

    def run(seed):
        out = sample_generation(
            model, variables, jax.random.PRNGKey(seed), eff_batch,
            valid_id=valid, mesh=mesh,
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

    shapes_per_sec = eff_batch * ITERS / dt
    per_chip = shapes_per_sec / n_chips
    result = {
        "metric": "chair_gen_2048pt_shapes_per_sec_per_chip",
        "value": round(per_chip, 3),
        "unit": "shapes/sec/chip",
        "vs_baseline": round(per_chip / REFERENCE_SHAPES_PER_SEC, 3),
        # achieved fraction of v5e bf16 peak, from the analytic per-shape
        # FLOP count — makes perf regressions attributable (VERDICT r2 #8)
        "mfu": round(_gen_flops_per_shape(mcfg) * per_chip / V5E_PEAK_BF16_FLOPS, 4),
    }
    if n_chips > 1:
        result["mesh_shapes_per_sec"] = round(shapes_per_sec, 3)
        result["mesh_devices"] = n_chips
    print(json.dumps(result))


if __name__ == "__main__":
    main()
