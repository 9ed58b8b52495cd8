"""Profile the sampling path on the real TPU.

Two modes:
  depth sweep (default): time generation at denoiser depth 1/3/5 -> linear
    fit gives per-block cost (slope) and fixed per-step head/tail (intercept).
  --trace: dump a jax.profiler trace of one sampling batch to
    work_dirs/profile_sampling/ and print top self-time ops parsed from the
    .trace.json.gz.
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from difffacto_tpu.utils import install_tool_watchdog

install_tool_watchdog()  # tunnel hangs must not outlive the tool (VERDICT r2)

BATCH = 128
NPOINTS = 2048
T = 100


def build_run(depth: int):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _model_cfg
    from difffacto_tpu.models import AnchorDiffAE, sample_generation
    from difffacto_tpu.utils.registry import MODELS, build_from_cfg

    mcfg = _model_cfg(npoints=NPOINTS)
    mcfg["cimle_sample_num"] = 1
    mcfg["dtype"] = jnp.bfloat16
    mcfg["diffusion"]["net"]["depth"] = depth
    model = build_from_cfg(mcfg, MODELS)
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
        return sample_generation(
            model, variables, jax.random.PRNGKey(seed), BATCH, valid_id=valid
        )["pred"]

    return run


def time_run(run, iters=3):
    run(0).block_until_ready()
    run(1).block_until_ready()
    t0 = time.perf_counter()
    for i in range(iters):
        run(100 + i).block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    if args.trace:
        import jax

        run = build_run(5)
        run(0).block_until_ready()
        outdir = "work_dirs/profile_sampling"
        with jax.profiler.trace(outdir):
            run(1).block_until_ready()
        print("trace written to", outdir)
        files = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True)
        if files:
            with gzip.open(sorted(files)[-1], "rt") as f:
                trace = json.load(f)
            durs = {}
            for ev in trace.get("traceEvents", []):
                if ev.get("ph") == "X" and "dur" in ev:
                    name = ev.get("name", "?")
                    pid = ev.get("pid")
                    durs.setdefault((pid, name), [0, 0])
                    durs[(pid, name)][0] += ev["dur"]
                    durs[(pid, name)][1] += 1
            top = sorted(durs.items(), key=lambda kv: -kv[1][0])[:40]
            for (pid, name), (d, n) in top:
                print(f"{d/1e3:10.3f} ms  x{n:<6d} pid={pid}  {name[:110]}")
        return

    results = {}
    for depth in (1, 3, 5):
        dt = time_run(build_run(depth))
        results[depth] = dt
        print(f"depth={depth}: {dt*1e3:.1f} ms/batch  ({BATCH/dt:.1f} shapes/s)")
    # least-squares fit dt = a*depth + b
    xs = list(results)
    ys = [results[d] for d in xs]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    a = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    b = (sy - a * sx) / n
    print(f"per-block: {a*1e3/T:.3f} ms/step   fixed head/tail: {b*1e3/T:.3f} ms/step")
    print(f"block fraction at depth 5: {5*a/(5*a+b)*100:.1f}%")


if __name__ == "__main__":
    main()
