"""Device mesh + sharding helpers.

TPU-native replacement for the reference's DDP/NCCL machinery (reference:
python/difffacto/utils/dist_utils.py:9-62, runner/runner.py:61-73): instead
of process-per-GPU with gradient allreduce, ONE jitted program runs SPMD over
a ``jax.sharding.Mesh`` — batch sharded on the 'data' axis, parameters
replicated. XLA/GSPMD inserts the gradient reductions over ICI; batch-norm
statistics are computed over the *global* batch for free (the reference needs
opt-in SyncBatchNorm, runner.py:62-66).

Axes: 'data' (batch parallelism — training and generation) and optionally
'points' (sequence parallelism over the point-token axis — generation only).
Tensor/pipeline/expert axes are deliberately absent: DiffFacto is a
few-million-parameter model (SURVEY.md §2.6), so parameters replicate and
the scaling axes are batch and points-per-cloud (npoints=8192 for car,
configs/gen_car.py:90). The denoiser cross-attends each point token to only
4 context tokens, so a 'points' shard of the reverse chain needs ZERO
collectives — each device runs its point slice through the Pallas trunk
kernel against the replicated context. That makes dp x sp the natural
serving layout: 'points' cuts single-shape latency, 'data' adds throughput.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    axis_names: Sequence[str] = ("data",),
    mesh_shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    devs = np.asarray(devices)
    axis_names = tuple(axis_names)
    if len(axis_names) == 1:
        return Mesh(devs, axis_names)
    if axis_names != ("data", "points"):
        raise NotImplementedError(
            "supported meshes: 1-D ('data',) and 2-D ('data', 'points') — "
            "DiffFacto has no tensor/pipeline/expert axes at this scale"
        )
    if mesh_shape is None:
        mesh_shape = (1, devs.size)
    if int(np.prod(mesh_shape)) != devs.size:
        raise ValueError(f"mesh_shape {mesh_shape} != {devs.size} devices")
    return Mesh(devs.reshape(mesh_shape), axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict onto the mesh, batch-dim sharded.

    On a 2-D ('data', 'points') mesh, point-axis arrays (see
    ``parallel.train.POINT_AXIS_BATCH_KEYS``) additionally shard their
    second dimension over 'points'. A ragged final batch (size not
    divisible by the mesh) falls back to replicated placement — correct,
    just not sharded.
    """
    rep = replicated(mesh)
    has_points = "points" in mesh.axis_names and mesh.shape["points"] > 1
    nd = mesh.shape[mesh.axis_names[0]]
    np_ = mesh.shape["points"] if has_points else 1
    sh_data = NamedSharding(mesh, P(mesh.axis_names[0]))
    sh_dp = (
        NamedSharding(mesh, P(mesh.axis_names[0], "points")) if has_points else sh_data
    )

    if not (isinstance(batch, dict) and has_points):
        n = mesh.devices.size if not has_points else nd

        def put(x):
            if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % max(n, 1) == 0:
                return jax.device_put(x, sh_data)
            return jax.device_put(x, rep)

        return jax.tree_util.tree_map(put, batch)

    from .train import POINT_AXIS_BATCH_KEYS

    out = {}
    for k, x in batch.items():
        if not (hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % nd == 0):
            out[k] = jax.device_put(x, rep)
        elif k in POINT_AXIS_BATCH_KEYS and x.ndim >= 2 and x.shape[1] % np_ == 0:
            out[k] = jax.device_put(x, sh_dp)
        else:
            out[k] = jax.device_put(x, sh_data)
    return out


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def initialize_distributed(
    coordinator_address=None, num_processes=None, process_id=None, strict=False
):
    """Multi-host init (replaces torch init_dist/NCCL, dist_utils.py:9-24).

    No-op on a single process; on multi-host TPU pods the args usually come
    from the environment and can all be None. With ``strict`` (an EXPLICIT
    ``--launcher jax`` request) an init failure raises instead of silently
    degrading to independent single-host runs — a pod host training
    standalone against a shared work_dir corrupts the run.
    """
    if num_processes is not None and num_processes <= 1:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (ValueError, RuntimeError) as e:
        if strict:
            raise RuntimeError(
                f"--launcher jax requested but multi-host init failed: {e}"
            ) from e
        # Implicit call path: single process (no coordinator in the
        # environment) or already initialized — continue single-host, but
        # say so instead of swallowing the reason.
        print(f"[difffacto_tpu] multi-host init skipped: {e}")
        return False


def pmean_metrics(metrics, mesh: Optional[Mesh] = None):
    """Cross-device mean of logged scalars (replaces reduce_tensor,
    dist_utils.py:41-56). Under jit+GSPMD the reduction is automatic; this
    is for explicitly device-local values."""
    return jax.tree_util.tree_map(
        lambda x: jax.numpy.mean(jax.numpy.asarray(x)), metrics
    )
