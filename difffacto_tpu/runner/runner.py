"""Runner: config-driven train / val / generation loops.

Re-implements the reference execution layer (reference:
python/difffacto/runner/runner.py:17-525) around jitted SPMD programs:

* the per-iteration train step is ONE compiled program (grads+clip+update);
* validation/generation run the lax.scan reverse chain per batch;
* CIMLE noise re-caching (runner.py:150-151, 158-182) is a jitted best-of-N
  fit-loss selection per batch with a host-side table write;
* ``generate_samples`` + ``evaluate_gen`` reproduce the val_gen benchmark
  protocol (runner.py:399-468): part-presence patterns from the empirical
  chair distribution, bbox normalization, metric suite.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.config import get_cfg, save_args, save_cfg
from ..data.dataset_utils import bbox_normalize, sample_part_presence
from ..metrics.eval import compute_all_metrics
from ..models import AnchorDiffAE, reconstruct, sample_generation, select_best_noise
from ..ops.points import fps
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..parallel.optim import build_optimizer_from_cfg
from ..parallel.train import TrainState, init_train_state, make_train_step
from ..utils import loggers as _loggers  # registers RunLogger in HOOKS
from ..utils.checkpoint import load_checkpoint, save_checkpoint, search_ckpt
from ..utils.registry import DATASETS, HOOKS, MODELS, build_from_cfg


def check_interval(step, interval):
    if step is None or interval is None:
        return False
    return step % interval == 0


_BATCH_KEYS = (
    "input",
    "ref",
    "ref_seg_mask",
    "seg_mask",
    "ref_attn_map",
    "attn_map",
    "present",
    "dp_present",
    "part_shift",
    "part_scale",
    "noise",
    "text",
    "part_indicator",
    "shift",
    "scale",
)


def cfgdict(x):
    """Config-or-dict -> plain dict (configs loaded from file are Config)."""
    if x is None:
        return None
    return x.dump() if hasattr(x, "dump") else dict(x)


def device_batch(batch: Dict, slim_attn: bool = False) -> Dict:
    """Numpy batch -> jnp arrays for the model (drops host-only keys).

    ``slim_attn=True`` (datasets whose ``attn_from_seg`` attribute guarantees
    ``attn_map == eye(K)[seg_mask]``) skips the (B, N, K) float32 one-hot
    maps and ships the seg masks as int8 — the jitted entry points rebuild
    the maps on device (``models.anchor_diff.ensure_attn_maps``).  At batch
    128 x 2048 points this halves the per-step host->device traffic.
    """
    out = {}
    for k in _BATCH_KEYS:
        if k in batch:
            if slim_attn and k in ("attn_map", "ref_attn_map"):
                continue
            v = np.asarray(batch[k])
            if slim_attn and k in ("seg_mask", "ref_seg_mask"):
                v = v.astype(np.int8)
            out[k] = jnp.asarray(v)
    return out


def make_pack_spec(batch: Dict, slim_attn: bool = False):
    """Layout for packing a host batch into TWO per-example arrays.

    Per-step host->device traffic through a transfer link pays a fixed cost
    per array; a standard batch is ~9 separate arrays.  Packing every float
    field into one (B, F) float32 buffer and the integer seg masks into one
    (B, I) int8 buffer makes it two transfers, unpacked inside the jitted
    step by free slice/reshape views (``parallel.train.unpack_batch``).

    Returns ``(float_entries, F, int_entries, I)`` with entries
    ``(key, offset, item_shape)``, or None when the batch has a field that
    doesn't fit the scheme (e.g. language token ids) — caller falls back to
    per-array transfers.  With ``slim_attn`` the one-hot attn maps are
    dropped (rebuilt on device from the masks, see ``ensure_attn_maps``).
    """
    f_entries, i_entries = [], []
    f_off = i_off = 0
    for k in _BATCH_KEYS:
        if k not in batch:
            continue
        if slim_attn and k in ("attn_map", "ref_attn_map"):
            continue
        v = np.asarray(batch[k])
        n = int(np.prod(v.shape[1:], dtype=np.int64))
        if k in ("seg_mask", "ref_seg_mask"):
            if v.max(initial=0) > 127:
                return None
            i_entries.append((k, i_off, tuple(v.shape[1:])))
            i_off += n
        elif np.issubdtype(v.dtype, np.floating):
            f_entries.append((k, f_off, tuple(v.shape[1:])))
            f_off += n
        else:
            return None
    if not f_entries:
        return None
    return (tuple(f_entries), f_off, tuple(i_entries), i_off)


def pack_batch(batch: Dict, spec) -> Dict:
    """Host batch -> {'f32': (B, F), 'i8': (B, I)} per make_pack_spec."""
    f_entries, F, i_entries, I = spec
    B = len(np.asarray(batch[f_entries[0][0]]))
    fbuf = np.empty((B, F), np.float32)
    for k, off, shp in f_entries:
        n = int(np.prod(shp, dtype=np.int64))
        fbuf[:, off : off + n] = np.asarray(batch[k], np.float32).reshape(B, -1)
    out = {"f32": jnp.asarray(fbuf)}
    if i_entries:
        ibuf = np.empty((B, I), np.int8)
        for k, off, shp in i_entries:
            n = int(np.prod(shp, dtype=np.int64))
            ibuf[:, off : off + n] = np.asarray(batch[k]).reshape(B, -1)
        out["i8"] = jnp.asarray(ibuf)
    return out


class Runner:
    def __init__(self, args=None, cfg=None):
        self.cfg = cfg if cfg is not None else get_cfg()
        cfg = self.cfg
        self.work_dir = cfg.work_dir
        os.makedirs(self.work_dir, exist_ok=True)
        self.logger = build_from_cfg(cfg.logger or dict(type="RunLogger"), HOOKS, work_dir=self.work_dir)

        self.max_epoch = cfg.max_epoch
        self.max_iter = cfg.max_iter
        self.checkpoint_interval = cfg.checkpoint_interval
        self.eval_interval = cfg.eval_interval
        self.log_interval = cfg.log_interval or 50
        self.save_num_batch = cfg.save_num_batch or 1
        self.max_norm = cfg.max_norm
        self.seed = getattr(args, "seed", None) or 0
        self.no_eval = bool(getattr(args, "no_eval", False))
        self.short_val = bool(getattr(args, "short_val", False))

        # model + data
        self.model: AnchorDiffAE = build_from_cfg(cfgdict(cfg.model), MODELS)
        self.train_loader, _ = build_from_cfg(cfgdict(cfg.dataset.train), DATASETS)
        self.val_loader, _ = build_from_cfg(cfgdict(cfg.dataset.val), DATASETS)
        self.iters_per_epoch = max(len(self.train_loader), 1)
        # Datasets that guarantee attn_map == eye(K)[seg_mask] opt in to the
        # slim host->device batch (one-hot maps rebuilt on device).
        self._slim_train = bool(
            getattr(getattr(self.train_loader, "dataset", None), "attn_from_seg", False)
        )
        self._slim_val = bool(
            getattr(getattr(self.val_loader, "dataset", None), "attn_from_seg", False)
        )

        # optimizer: reference's train_aligner / joint_train param groups
        # (runner.py:76-94) become a trainable filter / per-path lr scale
        trainable_filter = None
        lr_scale_fn = None
        if cfg.train_aligner:
            if cfg.joint_train:
                scale = cfg.lr_scale if cfg.lr_scale is not None else 1.0
                lr_scale_fn = lambda path: 1.0 if any("aligner" in p for p in path) else scale
            else:
                trainable_filter = lambda path: any("aligner" in p for p in path)
        self.tx = build_optimizer_from_cfg(
            cfgdict(cfg.optimizer) or dict(type="Adam", lr=1e-3),
            scheduler_cfg=cfgdict(cfg.scheduler),
            iters_per_epoch=self.iters_per_epoch,
            max_norm=self.max_norm,
            lr_scale_fn=lr_scale_fn,
        )
        # data mesh over the largest device count that divides the batch size
        bs = int(cfgdict(cfg.dataset.train)["batch_size"])
        n_dev = len(jax.devices())
        while n_dev > 1 and bs % n_dev != 0:
            n_dev -= 1
        self.mesh = make_mesh(jax.devices()[:n_dev])
        # Metric sweeps (pairwise CD/EMD — the 400v400 protocol's dominant
        # cost) shard their row/pair chunks over this mesh; the process
        # default also covers the dataset ``evaluate`` hooks, which call
        # metrics without runner context. Values are bit-identical to the
        # single-device sweep (tests/test_metrics_mesh.py). Gated on REAL
        # TPU devices: on a virtual multi-device CPU host (the test mesh)
        # sharding buys no wall-clock but pays padded dispatches and fresh
        # sharded-kernel compiles in every runner test — the sharded path is
        # covered there by the explicit mesh= tests and the driver dryrun.
        from ..metrics.eval import set_default_eval_mesh

        self._eval_metric_mesh = (
            self.mesh
            if self.mesh.size > 1 and jax.default_backend() == "tpu"
            else None
        )
        set_default_eval_mesh(self._eval_metric_mesh)
        # Optional dp x sp generation mesh (cfg.sp_devices = width of the
        # 'points' axis): the reverse chain shards the point-token axis too,
        # cutting single-shape latency — see parallel/mesh.py.
        self.gen_mesh = self.mesh
        sp = int(cfg.get("sp_devices", 0) or 0)
        if sp > 1:
            total = len(jax.devices())
            if total % sp == 0:
                self.gen_mesh = make_mesh(
                    jax.devices(), ("data", "points"), (total // sp, sp)
                )
            else:
                self.logger.print_log(
                    f"sp_devices={sp} does not divide {total} devices; "
                    "generation stays on the data mesh"
                )
        # >1 device: shard_map step (device-local Pallas kernels, psum'd
        # grads over ICI); single device: plain jit. cfg.train_sp_devices > 1
        # additionally shards the point axis of the TRAIN step (car-scale
        # npoints=8192 clouds; loss collectives in parallel/axes.py) — packed
        # transfers are incompatible with a points mesh and turn off.
        self._trainable_filter = trainable_filter
        self._step_mesh = self.mesh if n_dev > 1 else None
        train_sp = int(cfg.get("train_sp_devices", 0) or 0)
        if train_sp > 1:
            total = len(jax.devices())
            npoints = int(cfgdict(cfg.dataset.train).get("npoints", 0) or 0)
            if total % train_sp == 0 and (npoints == 0 or npoints % train_sp == 0):
                self._step_mesh = make_mesh(
                    jax.devices(), ("data", "points"), (total // train_sp, train_sp)
                )
            else:
                self.logger.print_log(
                    f"train_sp_devices={train_sp} does not divide devices/npoints; "
                    "training stays on the flat data mesh"
                )
        self._train_sp = (
            len(self._step_mesh.axis_names) > 1 if self._step_mesh is not None else False
        )
        self._skip_grad_norm = cfg.get("skip_grad_norm")
        self._step_fn = make_train_step(
            self.model, self.tx, trainable_filter=trainable_filter,
            mesh=self._step_mesh, skip_grad_norm=self._skip_grad_norm,
        )

        # state init from one example batch (subclasses override _init_variables
        # to touch their extra submodules)
        example = device_batch(next(iter(self.train_loader)))
        self.state = self._init_variables(example)
        self.state = jax.tree_util.tree_map(lambda x: replicate(self.mesh, x), self.state)

        self.epoch = 0
        self.iter = 0
        self.total_iter = (self.max_epoch or 0) * self.iters_per_epoch or self.max_iter

        self.cimle = bool(cfg.cimle)
        self.cimle_start_epoch = cfg.cimle_start_epoch or 0
        self.cache_interval = cfg.cimle_cache_interval

        save_cfg(os.path.join(self.work_dir, "config.yaml"))
        if args is not None:
            save_args(os.path.join(self.work_dir, "args.yaml"), args)

        # resume / pretrained
        if cfg.pretrained_weights:
            self.load(cfg.pretrained_weights, model_only=bool(cfg.model_only))
        if cfg.resume_path and not os.path.exists(self._norm_ckpt(cfg.resume_path)):
            # An EXPLICITLY configured checkpoint that's absent must abort —
            # silently evaluating fresh-init weights wastes an eval run and
            # produces numbers that look real.
            raise FileNotFoundError(
                f"cfg.resume_path does not exist: {cfg.resume_path}"
            )
        auto = cfg.get("auto_resume", True)
        resume = cfg.resume_path or (search_ckpt(self.work_dir) if auto else None)
        if resume and os.path.exists(self._norm_ckpt(resume)):
            self.load(self._norm_ckpt(resume), model_only=bool(cfg.model_only))

    def _init_variables(self, example):
        return init_train_state(self.model, self.tx, example, seed=self.seed)

    @staticmethod
    def _norm_ckpt(path):
        if path.endswith(".msgpack") or path.endswith(".pth"):
            return path
        return path + ".msgpack"

    # ----------------------------------------------------------------- io
    def load(self, path, model_only=False):
        if path.endswith(".pth"):
            from ..utils.torch_ingest import load_reference_checkpoint

            self.state = load_reference_checkpoint(path, self.model, self.state)
            self.logger.print_log(f"loaded reference torch weights from {path}")
            return
        self.state, meta = load_checkpoint(path, self.state, model_only=model_only)
        if not model_only:
            self.epoch = int(meta.get("epoch", 0))
            self.iter = int(meta.get("iter", self.epoch * self.iters_per_epoch))
        self.logger.print_log(f"resumed from {path} (epoch {self.epoch})")

    def save(self):
        path = save_checkpoint(
            self.work_dir,
            self.epoch,
            self.state,
            meta={"iter": self.iter, "config": self.cfg.dump()},
        )
        self.logger.print_log(f"saved checkpoint {path}")

    # --------------------------------------------------------------- loops
    @property
    def finish(self):
        if self.max_epoch:
            return self.epoch >= self.max_epoch
        return self.iter >= (self.max_iter or 0)

    def run(self):
        self.logger.print_log("Start running")
        trained = False
        saved_final = False
        while not self.finish:
            self.train_loader.set_epoch(self.epoch)
            if (
                self.cimle
                and self.epoch >= self.cimle_start_epoch
                and check_interval(self.epoch - self.cimle_start_epoch, self.cache_interval)
            ):
                self.cache_noise()
            self.train()
            trained = True
            if check_interval(self.epoch, self.eval_interval) and not self.no_eval:
                self.val()
            saved_final = check_interval(self.epoch, self.checkpoint_interval)
            if saved_final:
                self.save()
        # Always leave a final checkpoint: with checkpoint_interval unset (or
        # not dividing max_epoch) a completed run would otherwise save
        # NOTHING, and a follow-up --task val/val_gen in the same work_dir
        # auto-resumes fresh-init weights.
        if trained and not saved_final:
            self.save()

    def _train_transfer(self):
        """(step_fn, host_batch -> device pytree) for the train loop.

        On the first call, tries to derive a pack spec from one host batch
        (``make_pack_spec``): if the batch fits the two-buffer scheme, a
        pack-aware step is built and each iteration ships ONE f32 + ONE int8
        array instead of ~9 separate transfers.  ``DIFFFACTO_PACK_BATCH=0``
        falls back to per-array transfers.
        """
        if not hasattr(self, "_train_xfer"):
            spec = None
            if self._train_sp:
                # a packed (B, F) buffer can't shard its point axis
                spec = None
            elif os.environ.get("DIFFFACTO_PACK_BATCH", "1") != "0":
                try:
                    spec = make_pack_spec(next(iter(self.train_loader)), self._slim_train)
                except Exception:
                    spec = None
            if spec is not None:
                # Memoize the pack-aware step per spec: the spec changes when
                # a field's width changes (e.g. the CIMLE noise column after
                # the first cache_noise), and a fresh make_train_step closure
                # would re-trace even for an already-seen layout.
                cache = self.__dict__.setdefault("_packed_steps", {})
                fn = cache.get(spec)
                if fn is None:
                    fn = cache[spec] = make_train_step(
                        self.model, self.tx, trainable_filter=self._trainable_filter,
                        mesh=self._step_mesh, pack_spec=spec,
                        skip_grad_norm=self._skip_grad_norm,
                    )
                self._train_xfer = (fn, lambda b: pack_batch(b, spec))
            else:
                self._train_xfer = (
                    self._step_fn,
                    lambda b: device_batch(b, self._slim_train),
                )
        return self._train_xfer

    def train(self):
        rng = jax.random.PRNGKey(self.seed + 7919)
        # ips is a rolling rate over the last log window (not per-epoch:
        # small datasets have few steps per epoch, which made the per-epoch
        # rate mostly measure the epoch-boundary overhead).
        if not hasattr(self, "_rate_t"):
            self._rate_t, self._rate_iter = time.time(), self.iter
        # jax.profiler trace (replaces the reference's absent tracing story,
        # SURVEY.md §5.1): cfg.profile_epoch triggers one traced epoch dumped
        # under work_dir/profile.
        profiling = self.cfg.profile_epoch is not None and self.epoch == self.cfg.profile_epoch
        if profiling:
            jax.profiler.start_trace(os.path.join(self.work_dir, "profile"))
        step_fn, to_device = self._train_transfer()
        it = iter(self.train_loader)
        pending = next(it, None)
        pending = to_device(pending) if pending is not None else None
        while pending is not None:
            db = shard_batch(self._step_mesh or self.mesh, pending)
            self.state, metrics = step_fn(self.state, db, rng, self.epoch)
            # One-ahead prefetch: the device executes the (async-dispatched)
            # step while the host collates + transfers the next batch.
            nxt = next(it, None)
            pending = to_device(nxt) if nxt is not None else None
            self.iter += 1
            if check_interval(self.iter, self.log_interval):
                logd = {k: float(v) for k, v in metrics.items()}
                logd["epoch"] = self.epoch
                now = time.time()
                logd["ips"] = (self.iter - self._rate_iter) / max(now - self._rate_t, 1e-9)
                self._rate_t, self._rate_iter = now, self.iter
                self.logger.log(logd, step=self.iter, total_steps=self.total_iter)
        if profiling:
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
                self.state.params,
            )
            jax.profiler.stop_trace()
            self.logger.print_log(f"profile trace -> {self.work_dir}/profile")
        self.epoch += 1

    # --------------------------------------------------------------- CIMLE
    def cache_noise(self):
        """Best-of-N aligner noise per training shape (runner.py:158-182)."""
        self.logger.print_log("caching CIMLE noise")
        all_noise, all_ids = [], []
        rng = jax.random.PRNGKey(self.seed + self.epoch)
        variables = self.state.variables()
        for batch in self.train_loader:
            rng, sub = jax.random.split(rng)
            db = device_batch(batch, self._slim_train)
            _, _, selected = select_best_noise(self.model, variables, sub, db)
            # A single non-finite cached noise would poison every later step
            # that trains on that shape; zero is the distribution mean and a
            # safe fallback.
            all_noise.append(np.nan_to_num(np.asarray(selected), nan=0.0, posinf=0.0, neginf=0.0))
            all_ids.append(np.asarray(batch["id"]))
        self.train_loader.dataset.store_noise(all_noise, all_ids)
        # The cached noise changes the per-item 'noise' width -> the packed
        # layout must be re-derived (memoized per spec above).
        self.__dict__.pop("_train_xfer", None)

    # ----------------------------------------------------------------- val
    def _eval_batch(self, batch, rng) -> List[Tuple[Dict, str]]:
        """Eval forward for one batch (anchor_gen.py:1034-1128)."""
        variables = self.state.variables()
        db = device_batch(batch, self._slim_val)
        B = db["ref"].shape[0]
        K = self.model.cimle_sample_num if self.model.cimle else 1
        if self.model.gen:
            fixed = np.zeros(self.model.num_anchors, np.float32)
            if self.model.fix_part_ids:
                for i in self.model.fix_part_ids:
                    fixed[i] = 1
            out = sample_generation(
                self.model,
                variables,
                rng,
                B,
                valid_id=db["present"],
                fixed_id=jnp.asarray(fixed),
                epoch=self.epoch,
                ret_traj=self.model.ret_traj,
                mesh=self.gen_mesh if self.gen_mesh.size > 1 else None,
            )
            name = "gen_fixed" + "".join(map(lambda i: str(int(i)), fixed))
        else:
            noise = None
            if self.model.cimle:
                n, _, _ = select_best_noise(self.model, variables, rng, db, self.model.cimle_sample_num)
                noise = n  # (B, K, D): K hypotheses per shape
            out = reconstruct(
                self.model, variables, rng, db, noise=noise, epoch=self.epoch,
                ret_traj=self.model.ret_traj,
            )
            name = "sample"

        pred = {}
        arr = lambda x: np.asarray(x)
        full_pred = arr(out["pred"])  # (B*K, N, 3)
        seg_mask = arr(out["seg_mask"])
        if K > 1:
            r = full_pred.reshape(B, K, *full_pred.shape[1:])
            for i in range(K):
                pred[f"pred_sample {i}"] = r[:, i]
            pred["pred"] = r[:, 0]
            pred["pred_seg_mask"] = seg_mask.reshape(B, K, -1)[:, 0]
            pred["anchors"] = arr(out["anchors"]).reshape(B, K, *out["anchors"].shape[1:])[:, 0]
        else:
            pred["pred"] = full_pred
            pred["pred_seg_mask"] = seg_mask
            pred["anchors"] = arr(out["anchors"])
        if "traj" in out:
            traj = arr(out["traj"])  # (T_kept, B*K, N, 3)
            for ti, t in enumerate(np.asarray(out["traj_t"])):
                pred[f"traj_{int(t)}"] = traj[ti].reshape(B, K, -1, 3)[:, 0]
        pred["input"] = np.asarray(batch["input"])
        pred["input_ref"] = np.asarray(batch["ref"])
        pred["ref_seg_mask"] = np.asarray(batch["ref_seg_mask"])
        pred["seg_mask"] = np.asarray(batch["seg_mask"])
        pred["present"] = np.asarray(batch["present"])
        pred["shift"] = np.asarray(batch["shift"])
        pred["scale"] = np.asarray(batch["scale"])
        pred["token"] = batch["token"]
        return [(pred, name)]

    def val(self):
        self.logger.print_log(f"validation @ epoch {self.epoch}")
        results: Dict[str, List[Dict]] = {}
        rng = jax.random.PRNGKey(self.seed + 13)
        for i, batch in enumerate(self.val_loader):
            rng, sub = jax.random.split(rng)
            for pred, name in self._eval_batch(batch, sub):
                results.setdefault(name, []).append(pred)
            if self.short_val and i >= 1:
                break
        all_metrics = {}
        for name, res in results.items():
            save_dict, metrics = self.val_loader.evaluate(res, self.save_num_batch)
            out_dir = os.path.join(self.work_dir, "val")
            os.makedirs(out_dir, exist_ok=True)
            np.savez(
                os.path.join(out_dir, f"{name}_{self.epoch}.npz"),
                **{k: v for k, v in save_dict.items() if isinstance(v, np.ndarray)},
            )
            metrics = {f"{name}/{k}": v for k, v in metrics.items()}
            all_metrics.update(metrics)
            self.logger.log({k: float(v) for k, v in metrics.items()}, step=self.iter)
        return all_metrics

    # --------------------------------------------------- val_gen benchmark
    def generate_samples(self, num_gen: int = 400, batch: int = 128):
        """Unconditional generation protocol (runner.py:399-435)."""
        rng_np = np.random.RandomState(self.seed)
        variables = self.state.variables()
        preds = []
        rng = jax.random.PRNGKey(self.seed + 17)
        n_class = self.model.num_anchors
        remaining = num_gen
        while remaining > 0:
            b = min(batch, remaining)
            presence = sample_part_presence(rng_np, b, n_class)
            rng, sub = jax.random.split(rng)
            out = sample_generation(
                self.model,
                variables,
                sub,
                b,
                valid_id=jnp.asarray(presence),
                epoch=self.epoch,
                mesh=self.gen_mesh if self.gen_mesh.size > 1 else None,
            )
            K = self.model.cimle_sample_num if self.model.cimle else 1
            p = np.asarray(out["pred"]).reshape(b, K, -1, 3)[:, 0]
            preds.append(p)
            remaining -= b
        gen = np.concatenate(preds)[:num_gen]

        refs = []
        for vb in self.val_loader:
            refs.append(np.asarray(vb["ref"]))
        refs = np.concatenate(refs)
        return self.evaluate_gen(gen, refs)

    def evaluate_gen(self, gen: np.ndarray, refs: np.ndarray):
        """bbox-normalize + FPS->2048 + compute_all_metrics (runner.py:437-468)."""
        if gen.shape[1] > 2048:
            gen = np.asarray(fps(jnp.asarray(gen), 2048))
        if refs.shape[1] > 2048:
            refs = np.asarray(fps(jnp.asarray(refs), 2048))
        gen = bbox_normalize(gen)
        refs = bbox_normalize(refs)
        # Runner-lifetime memo of the ref-vs-ref pairwise block: the val set
        # is fixed, so per-checkpoint curve evals (tools/eval_ckpt_curve.py)
        # pay its ~S^2/2 EMD pairs only once.
        if not hasattr(self, "_ref_self_cache"):
            self._ref_self_cache = {}
        metrics = compute_all_metrics(
            gen, refs, batch_size=32, one_way=False,
            ref_self_cache=self._ref_self_cache,
            mesh=getattr(self, "_eval_metric_mesh", None),
        )
        self.logger.log({f"gen/{k}": float(v) for k, v in metrics.items()}, step=self.iter)
        return metrics
