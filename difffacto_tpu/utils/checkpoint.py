"""Checkpoint save/load: msgpack pytrees + shape-tolerant partial restore.

Mirrors the reference checkpoint contract (reference:
python/difffacto/runner/runner.py:470-522): epoch-indexed checkpoints under
``work_dir/checkpoints/`` with a meta record (epoch/iter/config dump), full
train state, and a shape-mismatch-tolerant loader that drops unknown keys
(strict=False semantics). Torch pickles become msgpack'd JAX pytrees.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_checkpoint(work_dir: str, epoch: int, state, meta: Optional[Dict] = None) -> str:
    """Write ``checkpoints/ckpt_<epoch>.msgpack`` (+ ``.meta.json``)."""
    ckpt_dir = os.path.join(work_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"ckpt_{epoch}.msgpack")
    state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    with open(path.replace(".msgpack", ".meta.json"), "w") as f:
        json.dump({"epoch": epoch, **(meta or {})}, f)
    return path


def search_ckpt(work_dir: str) -> Optional[str]:
    """Newest checkpoint by epoch number (utils/misc.py:145-150)."""
    files = glob.glob(os.path.join(work_dir, "checkpoints/ckpt_*.msgpack"))
    if not files:
        return None
    return max(files, key=lambda p: int(re.search(r"ckpt_(\d+)", p).group(1)))


def _merge_partial(target, loaded, path=""):
    """Recursively copy ``loaded`` leaves into ``target`` where names AND
    shapes match; report skips (runner.py:492-522 semantics)."""
    skipped = []
    if isinstance(target, dict):
        out = {}
        for k, v in target.items():
            if isinstance(loaded, dict) and k in loaded:
                merged, sk = _merge_partial(v, loaded[k], f"{path}/{k}")
                out[k] = merged
                skipped += sk
            else:
                out[k] = v
                skipped.append(f"{path}/{k} (missing)")
        return out, skipped
    t = np.asarray(target)
    l = np.asarray(loaded)
    if t.shape != l.shape:
        return target, [f"{path} (shape {l.shape} != {t.shape})"]
    return l.astype(t.dtype), []


def load_checkpoint(
    path: str, target, model_only: bool = False, strict: bool = False
) -> Tuple[Any, Dict]:
    """Restore into ``target`` (a train-state-shaped pytree of arrays).

    model_only: restore params/batch_stats only, keep optimizer/step
    (two-stage training wiring, configs/train_chair_stage2.py).
    """
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    meta_path = path.replace(".msgpack", ".meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)

    target_dict = serialization.to_state_dict(target)
    if model_only:
        raw = {k: v for k, v in raw.items() if k in ("params", "batch_stats")}
    merged, skipped = _merge_partial(target_dict, raw)
    if strict and skipped:
        raise ValueError(f"missing/mismatched keys: {skipped}")
    if skipped:
        print(f"[checkpoint] skipped {len(skipped)} entries, e.g. {skipped[:5]}")
    return serialization.from_state_dict(target, merged), meta
