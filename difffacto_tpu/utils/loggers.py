"""Run loggers: text file + JSONL scalar stream + console.

Mirrors the reference logger surface (reference:
python/difffacto/utils/loggers.py:8-64): ``RunLogger`` is the HOOKS-registered
composite the runner builds from ``cfg.logger``. The tensorboardX event file
becomes a JSONL scalar stream (``scalars.jsonl``) — trivially greppable and
plottable without a TB install; if tensorboardX happens to be importable it
is used additionally.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

from .registry import HOOKS


def current_time() -> str:
    return time.asctime(time.localtime(time.time()))


class TextLogger:
    def __init__(self, work_dir: str):
        os.makedirs(work_dir, exist_ok=True)
        self.path = os.path.join(work_dir, "log.txt")

    def log(self, data: Dict, step: Optional[int] = None):
        with open(self.path, "a") as f:
            parts = [f"{k}={v}" for k, v in data.items()]
            f.write(f"[{current_time()}] step={step} " + " ".join(parts) + "\n")

    def print_log(self, msg: str):
        with open(self.path, "a") as f:
            f.write(f"[{current_time()}] {msg}\n")


class ScalarLogger:
    """JSONL scalar stream, one record per log call."""

    def __init__(self, work_dir: str):
        os.makedirs(work_dir, exist_ok=True)
        self.path = os.path.join(work_dir, "scalars.jsonl")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter  # optional

            self._tb = SummaryWriter(os.path.join(work_dir, "tb"))
        except Exception:
            pass

    def log(self, data: Dict, step: Optional[int] = None):
        rec = {"step": step, "time": time.time()}
        for k, v in data.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in rec.items():
                if isinstance(v, float) and k not in ("time",):
                    self._tb.add_scalar(k, v, step)


@HOOKS.register_module()
class RunLogger:
    """Composite text + scalar + console logger (loggers.py:36-64)."""

    def __init__(self, work_dir: str):
        self.work_dir = work_dir
        self.text = TextLogger(work_dir)
        self.scalars = ScalarLogger(work_dir)
        self._t0 = time.time()

    def log(self, data: Dict, step: Optional[int] = None, total_steps: Optional[int] = None):
        self.text.log(data, step)
        self.scalars.log(data, step)
        eta = ""
        if total_steps and step:
            per = (time.time() - self._t0) / max(step, 1)
            rem = per * (total_steps - step)
            eta = f" eta={rem / 3600:.2f}h"
        parts = " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}" for k, v in data.items()
        )
        print(f"[{current_time()}] [{step}/{total_steps}]{eta} {parts}", flush=True)

    def print_log(self, msg: str):
        self.text.print_log(msg)
        print(f"[{current_time()}] {msg}", flush=True)


# Reference registers the sub-loggers too (loggers.py:8-35); TensorboardLogger
# maps to ScalarLogger (JSONL + optional TB backend).
HOOKS.register_module(name="TextLogger", module=TextLogger)
HOOKS.register_module(name="TensorboardLogger", module=ScalarLogger)
