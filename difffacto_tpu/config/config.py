"""Config system: Python-module or YAML configs with ``_base_``/``_cover_``.

Reproduces the reference config surface (reference:
python/difffacto/config/config.py:16-171):

* a ``Config`` is a dict with attribute access returning ``None`` for
  missing keys;
* ``.py`` config files are imported and their module globals become the
  config; ``.yaml`` files are parsed with safe_load;
* ``_base_`` (str or list) pulls in parent configs depth-first, merged
  recursively; a dict carrying ``_cover_: True`` replaces instead of merges;
* ``name`` defaults to the config's file stem and ``work_dir`` to
  ``work_dirs/<name>``;
* a module-level singleton is exposed through ``init_cfg``/``get_cfg``/
  ``update_cfg``/``save_cfg``.
"""

from __future__ import annotations

import copy
import importlib.util
import inspect
import os
import sys
from collections import OrderedDict

import yaml

__all__ = ["Config", "get_cfg", "init_cfg", "update_cfg", "save_cfg", "save_args", "print_cfg"]

BASE_KEY = "_base_"
COVER_KEY = "_cover_"


class Config(OrderedDict):
    def __init__(self, *args):
        super().__init__()
        if len(args) == 1:
            self.load_from_file(args[0])
        else:
            assert len(args) == 0

    def __getattr__(self, name):
        if name in self:
            return self[name]
        return None

    def __setattr__(self, name, value):
        self[name] = value

    @staticmethod
    def _load_dict_from_file_no_base(filename):
        ext = os.path.splitext(filename)[1]
        if ext in (".yaml", ".yml"):
            with open(filename, "r") as f:
                cfg = yaml.safe_load(f.read())
        elif ext == ".py":
            # Import by explicit path so config files anywhere on disk work
            # and never collide with installed module names.
            module_name = "_difffacto_cfg_" + os.path.splitext(os.path.basename(filename))[0]
            spec = importlib.util.spec_from_file_location(module_name, filename)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[module_name] = mod
            try:
                spec.loader.exec_module(mod)
                cfg = {
                    name: value
                    for name, value in mod.__dict__.items()
                    if not name.startswith("__")
                }
            finally:
                del sys.modules[module_name]
        else:
            raise ValueError(f"unsupported config type: {filename}")
        return cfg

    @staticmethod
    def _load_dict_from_file(filename):
        cfg = Config._load_dict_from_file_no_base(filename)
        cfg_dir = os.path.dirname(filename)
        if BASE_KEY in cfg:
            base_filenames = cfg[BASE_KEY]
            if isinstance(base_filenames, str):
                base_filenames = [base_filenames]
            cfg_base: dict = {}
            for bfn in base_filenames:
                Config.merge_dict_b2a(
                    cfg_base, Config._load_dict_from_file(os.path.join(cfg_dir, bfn))
                )
            cfg = dict(cfg)
            cfg.pop(BASE_KEY)
            Config.merge_dict_b2a(cfg_base, cfg)
            cfg = cfg_base
        return cfg

    @staticmethod
    def merge_dict_b2a(a, b):
        """Deep-merge ``b`` into ``a``; ``_cover_`` replaces the subtree."""

        def clear_cover_key(x):
            if not isinstance(x, dict):
                return x
            out = copy.deepcopy(x)
            out.pop(COVER_KEY, None)
            for k, v in out.items():
                out[k] = clear_cover_key(v)
            return out

        assert isinstance(a, dict) and isinstance(b, dict)
        if COVER_KEY in b:
            a.clear()
            a.update(clear_cover_key(copy.deepcopy(b)))
            return
        for k, v in b.items():
            if (
                k not in a
                or (isinstance(v, dict) and v.get(COVER_KEY, False))
                or not isinstance(v, dict)
                or not isinstance(a[k], dict)
            ):
                a[k] = clear_cover_key(copy.deepcopy(v))
            else:
                Config.merge_dict_b2a(a[k], v)

    def load_from_file(self, filename):
        cfg = Config._load_dict_from_file(filename)
        self.clear()
        self.update(self.dfs(cfg))
        if self.name is None:
            self.name = os.path.splitext(os.path.basename(filename))[0]
        if self.work_dir is None:
            self.work_dir = f"work_dirs/{self.name}"

    def dfs(self, other):
        if isinstance(other, dict):
            now = Config()
            for k, d in other.items():
                if inspect.ismodule(d):
                    continue
                now[k] = self.dfs(d)
            return now
        if isinstance(other, list):
            return [self.dfs(d) for d in other if not inspect.ismodule(d)]
        return copy.deepcopy(other)

    def dump(self):
        """Convert Config to plain nested dicts (yaml-serializable)."""
        now = {}
        for k, d in self.items():
            if isinstance(d, Config):
                d = d.dump()
            if isinstance(d, list):
                d = [dd.dump() if isinstance(dd, Config) else dd for dd in d]
            now[k] = d
        return now


_cfg = Config()


def init_cfg(filename):
    _cfg.load_from_file(filename)


def get_cfg():
    return _cfg


def update_cfg(**kwargs):
    _cfg.update(kwargs)


def save_cfg(save_file):
    with open(save_file, "w") as f:
        f.write(yaml.dump(_cfg.dump()))


def save_args(save_file, args):
    with open(save_file, "w") as f:
        f.write(yaml.dump(args.__dict__))


def print_cfg():
    print(yaml.dump(_cfg.dump()))
