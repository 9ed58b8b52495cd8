"""String -> class registries and recursive config-driven builders.

TPU-native re-implementation of the reference registry layer
(reference: python/difffacto/utils/registry.py:1-63). The same 15 registry
names are exposed so the reference's config files (``type='AnchorDiffAE'``
etc.) resolve unchanged, but the registered objects are JAX/Flax modules and
factory functions rather than torch ``nn.Module`` classes.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    """A name -> callable registry with decorator-style registration."""

    def __init__(self, name: str):
        self._name = name
        self._modules: Dict[str, Callable] = {}

    @property
    def name(self) -> str:
        return self._name

    @property
    def modules(self) -> Dict[str, Callable]:
        return dict(self._modules)

    def register_module(self, name: Optional[str] = None, module: Optional[Callable] = None):
        """Register ``module`` under ``name`` (defaults to its __name__).

        Usable as ``@REG.register_module()`` or ``REG.register_module(module=f)``.
        """
        if module is not None:
            key = name or module.__name__
            if key in self._modules:
                raise KeyError(f"{key} already registered in {self._name}")
            self._modules[key] = module
            return module

        def _decorator(mod):
            self.register_module(name=name, module=mod)
            return mod

        return _decorator

    def get(self, key: str) -> Callable:
        if key not in self._modules:
            raise KeyError(
                f"'{key}' not found in registry '{self._name}'. "
                f"Available: {sorted(self._modules)}"
            )
        return self._modules[key]

    def __contains__(self, key: str) -> bool:
        return key in self._modules

    def __repr__(self) -> str:
        return f"Registry(name={self._name}, items={sorted(self._modules)})"


def build_from_cfg(cfg: Any, registry: Registry, **kwargs) -> Any:
    """Recursively build an object from a ``dict(type=..., **params)`` config.

    Mirrors reference ``build_from_cfg`` (utils/registry.py:20-46) without the
    vestigial jittor branch: dicts with a ``type`` key are looked up in
    ``registry`` and instantiated with the remaining keys (plus ``kwargs``
    overrides); other values pass through untouched. Extra ``kwargs`` that the
    target callable does not accept are dropped (the reference relies on
    ``**kwargs`` swallowing; we are explicit so plain functions work too).
    """
    if cfg is None:
        return None
    if isinstance(cfg, str):
        return registry.get(cfg)(**kwargs)
    if not isinstance(cfg, dict):
        return cfg
    cfg = dict(cfg)
    if "type" not in cfg:
        return cfg
    obj_type = cfg.pop("type")
    obj_cls = registry.get(obj_type) if isinstance(obj_type, str) else obj_type
    params = dict(cfg)
    for k, v in kwargs.items():
        params[k] = v
    # Drop kwargs the constructor can't take unless it accepts **kwargs.
    try:
        sig = inspect.signature(obj_cls)
        has_var_kw = any(
            p.kind is inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()
        )
        if not has_var_kw:
            params = {k: v for k, v in params.items() if k in sig.parameters}
    except (TypeError, ValueError):
        pass
    return obj_cls(**params)


# The same registry names the reference exposes (utils/registry.py:48-63).
DATASETS = Registry("DATASETS")
MODELS = Registry("MODELS")
ENCODERS = Registry("ENCODERS")
DECOMPOSERS = Registry("DECOMPOSERS")
DIFFUSIONS = Registry("DIFFUSIONS")
NETS = Registry("NETS")
SCHEDULERS = Registry("SCHEDULERS")
HOOKS = Registry("HOOKS")
LOSSES = Registry("LOSSES")
OPTIMS = Registry("OPTIMS")
SAMPLERS = Registry("SAMPLERS")
METRICS = Registry("METRICS")
SEGMENTORS = Registry("SEGMENTORS")
GENERATORS = Registry("GENERATORS")
DISCRIMINATORS = Registry("DISCRIMINATORS")
