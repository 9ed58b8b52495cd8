"""Optimizers and LR schedules (optax), registry-compatible.

Mirrors the reference registry surface (reference:
python/difffacto/optimizers/optimizers.py:4-17, schedulers.py:7-112) with
optax: optimizers take an epoch-indexed schedule multiplier so the reference
configs (LinearLR over epochs, etc.) load unchanged.

The torch pattern (optimizer object + stateful scheduler stepping per epoch)
becomes a pure ``lr(epoch) -> multiplier`` function composed with a base
optax transform — jit-friendly, checkpoint-free.
"""

from __future__ import annotations

import math
from bisect import bisect
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import optax

from ..utils.registry import OPTIMS, SCHEDULERS

Schedule = Callable[[float], float]


@SCHEDULERS.register_module()
def LinearLR(start_epoch, end_epoch, start_lr, end_lr):
    """Multiplier 1.0 until start_epoch, linear to end_lr/start_lr by end_epoch
    (schedulers.py:7-19)."""

    def lr_func(epoch):
        ratio = end_lr / start_lr
        total = end_epoch - start_epoch
        frac = jnp.clip((epoch - start_epoch) / total, 0.0, 1.0)
        return (1 - frac) * 1.0 + frac * ratio

    return lr_func


@SCHEDULERS.register_module()
def CustomStepLR(milestone: Sequence[int], gamma: float):
    """gamma^(number of milestones passed) (schedulers.py:21-28). The
    reference uses ``bisect`` (= bisect_right), so the drop applies AT the
    milestone epoch itself (epoch >= m), golden-tested in
    tests/test_reference_parity_sched.py."""
    ms = sorted(milestone)

    def lr_func(epoch):
        out = 1.0
        for m in ms:
            out = jnp.where(epoch >= m, out * gamma, out)
        return out

    return lr_func


@SCHEDULERS.register_module()
def StepLR(step_size: int, gamma: float = 0.1):
    def lr_func(epoch):
        return gamma ** jnp.floor(epoch / step_size)

    return lr_func


@SCHEDULERS.register_module()
def CosineAnnealingLR(T_max: int, eta_min: float = 0.0, base_lr: float = 1.0):
    def lr_func(epoch):
        lr = eta_min + (base_lr - eta_min) * (1 + jnp.cos(math.pi * epoch / T_max)) / 2
        return lr / base_lr

    return lr_func


@SCHEDULERS.register_module()
def CosineAnnealingLRWithWarmUp(
    T_max: int, eta_min: float = 0.0, warmup_T: int = 10, warmup_lr: float = 1e-6,
    base_lr: float = 1.0,
):
    """Linear warmup, then the reference's RECURSIVE cosine
    (schedulers.py:77-106), faithfully: the warmup interpolates toward the
    closed-form value AT warmup_T, but the post-warmup recursion rescales
    from the LAST WARMUP value (epoch warmup_T-1), so the whole cosine tail
    is multiplied by (warm(warmup_T-1)-eta_min)/(closed(warmup_T-1)-eta_min)
    — ~0.9 at the shipped geometry, a reference quirk kept as-is and
    golden-tested in tests/test_reference_parity_sched.py. Valid for
    epoch <= T_max - warmup_T (the reference's SGDR mirror branch past the
    first half-period is not modeled)."""
    T = T_max - warmup_T
    target = eta_min + (base_lr - eta_min) * (1 + math.cos(warmup_T * math.pi / T)) / 2
    anchor = warmup_lr + (target - warmup_lr) * ((warmup_T - 1) / warmup_T)
    denom = 1 + math.cos(math.pi * (warmup_T - 1) / T)

    def lr_func(epoch):
        warm = warmup_lr + (target - warmup_lr) * (epoch / warmup_T)
        cos = eta_min + (anchor - eta_min) * (1 + jnp.cos(math.pi * epoch / T)) / denom
        return jnp.where(epoch < warmup_T, warm, cos) / base_lr

    return lr_func


def _base_optimizer(kind: str, lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0):
    b1, b2 = betas
    if kind == "adam":
        tx = optax.adam(lr, b1=b1, b2=b2, eps=eps)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
        return tx
    if kind == "adamw":
        return optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    if kind == "adamax":
        tx = optax.adamax(lr, b1=b1, b2=b2, eps=eps)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
        return tx
    if kind == "sgd":
        return optax.sgd(lr)
    raise ValueError(kind)


def make_optimizer(
    kind: str,
    lr: float,
    schedule: Optional[Schedule] = None,
    iters_per_epoch: int = 1,
    max_norm: Optional[float] = None,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    lr_scale_fn=None,
) -> optax.GradientTransformation:
    """Compose clip-by-global-norm + base optimizer + epoch-indexed schedule.

    ``schedule`` maps epoch (float) -> lr multiplier; the reference steps its
    scheduler once per epoch (runner.py:155), reproduced by flooring
    step/iters_per_epoch. ``lr_scale_fn(path, param) -> scale`` implements the
    reference's per-group lr_scale for aligner-only training (runner.py:76-94).
    """
    if schedule is not None:
        lr_fn = lambda step: lr * schedule(jnp.floor(step / iters_per_epoch))
    else:
        lr_fn = lr
    tx = _base_optimizer(kind, lr_fn, betas=betas, eps=eps, weight_decay=weight_decay)
    chain = []
    if max_norm is not None:
        chain.append(optax.clip_by_global_norm(max_norm))
    chain.append(tx)
    if lr_scale_fn is not None:
        chain.append(_per_path_scale(lr_scale_fn))
    return optax.chain(*chain)


def _per_path_scale(scale_fn):
    """Scale updates per-parameter by ``scale_fn(path_tuple)``."""
    import jax

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        flat = jax.tree_util.tree_flatten_with_path(updates)
        scaled = jax.tree_util.tree_map_with_path(
            lambda path, u: u * scale_fn(tuple(str(p) for p in path)), updates
        )
        return scaled, state

    return optax.GradientTransformation(init, update)


def build_optimizer_from_cfg(optimizer_cfg, scheduler_cfg=None, iters_per_epoch=1,
                             max_norm=None, lr_scale_fn=None):
    """Build from reference-style config dicts
    (e.g. dict(type='Adam', lr=2e-3, weight_decay=0.))."""
    ocfg = dict(optimizer_cfg)
    kind = ocfg.pop("type").lower()
    lr = ocfg.pop("lr", 1e-3)
    schedule = None
    if scheduler_cfg is not None:
        scfg = dict(scheduler_cfg)
        s_type = scfg.pop("type")
        schedule = SCHEDULERS.get(s_type)(**scfg)
    return make_optimizer(
        kind,
        lr,
        schedule=schedule,
        iters_per_epoch=iters_per_epoch,
        max_norm=max_norm,
        betas=ocfg.pop("betas", (0.9, 0.999)),
        eps=ocfg.pop("eps", 1e-8),
        weight_decay=ocfg.pop("weight_decay", 0.0),
        lr_scale_fn=lr_scale_fn,
    )


OPTIMS.register_module("Adam", lambda **kw: build_optimizer_from_cfg(dict(type="Adam", **kw)))
OPTIMS.register_module("AdamW", lambda **kw: build_optimizer_from_cfg(dict(type="AdamW", **kw)))
OPTIMS.register_module("Adamax", lambda **kw: build_optimizer_from_cfg(dict(type="Adamax", **kw)))
