"""METRICS-registry components: distance/loss objects built from configs.

The reference registers these under the METRICS registry so models and
runners can build them from config dicts (reference:
python/difffacto/metrics/common.py:16-199, metrics/chamfer_dist/__init__.py:
28-100, metrics/emd/emd_module.py:76-87). The math here delegates to the
ops layer; torch's implicit-autograd gradient_penalty becomes an explicit
``jax.grad`` over the critic apply.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.chamfer import chamfer_split
from ..ops.emd import emd as emd_fn
from ..utils.registry import METRICS


def _drop_zero_rows(xyz):
    """ignore_zeros for batch-size 1 (chamfer_dist/__init__.py:39-43):
    rows summing to 0 are padding. Boolean masking is data-dependent, so this
    is a host-side (numpy) path like the reference's eval usage."""
    import numpy as np

    x = np.asarray(xyz)
    keep = np.abs(x[0]).sum(-1) != 0
    return jnp.asarray(x[:, keep])


@METRICS.register_module()
class ChamferDistanceL2:
    """Summed mean squared NN distance both ways (chamfer_dist/__init__.py:28)."""

    def __init__(self, ignore_zeros=False, reduce=True):
        self.ignore_zeros = ignore_zeros
        self.reduce = reduce

    def __call__(self, xyz1, xyz2):
        if self.ignore_zeros and xyz1.shape[0] == 1:
            xyz1, xyz2 = _drop_zero_rows(xyz1), _drop_zero_rows(xyz2)
        d1, d2 = chamfer_split(xyz1, xyz2)
        if self.reduce:
            return d1.mean() + d2.mean()
        return d1 + d2


@METRICS.register_module()
class ChamferDistanceL2_split:
    """Both directions separately (chamfer_dist/__init__.py:52)."""

    def __init__(self, ignore_zeros=False, reduce=True):
        self.ignore_zeros = ignore_zeros
        self.reduce = reduce

    def __call__(self, xyz1, xyz2):
        if self.ignore_zeros and xyz1.shape[0] == 1:
            xyz1, xyz2 = _drop_zero_rows(xyz1), _drop_zero_rows(xyz2)
        d1, d2 = chamfer_split(xyz1, xyz2)
        if self.reduce:
            return d1.mean(), d2.mean()
        return d1, d2


@METRICS.register_module()
class ChamferDistanceL1:
    """Mean of sqrt distances, averaged over directions
    (chamfer_dist/__init__.py:76)."""

    def __init__(self, ignore_zeros=False, reduce=True):
        self.ignore_zeros = ignore_zeros
        self.reduce = reduce

    def __call__(self, xyz1, xyz2):
        if self.ignore_zeros and xyz1.shape[0] == 1:
            xyz1, xyz2 = _drop_zero_rows(xyz1), _drop_zero_rows(xyz2)
        d1, d2 = chamfer_split(xyz1, xyz2)
        d1 = jnp.sqrt(jnp.maximum(d1, 0.0))
        d2 = jnp.sqrt(jnp.maximum(d2, 0.0))
        if self.reduce:
            return (d1.mean() + d2.mean()) / 2
        return (d1 + d2) / 2


@METRICS.register_module()
class EMD:
    """Auction EMD wrapper (emd_module.py:76-87)."""

    def __init__(self, eps, iters, dist_only=False):
        self.eps = eps
        self.iters = iters
        self.dist_only = dist_only

    def __call__(self, input1, input2):
        dist, assignment = emd_fn(input1, input2, self.eps, self.iters)
        if self.dist_only:
            return jnp.sqrt(jnp.maximum(dist, 0.0)).mean(1)
        return dist, assignment


@METRICS.register_module()
class SmoothCrossEntropy:
    """Label-smoothed CE (common.py:108-121)."""

    def __init__(self, alpha=0.1):
        self.alpha = alpha

    def __call__(self, pred, target):
        n_class = pred.shape[1]
        one_hot = jax.nn.one_hot(target.reshape(-1), n_class, dtype=pred.dtype)
        one_hot = one_hot * (1.0 - self.alpha + self.alpha / n_class) + (
            1.0 - one_hot
        ) * self.alpha / n_class
        log_prb = jax.nn.log_softmax(pred, axis=1)
        return -(one_hot * log_prb).sum(axis=1).mean()


@METRICS.register_module()
class NegativeGaussianLogLikelihood:
    """(common.py:124-141). Parity quirk kept: with an array ``var`` and
    reduction="mean", the per-sample var_term is NOT averaged (the reference
    returns the same non-scalar shape)."""

    def __init__(self, dim=3, reduction="mean"):
        self.dim = dim
        self.log_z = 0.5 * dim * math.log(2 * math.pi)
        self.reduction = reduction

    def __call__(self, z, mu, var=None):
        if var is None or isinstance(var, float):
            var_term = 0.0
            var = 1.0
        else:
            var_term = 0.5 * jnp.sum(jnp.log(var), axis=-1)
        quad = (z - mu) ** 2 / var
        if self.reduction == "mean":
            return self.log_z + var_term + quad.mean() / 2
        return self.log_z + var_term + quad / 2


@METRICS.register_module()
class CrossEntropy:
    """Sigmoid-distribution CE (common.py:144-156 — both sides pass through
    sigmoid, a reference quirk preserved as-is)."""

    def __init__(self, n_class=2, reduce=True):
        self.n_class = n_class
        self.reduce = reduce

    def __call__(self, pred, target):
        pred_prob = jax.nn.sigmoid(pred)
        target_prob = jax.nn.sigmoid(target)
        pred_dist = jnp.stack([pred_prob, 1 - pred_prob], axis=1)
        target_dist = jnp.stack([target_prob, 1 - target_prob], axis=1)
        loss = -(target_dist * jnp.log(jnp.maximum(pred_dist, 1e-30))).sum(axis=1)
        return loss.mean() if self.reduce else loss


@METRICS.register_module()
class L2Loss:
    """``var`` is accepted and ignored exactly like the reference
    (common.py:159-168)."""

    def __init__(self, reduction="mean"):
        self.reduction = reduction

    def __call__(self, source, target, var=None):
        diff = (source - target) ** 2
        return diff.mean() if self.reduction == "mean" else diff.mean(-1)


@METRICS.register_module()
class L1Loss:
    def __init__(self, reduction="mean"):
        self.reduction = reduction

    def __call__(self, source, target):
        return jnp.abs(source - target).mean()


@METRICS.register_module()
class SpectralContrastiveLoss:
    """(common.py:180-199): -2 a.p + (a.n)^2 over L2-normalized triplets."""

    def __call__(self, inp):
        anchor, pos, neg = inp[:, 0], inp[:, 1], inp[:, 2]
        norm = lambda t: t / jnp.maximum(
            jnp.linalg.norm(t, axis=1, keepdims=True), 1e-12
        )
        anchor, pos, neg = norm(anchor), norm(pos), norm(neg)
        ap = jnp.sum(anchor * pos, axis=1)
        an = jnp.sum(anchor * neg, axis=1)
        return (-2.0 * ap + an**2).mean()


def _register_gan_losses():
    """dis_loss / gen_loss / gradient_penalty (common.py:16-105) are already
    implemented functionally in models/gan.py; register them under the same
    METRICS type strings."""
    from ..models import gan as _gan

    METRICS.register_module(name="dis_loss", module=_gan.dis_loss)
    METRICS.register_module(name="gen_loss", module=_gan.gen_loss)
    METRICS.register_module(name="gradient_penalty", module=_gan.gradient_penalty)


_register_gan_losses()
