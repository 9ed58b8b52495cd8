"""Gaussian math helpers.

Reproduces the reference's formulas exactly — including their quirks —
because training used them (reference: python/difffacto/utils/misc.py:281-317
and models/diffusions/diffusion_utils.py:5-19). In particular
``gaussian_log_likelihood`` uses ``-logvar`` (not ``-0.5*logvar``) and a
per-element constant of ``-0.5*log(2pi)*dim``; changing either would silently
change every prior/fit loss.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG_2PI = math.log(2.0 * math.pi)


def reparameterize_gaussian(rng, mean, logvar):
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)


def gaussian_entropy(logvar, axis=-1):
    """0.5*sum(logvar) + 0.5*D*(1+log(2pi)) over ``axis`` (misc.py:292-295)."""
    D = logvar.shape[axis]
    const = 0.5 * float(D) * (1.0 + LOG_2PI)
    return 0.5 * jnp.sum(logvar, axis=axis) + const


def gaussian_log_likelihood(z, mean=None, logvar=None, dim: int = 3):
    """Elementwise quasi-log-density (misc.py:300-317) — reference quirks kept:
    the logvar term is NOT halved and the 2pi constant is scaled by ``dim``
    per element."""
    log_z = -0.5 * LOG_2PI * dim
    if logvar is None:
        var = 1.0
        logvar = 0.0
    else:
        var = jnp.exp(logvar) if isinstance(logvar, jnp.ndarray) else math.exp(logvar)
    if mean is None:
        mean = 0.0
    return -logvar + log_z - (z - mean) ** 2 / (2.0 * var)


def standard_normal_logprob(z):
    dim = z.shape[-1]
    log_z = -0.5 * dim * LOG_2PI
    return log_z - z**2 / 2.0


def normal_kl(mean1, logvar1, mean2, logvar2, dim: int = 3):
    """KL between diagonal gaussians, elementwise (diffusion_utils.py:5-19)."""
    return 0.5 * (
        -dim
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + (mean1 - mean2) ** 2 * jnp.exp(-logvar2)
    )


def truncated_normal(rng, shape, mean=0.0, std=1.0, trunc_std=2.0, dtype=jnp.float32):
    z = jax.random.truncated_normal(rng, -trunc_std, trunc_std, shape, dtype)
    return z * std + mean
