"""Diffusion schedule arrays for anchored DDPM.

All coefficients the reference computes in its diffusion constructor
(reference: python/difffacto/models/diffusions/anchored_diffusion.py:62-126)
are precomputed here in float64 numpy and packaged as a frozen pytree of
float32 device arrays, so the whole reverse chain can run inside one
``lax.scan`` with pure gathers — no per-step host work.

Includes the anchored posterior's third coefficient (``posterior_mean_coef3``,
reference :109-112) which has no analogue in vanilla DDPM.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def betas_for_alpha_bar(num_steps: int, alpha_bar, max_beta: float = 0.999) -> np.ndarray:
    """Cosine-style schedule from an alpha_bar function.

    Mirrors reference diffusion_utils.betas_for_alpha_bar (diffusion_utils.py:21-40).
    """
    betas = []
    for i in range(num_steps):
        t1 = i / num_steps
        t2 = (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def make_beta_schedule(num_timesteps: int, beta_1: float, beta_T: float, mode: str = "linear") -> np.ndarray:
    if mode == "linear":
        return np.linspace(beta_1, beta_T, num=num_timesteps, dtype=np.float64)
    if mode == "cosine":
        return betas_for_alpha_bar(
            num_timesteps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    raise ValueError(f"unknown beta schedule mode: {mode}")


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DiffusionSchedule:
    """Frozen container of all per-timestep coefficient arrays (float32)."""

    betas: jnp.ndarray
    log_betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    posterior_mean_coef3: jnp.ndarray
    # FIXED_LARGE variance option: append(posterior_variance[1], betas[1:])
    fixed_large_variance: jnp.ndarray
    fixed_large_log_variance: jnp.ndarray

    def tree_flatten(self):
        import dataclasses

        names = tuple(f.name for f in dataclasses.fields(self))
        return tuple(getattr(self, n) for n in names), names

    @classmethod
    def tree_unflatten(cls, names, children):
        return cls(**dict(zip(names, children)))

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def make_schedule(
    num_timesteps: int,
    beta_1: float,
    beta_T: float,
    mode: str = "linear",
    dtype=jnp.float32,
) -> DiffusionSchedule:
    """Build every coefficient array in float64 and cast once to ``dtype``.

    Matches reference AnchoredDiffusion.__init__ math exactly
    (anchored_diffusion.py:62-126).
    """
    betas = make_beta_schedule(num_timesteps, beta_1, beta_T, mode)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(
        np.append(posterior_variance[1], posterior_variance[1:])
    )
    posterior_mean_coef1 = betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_mean_coef2 = (
        (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
    )
    # The anchored-diffusion extra coefficient on the anchor term
    # (anchored_diffusion.py:109-112).
    posterior_mean_coef3 = 1.0 + (
        (np.sqrt(alphas_cumprod) - 1.0) * (np.sqrt(alphas_cumprod_prev) + np.sqrt(alphas))
    ) / (1.0 - alphas_cumprod)

    fixed_large_variance = np.append(posterior_variance[1], betas[1:])

    as_dev = lambda a: jnp.asarray(a, dtype=dtype)
    return DiffusionSchedule(
        betas=as_dev(betas),
        log_betas=as_dev(np.log(betas)),
        alphas_cumprod=as_dev(alphas_cumprod),
        alphas_cumprod_prev=as_dev(alphas_cumprod_prev),
        alphas_cumprod_next=as_dev(alphas_cumprod_next),
        sqrt_alphas_cumprod=as_dev(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=as_dev(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=as_dev(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=as_dev(posterior_variance),
        posterior_log_variance_clipped=as_dev(posterior_log_variance_clipped),
        posterior_mean_coef1=as_dev(posterior_mean_coef1),
        posterior_mean_coef2=as_dev(posterior_mean_coef2),
        posterior_mean_coef3=as_dev(posterior_mean_coef3),
        fixed_large_variance=as_dev(fixed_large_variance),
        fixed_large_log_variance=as_dev(np.log(fixed_large_variance)),
    )


def ddim_steps(
    num_timesteps: int, ddim_nsteps: int, discretize: str = "uniform"
) -> np.ndarray:
    """Timestep subset for DDIM sampling (anchored_diffusion.py:114-126)."""
    if discretize == "uniform":
        skip = num_timesteps // ddim_nsteps
        return np.arange(0, num_timesteps, skip, dtype=np.int32)
    if discretize == "quad":
        return (
            np.linspace(0.0, math.sqrt(num_timesteps * 0.8), ddim_nsteps) ** 2
        ).astype(np.int32)
    raise NotImplementedError(discretize)


def ddim_xt_dir_coeff(
    schedule_betas: np.ndarray, ddim_eta: float
) -> np.ndarray:
    """sqrt(1 - alpha_bar - eta^2 * posterior_var) (anchored_diffusion.py:116)."""
    betas = np.asarray(schedule_betas, dtype=np.float64)
    alphas_cumprod = np.cumprod(1.0 - betas)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    return np.sqrt(1.0 - alphas_cumprod - ddim_eta * ddim_eta * posterior_variance)


def extract(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-batch coefficients and reshape for broadcasting.

    ``arr``: (T,) coefficient array; ``t``: (B,) int timesteps; result has
    shape (B, 1, ..., 1) with ``ndim`` total dims. Equivalent to the
    reference's ``extract_into_tensor`` (diffusion_utils.py:42-54).
    """
    out = jnp.take(arr, t, axis=0)
    return out.reshape(out.shape + (1,) * (ndim - 1))
