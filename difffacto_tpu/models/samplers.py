"""Timestep schedule samplers (reference: python/difffacto/samplers/sampler.py:8-49)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..utils.registry import SAMPLERS


@SAMPLERS.register_module()
@dataclasses.dataclass(frozen=True)
class Uniform:
    """Uniform timestep sampler: t ~ U{0..T-1}, weights = 1."""

    num_timesteps: int

    def sample(self, rng, batch_size: int):
        t = jax.random.randint(rng, (batch_size,), 0, self.num_timesteps)
        weights = jnp.ones((batch_size,), jnp.float32)
        return t, weights
