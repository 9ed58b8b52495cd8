"""Latent-GAN components: generator, discriminators, losses.

Re-implements the reference's latent GAN baseline (reference:
python/difffacto/models/generators/generator.py:18, models/discriminators/
discriminator.py:7-120, utils/gan_losses.py, metrics/common.py:16-89): an MLP
generator over a (truncated) Gaussian prior producing part codes, plain and
class-conditional discriminators, WGAN/hinge losses with R1/gradient penalty.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import TorchBatchNorm
from ..utils.gaussian import truncated_normal
from ..utils.registry import DISCRIMINATORS, GENERATORS


@GENERATORS.register_module()
class Generator(nn.Module):
    """MLP latent generator (generators/generator.py:18-70): plain ReLU
    between hidden layers (the reference generator is NOT leaky, :65),
    optional per-layer BatchNorm and an output BatchNorm."""

    noise_dim: int = 64
    out_dim: int = 256
    hidden: Sequence[int] = (256, 512)
    use_bn: bool = False
    output_bn: bool = False
    truncate: bool = False
    trunc_std: float = 2.0
    n_class: int = 4
    per_part: bool = True
    dtype: Optional[jnp.dtype] = None

    def sample_noise(self, rng, num):
        shape = (num, self.n_class, self.noise_dim) if self.per_part else (num, self.noise_dim)
        if self.truncate:
            return truncated_normal(rng, shape, trunc_std=self.trunc_std)
        return jax.random.normal(rng, shape)

    @nn.compact
    def __call__(self, z, train: bool = False):
        h = z
        for f in self.hidden:
            h = nn.Dense(f, dtype=self.dtype)(h)
            if self.use_bn:
                h = TorchBatchNorm(dtype=self.dtype)(h, use_running_average=not train)
            h = nn.relu(h)
        h = nn.Dense(self.out_dim, dtype=self.dtype)(h)
        if self.output_bn:
            h = TorchBatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        return h


@DISCRIMINATORS.register_module()
class Discriminator(nn.Module):
    """MLP critic over latent codes (discriminators/discriminator.py:7-60):
    leaky ReLU 0.2, optional BatchNorm and/or LayerNorm per layer, optional
    sigmoid output."""

    in_dim: int = 256
    hidden: Sequence[int] = (512, 256, 128)
    use_bn: bool = False
    use_ln: bool = False
    use_sigmoid: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.reshape(x.shape[0], -1) if x.ndim > 2 else x
        for f in self.hidden:
            h = nn.Dense(f, dtype=self.dtype)(h)
            if self.use_bn:
                h = TorchBatchNorm(dtype=self.dtype)(h, use_running_average=not train)
            if self.use_ln:
                h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
            h = nn.leaky_relu(h, 0.2)
        h = nn.Dense(1, dtype=self.dtype)(h)[:, 0]
        return jax.nn.sigmoid(h) if self.use_sigmoid else h


@DISCRIMINATORS.register_module()
class DiscriminatorcGan(nn.Module):
    """Class-conditional critic (discriminator.py:64): condition one-hot
    concatenated to the code."""

    in_dim: int = 256
    n_class: int = 4
    hidden: Sequence[int] = (512, 256, 128)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, class_onehot, train: bool = False):
        h = x.reshape(x.shape[0], -1) if x.ndim > 2 else x
        h = jnp.concatenate([h, class_onehot], axis=-1)
        for f in self.hidden:
            h = nn.Dense(f, dtype=self.dtype)(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Dense(1, dtype=self.dtype)(h)[:, 0]


# ------------------------------------------------------------------ losses
def gen_loss(fake_scores, kind: str = "wgan"):
    """Generator loss (metrics/common.py gen_loss)."""
    if kind == "wgan":
        return -fake_scores.mean()
    if kind == "hinge":
        return -fake_scores.mean()
    if kind == "ns":
        return -jax.nn.log_sigmoid(fake_scores).mean()
    raise ValueError(kind)


def dis_loss(real_scores, fake_scores, kind: str = "wgan"):
    """Critic loss (metrics/common.py dis_loss)."""
    if kind == "wgan":
        return fake_scores.mean() - real_scores.mean()
    if kind == "hinge":
        return (
            jnp.maximum(0.0, 1.0 - real_scores).mean()
            + jnp.maximum(0.0, 1.0 + fake_scores).mean()
        )
    if kind == "ns":
        return (
            -jax.nn.log_sigmoid(real_scores).mean()
            - jnp.log1p(-jax.nn.sigmoid(fake_scores) + 1e-8).mean()
        )
    raise ValueError(kind)


def gradient_penalty(
    critic_fn, rng, real, fake, weight: float = 10.0, gp_type: str = "zero_center"
):
    """Gradient penalty, both reference flavors (metrics/common.py:47-87;
    utils/gan_losses.py:68-89 ships zero_center only, and it is the
    reference GanRunner default).

    ``zero_center``: (mean_b ||∇_x d(x_real)||)² · weight — penalizes the
    critic's gradient norm at REAL samples; note the reference squares the
    MEAN of per-sample norms, not the per-sample norms.
    ``interpolated``: standard WGAN-GP on random real/fake interpolates,
    with the reference's seps=1e-8 inside the sqrt.
    """
    if gp_type == "zero_center":
        grads = jax.grad(lambda x: critic_fn(x).sum())(real)
        norms = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=-1))
        return weight * norms.mean() ** 2
    if gp_type == "interpolated":
        eps = jax.random.uniform(rng, (real.shape[0],) + (1,) * (real.ndim - 1))
        interp = real * eps + fake * (1 - eps)
        grads = jax.grad(lambda x: critic_fn(x).sum())(interp)
        norms = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=-1) + 1e-8)
        return weight * ((norms - 1.0) ** 2).mean()
    raise ValueError(gp_type)
