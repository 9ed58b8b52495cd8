"""Latent normalizing flow (affine coupling) for the per-part prior.

Re-implements the reference coupling flow (reference:
python/difffacto/models/encoders/flow.py:7-79): 14 affine coupling layers
with alternating swaps per part code. The reference holds 4 independent
flows in a python list and loops over parts (part_encoders.py:1055-1060,
1148-1159); here the part axis is an ``nn.vmap`` with separate parameters,
so forward/reverse over all parts is one fused program.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class CouplingLayer(nn.Module):
    """Affine coupling: y2 = x2 * sigmoid(s+2) + t (flow.py:7-47)."""

    dim: int
    intermediate_dim: int
    swap: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, logpx=None, reverse: bool = False):
        d = self.dim - self.dim // 2
        if self.swap:
            x = jnp.concatenate([x[:, d:], x[:, :d]], axis=1)
        out_dim = x.shape[1] - d

        h = nn.Dense(self.intermediate_dim, dtype=self.dtype)(x[:, :d])
        h = nn.relu(h)
        h = nn.Dense(self.intermediate_dim, dtype=self.dtype)(h)
        h = nn.relu(h)
        # Glow-style zero init of the s/t head: every coupling layer starts as
        # a fixed affine map (scale=sigmoid(2), shift=0), so the UNTRAINED
        # inverse stays finite. The reference's torch-default init makes the
        # 14-layer untrained inverse overflow to inf/NaN (geometric blow-up of
        # 1/sigmoid terms); trained behavior is unaffected and torch-checkpoint
        # ingestion overwrites these params. Deliberate init-only delta.
        s_t = nn.Dense(
            out_dim * 2,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(h)
        scale = jax.nn.sigmoid(s_t[:, :out_dim] + 2.0)
        shift = s_t[:, out_dim:]
        logdetjac = jnp.sum(jnp.log(scale), axis=1, keepdims=True)

        if not reverse:
            y1 = x[:, d:] * scale + shift
            delta_logp = -logdetjac
        else:
            y1 = (x[:, d:] - shift) / scale
            delta_logp = logdetjac

        y = (
            jnp.concatenate([x[:, :d], y1], axis=1)
            if not self.swap
            else jnp.concatenate([y1, x[:, :d]], axis=1)
        )
        if logpx is None:
            return y
        return y, logpx + delta_logp


class SequentialFlow(nn.Module):
    """Chain of coupling layers; reverse runs them backwards (flow.py:50-72)."""

    depth: int
    dim: int
    intermediate_dim: int
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.chain = [
            CouplingLayer(
                self.dim, self.intermediate_dim, swap=(i % 2 == 0), dtype=self.dtype
            )
            for i in range(self.depth)
        ]

    def __call__(self, x, logpx=None, reverse: bool = False):
        inds = range(self.depth - 1, -1, -1) if reverse else range(self.depth)
        if logpx is None:
            for i in inds:
                x = self.chain[i](x, reverse=reverse)
            return x
        for i in inds:
            x, logpx = self.chain[i](x, logpx, reverse=reverse)
        return x, logpx


class PerPartFlow(nn.Module):
    """``n_class`` independent flows vmapped over the part axis.

    x: (B, K, D). Parameters and computation are independent per part,
    replacing the reference's ``nn.ModuleList`` python loop.
    """

    n_class: int
    depth: int
    dim: int
    intermediate_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, logpx=None, reverse: bool = False):
        flow = nn.vmap(
            SequentialFlow,
            in_axes=(1, 1 if logpx is not None else None, None),
            out_axes=1,
            variable_axes={"params": 0},
            split_rngs={"params": True},
        )
        mod = flow(self.depth, self.dim, self.intermediate_dim, dtype=self.dtype, name="flows")
        return mod(x, logpx, reverse)
