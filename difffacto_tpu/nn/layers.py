"""Shared NN building blocks (Flax linen), channel-last everywhere.

Replaces the reference's torch layers with TPU-idiomatic equivalents:

* 1x1 ``Conv1d`` stacks become per-point ``Dense`` (identical math, better
  XLA fusion in channel-last layout);
* ``GEGLU``/``FeedForward`` mirror attention.py:50-94;
* ``timestep_embedding`` mirrors utils/misc.py:83-100 ([cos, sin] order);
* ``BatchNorm`` uses flax running stats to reproduce torch BatchNorm1d
  semantics (momentum 0.9 <-> torch 0.1) for checkpoint parity.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embeddings: (B,) -> (B, dim), [cos | sin] halves.

    Matches reference timestep_embedding (utils/misc.py:83-100).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def zeros_init():
    return nn.initializers.zeros


class ZeroDense(nn.Module):
    """Dense with zero-initialized kernel and bias (reference zero_module)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)


class GEGLU(nn.Module):
    """x, gate = proj(x).chunk(2); x * gelu(gate) (attention.py:50-57)."""

    dim_out: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype)(x)
        x, gate = jnp.split(h, 2, axis=-1)
        return x * jax.nn.gelu(gate)


class FeedForward(nn.Module):
    """Transformer MLP with optional GEGLU gate (attention.py:77-94)."""

    dim: int
    dim_out: Optional[int] = None
    mult: int = 4
    glu: bool = False
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        inner = int(self.dim * self.mult)
        dim_out = self.dim_out if self.dim_out is not None else self.dim
        if self.glu:
            h = GEGLU(inner, dtype=self.dtype)(x)
        else:
            h = jax.nn.gelu(nn.Dense(inner, dtype=self.dtype)(x))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(dim_out, dtype=self.dtype)(h)


class FusedLNFF(nn.Module):
    """Pre-LN GEGLU feed-forward with residual: ``x + FF(LN(x))``.

    Owns its parameters flat (ln scale/bias, w1/b1, w2/b2) so the sampling
    path can dispatch to the Pallas fused kernel (ops/fused_ff.py) — on TPU,
    deterministic mode — while training uses the same parameters through the
    unfused composition (autodiff + dropout).
    """

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        import jax as _jax

        D = self.dim
        inner = int(D * self.mult)
        ln_scale = self.param("ln_scale", nn.initializers.ones, (D,), jnp.float32)
        ln_bias = self.param("ln_bias", nn.initializers.zeros, (D,), jnp.float32)
        w1 = self.param(
            "w1", nn.initializers.lecun_normal(), (D, 2 * inner), jnp.float32
        )
        b1 = self.param("b1", nn.initializers.zeros, (2 * inner,), jnp.float32)
        w2 = self.param(
            "w2", nn.initializers.lecun_normal(), (inner, D), jnp.float32
        )
        b2 = self.param("b2", nn.initializers.zeros, (D,), jnp.float32)

        cdt = self.dtype or x.dtype
        import os as _os

        interp = (
            _jax.default_backend() != "tpu"
            and _os.environ.get("DIFFFACTO_PALLAS_INTERPRET", "") == "1"
        )
        use_fused = (
            deterministic
            and (_jax.default_backend() == "tpu" or interp)
            and x.ndim == 3
            and D % 128 == 0
        )
        if use_fused:
            from ..ops.fused_ff import fused_ln_geglu_ff, pick_tile

            B, N, _ = x.shape
            T = B * N
            tile = pick_tile(T)
            if tile:
                flat = x.reshape(T, D).astype(cdt)
                out = fused_ln_geglu_ff(
                    flat,
                    ln_scale.astype(cdt),
                    ln_bias.astype(cdt),
                    w1.astype(cdt),
                    b1,
                    w2.astype(cdt),
                    b2,
                    tile,
                    interp,
                )
                return out.reshape(B, N, D).astype(x.dtype)

        # Unfused composition (training / CPU / odd shapes) — same params.
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        h = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_scale + ln_bias
        h = h.astype(cdt)
        hg = h @ w1.astype(cdt) + b1.astype(cdt)
        a, g = jnp.split(hg, 2, axis=-1)
        act = a * jax.nn.gelu(g)
        act = nn.Dropout(self.dropout)(act, deterministic=deterministic)
        out = act @ w2.astype(cdt) + b2.astype(cdt)
        return x + out.astype(x.dtype)


class LNParams(nn.Module):
    """LayerNorm parameters without the compute.

    Produces the SAME param tree as ``nn.LayerNorm`` (``scale``/``bias``)
    so checkpoints stay interchangeable, but returns the raw params: callers
    that fuse the normalization into a Pallas kernel (ops/fused_core.py)
    apply it there, and the unfused paths use :func:`ln_affine`.
    """

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return scale, bias


class DenseParams(nn.Module):
    """Dense parameters without the compute — same param tree as ``nn.Dense``
    (``kernel``/``bias``) so checkpoints stay interchangeable; callers that
    fuse the projection into a Pallas kernel apply it there, unfused paths
    do ``x @ kernel + bias`` themselves."""

    in_dim: int
    out_dim: int
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", self.kernel_init, (self.in_dim, self.out_dim), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,), jnp.float32)
        return kernel, bias


def ln_affine(x, scale, bias, eps: float = 1e-5):
    """LayerNorm with explicit affine params; statistics in f32 — or wider if
    the input already is (f64 under the x64 train-dynamics goldens;
    promote_types keeps f32/bf16 production behavior bit-identical) — eps
    1e-5 (torch parity), output in x.dtype."""
    ln_dt = jnp.promote_types(jnp.float32, x.dtype)
    xf = x.astype(ln_dt)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * scale.astype(ln_dt) + bias.astype(ln_dt)
    return out.astype(x.dtype)


class MLP(nn.Module):
    """Plain ReLU MLP over the last axis (attention.py:60-75)."""

    features: Sequence[int]
    act: Callable = nn.relu
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype)(x)
            if i < len(self.features) - 1:
                x = self.act(x)
        return x


class SineLayer(nn.Module):
    """SIREN-style sine activation layer (reference nets/utils.py SineLayer),
    used by the denoiser's use_sine_proj_in option."""

    features: int
    is_first: bool = False
    omega_0: float = 30.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        if self.is_first:
            init = nn.initializers.uniform(scale=2.0 / in_f)  # ~U(-1/in, 1/in)
        else:
            bound = math.sqrt(6.0 / in_f) / self.omega_0
            init = nn.initializers.uniform(scale=2.0 * bound)

        def centered(key, shape, dtype=jnp.float32):
            return init(key, shape, dtype) - (1.0 / in_f if self.is_first else math.sqrt(6.0 / in_f) / self.omega_0)

        h = nn.Dense(self.features, kernel_init=centered, dtype=self.dtype)(x)
        return jnp.sin(self.omega_0 * h)


class TorchBatchNorm(nn.Module):
    """BatchNorm over the channel (last) axis with torch-compatible state.

    Torch BatchNorm1d(momentum=0.1) updates running stats as
    ``running = 0.9 * running + 0.1 * batch``; flax's ``momentum`` is the
    decay of the running average, so momentum=0.9 here.
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        # Under a sequence-parallel train step the batch statistics must span
        # ALL point shards of the (B, N) slab, or train-mode normalization
        # (and therefore the loss) would depend on the mesh layout. The data
        # axis intentionally stays local — reference DataParallel BN is also
        # per-replica (runner.py:62-66 SyncBN is opt-in), and the train step
        # pmean-merges the running stats after the update.
        from ..parallel.axes import point_axis

        return nn.BatchNorm(
            use_running_average=ura,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            axis_name=point_axis(),
        )(x)


class ConvBNReLUStack(nn.Module):
    """The reference's 1x1-conv + BN + ReLU point stack.

    ``features``: output channels per layer; ReLU after every layer except
    optionally the last (reference applies bn4 with no relu,
    pointnet.py:190-193).
    """

    features: Sequence[int]
    relu_last: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype)(x)
            x = TorchBatchNorm(dtype=self.dtype)(x, use_running_average=not train)
            if i < n - 1 or self.relu_last:
                x = nn.relu(x)
        return x
