"""Pallas TPU kernel: fused LayerNorm -> GEGLU feed-forward -> residual.

The denoiser's per-block FF (dim 128, GEGLU inner 512) at 262k tokens writes
~1.6 GB of inner activations to HBM per diffusion step when left to XLA
(matmuls force materialization). This kernel tiles over tokens and keeps the
(tile, 2*inner) GEGLU activations in VMEM: HBM traffic drops to the x-in /
x-out tiles plus weights, turning the FF from bandwidth-bound into
compute-bound.

Used on the inference/sampling path (deterministic, no dropout); training
uses the unfused composition for autodiff + dropout. Parameters are passed
in explicitly so the flax module owns them under the same names as the
unfused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[:]  # (T, D) compute dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    h = h * scale_ref[:].astype(jnp.float32)[None, :] + bias_ref[:].astype(jnp.float32)[None, :]
    h = h.astype(x.dtype)
    # GEGLU: proj to 2*inner, a * gelu(g)
    hg = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:].astype(
        jnp.float32
    )
    inner = hg.shape[-1] // 2
    a, g = hg[:, :inner], hg[:, inner:]
    act = (a * jax.nn.gelu(g)).astype(x.dtype)
    out = jnp.dot(act, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:].astype(
        jnp.float32
    )
    o_ref[:] = x + out.astype(x.dtype)


@functools.partial(jax.jit, static_argnums=(7, 8))
def fused_ln_geglu_ff(x, ln_scale, ln_bias, w1, b1, w2, b2, tile: int = 1024,
                      interpret: bool = False):
    """x (T, D) -> x + FF(LN(x)); LN eps 1e-5 (torch LayerNorm parity).

    Shapes: w1 (D, 2*inner), b1 (2*inner,), w2 (inner, D), b2 (D,).
    T must be divisible by ``tile``.
    """
    T, D = x.shape
    assert T % tile == 0, (T, tile)
    two_inner = w1.shape[1]
    grid = (T // tile,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, two_inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((two_inner,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((two_inner // 2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, D), x.dtype),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w1, b1, w2, b2)


def pick_tile(T: int, preferred: int = 1024) -> int:
    """Largest power-of-two tile <= preferred dividing T (>=128), else 0."""
    t = preferred
    while t >= 128:
        if T % t == 0:
            return t
        t //= 2
    return 0
