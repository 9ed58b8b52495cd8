"""Per-point segmentation head.

Re-implements the reference segmentor (reference:
python/difffacto/models/segmentors/pointnet_segmentor.py:7-32): a PointNet
feature stack whose per-point features are concatenated with the global code
and classified per point (log-softmax output).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import ConvBNReLUStack, TorchBatchNorm
from ..utils.registry import SEGMENTORS


@SEGMENTORS.register_module()
class PointNetDenseCls(nn.Module):
    n_class: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, points, train: bool = False):
        """points (B, N, 3) -> (log_probs (B, N, n_class), global_feat (B, 1024))."""
        B, N, _ = points.shape
        h = ConvBNReLUStack((64, 128, 1024), relu_last=False, dtype=self.dtype, name="feat")(
            points, train=train
        )
        g = jnp.max(h, axis=1)  # (B, 1024)
        per_point = jnp.concatenate(
            [h[..., :64], jnp.broadcast_to(g[:, None], (B, N, 1024))], axis=-1
        )  # (B, N, 1088)
        x = per_point
        for f in (512, 256, 128):
            x = nn.Dense(f, dtype=self.dtype)(x)
            x = TorchBatchNorm(dtype=self.dtype)(x, use_running_average=not train)
            x = nn.relu(x)
        x = nn.Dense(self.n_class, dtype=self.dtype)(x)
        return jax.nn.log_softmax(x, axis=-1), g


class ConditionalBatchNorm1d(nn.Module):
    """CBN: two separate MLPs on a conditioning embedding predict per-channel
    delta-gamma/delta-beta added to fixed (non-trainable in the reference)
    base parameters (reference: models/modules/cbn.py:11-69). Matches the
    reference's parameter STRUCTURE (fc_gamma and fc_beta each
    Linear+ReLU+Linear) and its unbiased batch variance (torch.var default).

    The reference's own ``forward`` is broken as shipped — cbn.py:104 builds
    ``out = feature_normalized, gammas + betas`` (a tuple; the ``*`` was
    lost) — so this implements the evident intent ``x_hat * gamma + beta``;
    the delta-prediction path (create_cbn_input) IS runnable and is
    golden-tested in tests/test_reference_parity_supseg.py, which also pins
    the tuple defect."""

    channels: int
    embed_t_size: int = 128
    emb_size: int = 256
    use_betas: bool = True
    use_gammas: bool = True
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, cond, train: bool = False):
        """x (B, N, C), cond (B, embed_t_size)."""
        betas = self.param("betas", nn.initializers.zeros, (self.channels,))
        gammas = self.param("gammas", nn.initializers.ones, (self.channels,))

        def _mlp(name):
            h = nn.Dense(self.emb_size, dtype=self.dtype, name=f"{name}_0")(cond)
            return nn.Dense(self.channels, dtype=self.dtype, name=f"{name}_1")(
                nn.relu(h)
            )

        gamma = gammas[None] + (_mlp("fc_gamma") if self.use_gammas else 0.0)
        beta = betas[None] + (_mlp("fc_beta") if self.use_betas else 0.0)
        mu = x.mean(axis=(0, 1), keepdims=True)
        n = x.shape[0] * x.shape[1]
        var = x.var(axis=(0, 1), keepdims=True) * (n / max(n - 1, 1))
        xhat = (x - mu) * jax.lax.rsqrt(var + self.eps)
        return xhat * gamma[:, None, :] + beta[:, None, :]
