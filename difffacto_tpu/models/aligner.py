"""Part-configuration samplers ("part aligner").

``PartAlignerTransformer`` re-implements the reference aligner (reference:
python/difffacto/models/encoders/part_encoders.py:20-143): a small
transformer over the K part tokens producing per-part (mean, logvar) in R^3,
with CIMLE noise injection modes 0-4 and optional class conditioning.
``PartAligner`` / ``PartAlignerCIMLE`` are the MLP alternates
(part_encoders.py:167-310).

Channel-last: part_code (B, K, C); outputs mean/logvar each (B, K, 3).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.attention import BasicTransformerBlock
from ..nn.layers import MLP, TorchBatchNorm
from ..utils.registry import ENCODERS


@ENCODERS.register_module()
class PartAlignerTransformer(nn.Module):
    in_channels: int
    n_heads: int
    d_head: int
    out_channels: int
    depth: int = 1
    dropout: float = 0.0
    n_class: int = 4
    use_checkpoint: bool = False
    single_attn: bool = False
    class_cond: bool = True
    mask_out_unreferenced_code: bool = True
    cimle: bool = False
    noise_dim: int = 32
    noise_scale: float = 10.0
    cimle_start_epoch: int = 0
    add_class_cond: bool = False
    cond_noise_type: int = 0
    use_linear: bool = True  # accepted for config parity; layout is always linear
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, part_code, valid_id=None, noise=None, deterministic: bool = True):
        """part_code (B, K, C) -> (mean (B, K, 3), logvar (B, K, 3)).

        ``noise``: (B, noise_dim) CIMLE latent; None or wrong-width noise is
        replaced by zeros (part_encoders.py:93-94).
        """
        B, K, _ = part_code.shape
        assert K == self.n_class
        inner = self.n_heads * self.d_head
        x = part_code

        if self.class_cond and not self.add_class_cond:
            eye = jnp.broadcast_to(jnp.eye(K, dtype=x.dtype)[None], (B, K, K))
            x = jnp.concatenate([x, eye], axis=-1)

        if self.cimle and self.cond_noise_type != 1:
            if noise is None or noise.shape[-1] != self.noise_dim:
                noise = jnp.zeros((B, self.noise_dim), x.dtype)
            noise = noise * self.noise_scale
            if self.cond_noise_type == 4:
                noise = MLP(
                    [4 * self.noise_dim, 4 * self.noise_dim, self.noise_dim],
                    dtype=self.dtype,
                    name="emb_layer",
                )(noise)
            if self.cond_noise_type in (0, 4):
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(noise[:, None], (B, K, self.noise_dim))], axis=-1
                )

        mask = valid_id if self.mask_out_unreferenced_code else None
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        if self.class_cond and self.add_class_cond:
            class_emb = self.param(
                "class_emb", nn.initializers.normal(1.0), (K, inner), jnp.float32
            )
            h = h + class_emb[None].astype(h.dtype)

        if self.cimle and self.cond_noise_type == 1:
            # Noise as an extra (masked-in) token (part_encoders.py:116-126).
            if noise is None or noise.shape[-1] != inner:
                tok_rng = self.make_rng("noise") if self.has_rng("noise") else None
                noise_tok = (
                    jax.random.normal(tok_rng, (B, inner), h.dtype)
                    if tok_rng is not None
                    else jnp.zeros((B, inner), h.dtype)
                )
                tok_mask = jnp.zeros((B, 1), h.dtype)
            else:
                noise_tok = noise.astype(h.dtype)
                tok_mask = jnp.ones((B, 1), h.dtype)
            noise_tok = noise_tok * self.noise_scale
            h = jnp.concatenate([noise_tok[:, None], h], axis=1)
            if mask is not None:
                mask = jnp.concatenate([tok_mask, mask], axis=1)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_norm")(h)
        elif self.cimle and self.cond_noise_type == 3:
            emb = nn.Dense(2 * inner, dtype=self.dtype, name="emb_layer")(jax.nn.silu(noise))
            shift, scale = jnp.split(emb, 2, axis=-1)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_norm")(h)
            h = h * (1.0 + scale[:, None]) + shift[:, None]
        elif not self.cimle:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_norm")(h)
        else:
            # Reference QUIRK (part_encoders.py:120-137): with cimle=True and
            # cond_noise_type not in (1, 3) — including the shipped configs'
            # type 0 — pre_norm is constructed but NEVER APPLIED. Instantiate
            # it (checkpoints carry its params; XLA DCEs the dead compute)
            # and skip its output, faithfully.
            _ = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_norm")(h)

        for i in range(self.depth):
            h = BasicTransformerBlock(
                dim=inner,
                n_heads=self.n_heads,
                d_head=self.d_head,
                dropout=self.dropout,
                context_dim=None,
                single_attn=self.single_attn,
                adaln=(self.cond_noise_type == 2),
                y_dim=self.noise_dim,
                dtype=self.dtype,
                name=f"block_{i}",
            )(h, None, mask, noise if self.cond_noise_type == 2 else None, deterministic)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="post_norm")(h)
        if self.cimle and self.cond_noise_type == 1:
            h = h[:, 1:]
        h = nn.Dense(self.out_channels, dtype=self.dtype, name="proj_out")(h)
        mean, logvar = h[..., :3], h[..., 3:6]
        return mean, logvar


@ENCODERS.register_module()
class PartAligner(nn.Module):
    """Plain MLP aligner over flattened part codes (part_encoders.py:256-310)."""

    n_class: int
    width: int
    dtype: Optional[jnp.dtype] = None

    def _branch(self, x, name, train):
        for i, f in enumerate((512, 256, 64)):
            x = nn.Dense(
                f,
                kernel_init=nn.initializers.normal(0.25),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name=f"fc{i + 1}_{name}",
            )(x)
            x = TorchBatchNorm(dtype=self.dtype, name=f"fc_bn{i + 1}_{name}")(
                x, use_running_average=not train
            )
            x = nn.relu(x)
        return nn.Dense(
            3 * self.n_class,
            kernel_init=nn.initializers.normal(0.25),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name=f"fc4_{name}",
        )(x)

    @nn.compact
    def __call__(self, part_code, valid_id=None, noise=None, deterministic: bool = True):
        B, K, C = part_code.shape
        x = part_code * valid_id[..., None]
        x = x.reshape(B, K * C)
        train = not deterministic
        # Reference emits (B, 3*K) reshaped to (B, 3, K) (part_encoders.py:310);
        # transpose to our channel-last (B, K, 3) so ingested .pth heads map 1:1.
        m = self._branch(x, "m", train).reshape(B, 3, self.n_class).transpose(0, 2, 1)
        v = self._branch(x, "v", train).reshape(B, 3, self.n_class).transpose(0, 2, 1)
        return m, v

    # CIMLE metadata used by the encoder (absent here).
    cimle: bool = False
    noise_dim: int = 32
    cimle_start_epoch: int = 0
