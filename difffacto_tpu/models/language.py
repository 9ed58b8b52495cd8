"""Language components: LSTM text encoder, latent fusers, losses, tokenizer.

Re-implements the reference language-editing stack (reference:
python/difffacto/models/encoders/language_encoders.py:10-260,
models/networks/language_utils/language_util.py, metrics/common.py:7-13):

* ``LSTM``: word embedding -> LSTM -> bilinear word attention over valid
  timesteps (padding-aware; the torch pack/pad dance becomes a masked scan);
* ``MultiHeadCrossAttention`` / ``LatentLanguageFuser`` /
  ``PartLanguageSelector``: text-to-part-latent fusion heads;
* ``triplet_loss`` and the CLIP-style contrastive loss used by
  language_train_step (anchor_gen.py:534-574);
* a vocabulary/tokenizer utility (VOCAB_SIZE=2787 in the reference,
  anchor_gen.py:12).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.registry import ENCODERS

VOCAB_SIZE = 2787
PAD_IDX = 0


# ------------------------------------------------------------------- text
class Vocabulary:
    """Minimal word-level vocabulary (language_utils/language_util.py)."""

    def __init__(self, words: Optional[Sequence[str]] = None):
        self.word2idx: Dict[str, int] = {"<pad>": PAD_IDX, "<unk>": 1}
        for w in words or []:
            self.add(w)

    def add(self, w: str) -> int:
        if w not in self.word2idx:
            self.word2idx[w] = len(self.word2idx)
        return self.word2idx[w]

    def __len__(self):
        return len(self.word2idx)

    def encode(self, text: str, max_len: int = 24) -> np.ndarray:
        toks = re.findall(r"[a-z']+", text.lower())
        unk = self.word2idx.get("<unk>", 1)
        ids = [self.word2idx.get(t, unk) for t in toks][:max_len]
        out = np.zeros(max_len, np.int32)
        out[: len(ids)] = ids
        return out


_DEFAULT_VOCAB = Vocabulary(
    "a the chair with leg legs seat back arm arms rest four one thick thin "
    "wheel long short straight slanted tall square diamond".split()
)


def tokenizing(text: str, vocab: Optional[Vocabulary] = None, max_len: int = 24) -> np.ndarray:
    return (vocab or _DEFAULT_VOCAB).encode(text, max_len)


# ----------------------------------------------------------------- modules
@ENCODERS.register_module()
class LSTM(nn.Module):
    """Padding-aware LSTM + bilinear word attention (language_encoders.py:10-88)."""

    text_dim: int = 64
    embedding_dim: int = 100
    vocab_size: int = VOCAB_SIZE
    padding_idx: int = PAD_IDX
    dropout: float = 0.5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, padded_tokens, deterministic: bool = True):
        """padded_tokens (B, L) int -> (final_feat (B, text_dim), attn (B, L))."""
        B, L = padded_tokens.shape
        emb = nn.Embed(self.vocab_size, self.embedding_dim, name="word_embedding")(
            padded_tokens
        )
        emb = nn.Dropout(self.dropout)(emb, deterministic=deterministic)
        valid = (padded_tokens != self.padding_idx).astype(jnp.float32)  # (B, L)
        len_seq = valid.sum(axis=1).astype(jnp.int32)

        # nn.RNN with seq_lengths reproduces pack_padded_sequence semantics
        # (carry frozen past each sequence's end).
        rnn = nn.RNN(nn.OptimizedLSTMCell(self.text_dim), name="rnn")
        rnn_out = rnn(emb, seq_lengths=len_seq)  # (B, L, text_dim)
        idx = jnp.maximum(len_seq - 1, 0)
        h = jnp.take_along_axis(rnn_out, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]

        # bilinear attention: score_l = (R_l * w_attn) . h  (:64-88)
        w_attn = self.param(
            "w_attn", nn.initializers.xavier_uniform(), (1, self.text_dim), jnp.float32
        )
        score = jnp.einsum("bld,bd->bl", rnn_out * w_attn, h)
        score = jnp.where(valid.astype(bool), score, -1e9)
        attn = jax.nn.softmax(score, axis=1)
        final = jnp.einsum("bld,bl->bd", rnn_out, attn)
        return final, attn


@ENCODERS.register_module()
class MultiHeadCrossAttention(nn.Module):
    """Text/part cross attention with part-indicator slicing
    (language_encoders.py:90-126)."""

    src_channel: int
    tgt_channel: int
    out_channel: int
    qk_dim: int = 512
    nheads: int = 8
    scale: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, src, tgt, part_indicator, deterministic: bool = True):
        B, N, _ = src.shape
        M = tgt.shape[1]
        h = self.nheads
        qk_d = self.qk_dim // h
        v_d = self.out_channel // h
        Q = nn.Dense(self.qk_dim, name="Wq")(src).reshape(B, N, h, qk_d)
        K = nn.Dense(self.qk_dim, name="Wk")(tgt).reshape(B, M, h, qk_d)
        V = nn.Dense(self.out_channel, name="Wv")(tgt).reshape(B, M, h, v_d)
        scale = (1.0 / np.sqrt(qk_d)) if self.scale else 1.0
        qk = jnp.einsum("bnhd,bmhd->bhnm", Q, K) * scale
        qk = jax.nn.softmax(qk, axis=3)
        qk = nn.Dropout(0.1)(qk, deterministic=deterministic)
        qk = (qk * part_indicator.reshape(B, 1, -1, 1)).sum(2, keepdims=True)
        msg = jnp.einsum("bhnm,bmhd->bnhd", qk, V).reshape(B, -1, h * v_d)
        m2 = nn.Dense(self.out_channel, name="linear2")(
            nn.relu(nn.Dense(self.out_channel * 2, name="linear1")(msg))
        )
        msg = msg + nn.Dropout(0.1)(m2, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(msg)  # torch LN eps parity


@ENCODERS.register_module()
class LatentLanguageFuser(nn.Module):
    """Fuse a text latent into the referenced part latent
    (language_encoders.py:130-226). Core path (residual MLP fuser)."""

    text_dim: int
    part_dim: int
    num_part: int
    residual: bool = True
    cat_weights: bool = True
    mid_dim: int = 1024
    normalize_latent: bool = False
    regress_weights: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, part_latent, part_indicators, text_latent):
        """part_latent (B, K, part_dim); part_indicators (B, K); text (B, text_dim)
        -> (B, 1, K, part_dim) edited latents."""
        B, K, D = part_latent.shape
        if self.regress_weights:
            w = nn.Dense(128)(text_latent)
            w = nn.relu(w)
            w = nn.relu(nn.Dense(128)(w))
            weights = jax.nn.sigmoid(nn.Dense(self.num_part)(w))
        else:
            weights = part_indicators
        fused = nn.relu(nn.Dense(self.part_dim, name="fuser0")(part_latent.reshape(B, -1)))
        if self.cat_weights:
            fused = nn.relu(
                nn.Dense(self.part_dim, name="fuser1")(jnp.concatenate([fused, weights], -1))
            )
        else:
            fused = nn.relu(nn.Dense(self.part_dim, name="fuser1")(fused))
        fused = jnp.concatenate([text_latent, fused], axis=-1)[:, None]
        fused = nn.relu(nn.Dense(self.mid_dim, name="fuser2")(fused))
        fused = nn.Dense(self.part_dim, name="fuser4")(
            nn.relu(nn.Dense(self.mid_dim, name="fuser3")(fused))
        )
        ind = part_indicators.reshape(B, 1, K, 1)
        if self.residual:
            # residual edit: referenced parts get part_latent + fused delta
            edited = part_latent[:, None] + fused[:, :, None, :]
        else:
            edited = jnp.broadcast_to(fused[:, :, None, :], (B, 1, K, self.part_dim))
        out = (1 - ind) * part_latent[:, None] + ind * edited
        if self.normalize_latent:
            out = out / jnp.linalg.norm(out, axis=-1, keepdims=True)
        return out


@ENCODERS.register_module()
class PartLanguageSelector(nn.Module):
    """Select the part latent referenced by the indicator
    (language_encoders.py:228-250)."""

    text_dim: int = 64
    part_dim: int = 256
    out_channel: int = 256

    @nn.compact
    def __call__(self, src, tgt, part_indicator, deterministic: bool = True):
        part_id = jnp.argmax(part_indicator, axis=1).astype(jnp.int32)
        return jnp.take_along_axis(tgt, part_id[:, None, None], axis=1)


class ZeroMLP(nn.Module):
    """ReLU MLP with every layer zero-initialized (reference zero_module on
    the update MLP, anchor_gen.py:117) so language edits start as identity."""

    features: Sequence[int]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(
                f,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
            )(x)
            if i < len(self.features) - 1:
                x = nn.relu(x)
        return x


# ------------------------------------------------------------------ losses
def triplet_loss(anchor, pos, neg, thresh: float = 0.1):
    """Margin triplet on latent distances (metrics/common.py:7-13)."""
    pos_d = (anchor - pos) ** 2
    neg_d = (anchor - neg) ** 2
    l = (pos_d - neg_d + thresh).mean(1)
    return jnp.maximum(l, 0.0), pos_d.mean(), neg_d.mean()


def clip_style_loss(modified, target, distractor):
    """Binary CE on cosine similarities vs (target=1, distractor=0)
    (anchor_gen.py:560-567)."""
    nrm = lambda x: x / jnp.linalg.norm(x, axis=1, keepdims=True)
    m = nrm(modified)
    cands = jnp.stack([nrm(target), nrm(distractor)], axis=-1)
    cos = (m[..., None] * cands).sum(1)  # (B, 2)
    label = jnp.array([1.0, 0.0])[None]
    p = jax.nn.sigmoid(cos)
    bce = -(label * jnp.log(p + 1e-8) + (1 - label) * jnp.log(1 - p + 1e-8)).mean()
    return bce, cos
