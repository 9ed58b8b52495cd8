"""Latent-editing and language-game models.

* ``ParameterTrainer`` (reference: networks/anchor_gen_parameter_trainer.py:6)
  — trains only the part encoder's fit losses (aligner supervision).
* ``LatentDiffEdit`` (networks/latent_diffusion.py:12-140) — a latent
  diffusion that edits the target shape's part latents conditioned on a
  language code and the distractor's latents.
* ``PartglotClassifier`` (networks/listener.py) — the listener: scores how
  well a text refers to a shape's parts (cross-attention + MLP logit).
* ``PartLatentEditor`` (networks/part_editing.py:13-200) — supervised latent
  editing with a frozen listener: fuse text into part latents, optimize
  direction/magnitude/logit losses.
* ``AnchorDiffGenSuperSegments`` (networks/anchor_gen_supseg.py:27) — the
  AnchorDiffAE orchestrator over PartGlot super-segments (more, finer part
  slots; same machinery).
* ``PartglotFinetune`` (networks/partglot_finetune.py) — listener-guided
  finetuning step for the generator's language path.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import MLP, TorchBatchNorm
from ..utils.registry import (
    DECOMPOSERS,
    DIFFUSIONS,
    ENCODERS,
    METRICS,
    MODELS,
    NETS,
    SAMPLERS,
    build_from_cfg,
)
from .anchor_diff import AnchorDiffAE, build_diffusion


@MODELS.register_module()
class ParameterTrainer(nn.Module):
    """Train only the encoder's part-parameter fit (anchor_gen_parameter_trainer.py:6-36)."""

    encoder: dict
    num_anchors: int
    npoints: int = 2048
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.encoder_mod = build_from_cfg(dict(self.encoder), ENCODERS, dtype=self.dtype)

    def loss(self, batch, epoch=0) -> Dict[str, jnp.ndarray]:
        _, _, _, _, loss_dict, _ = self.encoder_mod(batch, epoch=epoch, train=True)
        return loss_dict


@MODELS.register_module()
class PartglotClassifier(nn.Module):
    """Listener: does this text refer to this shape's parts?
    (networks/listener.py). Cross-attend text over part latents -> logit."""

    text_dim: int = 64
    part_dim: int = 256
    num_part: int = 4
    language_encoder: Optional[dict] = None
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        from .language import LSTM, MultiHeadCrossAttention

        self.language_enc = build_from_cfg(
            dict(self.language_encoder or dict(type="LSTM", text_dim=self.text_dim)),
            ENCODERS,
        )
        self.xattn = MultiHeadCrossAttention(
            src_channel=self.text_dim,
            tgt_channel=self.part_dim,
            out_channel=self.part_dim,
            nheads=4,
            qk_dim=128,
        )

    @nn.compact
    def __call__(self, part_latent, text, part_indicator, train: bool = False):
        """part_latent (B, K, part_dim); text (B, L); part_indicator (B, K)
        -> logits (B,)."""
        tfeat, _ = self.language_enc(text, deterministic=not train)
        msg = self.xattn(
            tfeat[:, None, :], part_latent, part_indicator, deterministic=not train
        )[:, 0]
        h = nn.Dense(512, dtype=self.dtype)(msg)
        h = TorchBatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Dense(128, dtype=self.dtype)(h)
        h = TorchBatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        h = nn.relu(h)
        return nn.Dense(1, dtype=self.dtype)(h)[:, 0]

    def listener_loss(self, part_latent_pos, part_latent_neg, text, part_indicator,
                      train: bool = True):
        """Contrastive target-vs-distractor cross entropy."""
        lp = self(part_latent_pos, text, part_indicator, train=train)
        ln = self(part_latent_neg, text, part_indicator, train=train)
        logits = jnp.stack([lp, ln], axis=-1)
        return {
            "listener_loss": -jax.nn.log_softmax(logits, axis=-1)[:, 0].mean(),
            "listener_acc": (logits[:, 0] > logits[:, 1]).mean(),
        }


@MODELS.register_module()
class LatentDiffEdit(nn.Module):
    """Language-conditioned latent diffusion editing (latent_diffusion.py:12-140):
    denoise the TARGET's part latents conditioned on the distractor's latents
    and the language code."""

    encoder: dict
    diffusion: dict
    sampler: dict
    language_encoder: dict
    num_anchors: int
    num_timesteps: int
    pcd_mixer: Optional[dict] = None
    guidance: bool = False
    part_latent_dropout_prob: float = 0.1
    language_latent_dropout_prob: float = 0.1
    zero_part_latent: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.encoder_mod = build_from_cfg(
            dict(self.encoder), ENCODERS, num_anchors=self.num_anchors, dtype=self.dtype
        )
        self.language_enc = build_from_cfg(dict(self.language_encoder), ENCODERS)
        self.mixer = (
            build_from_cfg(dict(self.pcd_mixer), DECOMPOSERS,
                           num_anchors=self.num_anchors, dtype=self.dtype)
            if self.pcd_mixer
            else None
        )
        self.net = build_from_cfg(dict(self.diffusion["net"]), NETS, dtype=self.dtype)
        self.diff = build_diffusion(self.diffusion, self.num_timesteps)
        self.t_sampler = build_from_cfg(
            dict(self.sampler), SAMPLERS, num_timesteps=self.num_timesteps
        )

    def encode_pair(self, target, distractor, target_attn, distractor_attn, train=False):
        B, N = target.shape[:2]
        x = jnp.stack([target, distractor], 1).reshape(B * 2, N, 3)
        attn = jnp.stack([target_attn, distractor_attn], 1).reshape(B * 2, N, -1)
        code = self.encoder_mod(jnp.concatenate([x, attn], axis=-1), train=train)
        if isinstance(code, tuple):
            code = code[0]
        return code.reshape(B, 2, self.num_anchors, -1)

    def loss(self, batch, epoch=0) -> Dict[str, jnp.ndarray]:
        target = batch["target"]
        distractor = batch["distractor"]
        codes = self.encode_pair(
            target, distractor, batch["target_attn_map"], batch["distractor_attn_map"],
            train=True,
        )
        tgt_lat, dis_lat = codes[:, 0], codes[:, 1]
        text_feat, _ = self.language_enc(batch["text"], deterministic=False)
        B = target.shape[0]
        if self.guidance:
            keep = (
                jax.random.uniform(self.make_rng("sample"), (B, self.num_anchors))
                >= self.part_latent_dropout_prob
            )
            dis_lat = dis_lat * keep[..., None]
        if self.zero_part_latent:
            dis_lat = jnp.zeros_like(dis_lat)
        ctx = jnp.concatenate(
            [dis_lat, jnp.broadcast_to(text_feat[:, None], (B, self.num_anchors, text_feat.shape[-1]))],
            axis=-1,
        )
        t, _ = self.t_sampler.sample(self.make_rng("sample"), B)

        def model_fn(inp, ts, c, anc, var, seg, vid):
            return self.net(inp, ts, c, anc, var, seg, vid, deterministic=False)

        return self.diff.training_losses(
            model_fn, self.make_rng("sample"), tgt_lat, t,
            anchors=jnp.zeros_like(tgt_lat), ctx=ctx,
            seg_mask=jnp.zeros((B, self.num_anchors), jnp.int32),
        )


@MODELS.register_module()
class PartLatentEditor(nn.Module):
    """Supervised latent editor with a (frozen) listener
    (part_editing.py:13-200). The reference hardwires checkpoint paths for
    its frozen submodules; here the same modules are submodules whose
    parameters the caller freezes (Runner trainable_filter)."""

    language_encoder: dict
    latent_language_fuser: dict
    pcd_encoder: dict
    num_part_latent: int = 4
    text_dim: int = 64
    out_dim: int = 256
    logit_weight: float = 1.0
    direction_weight: float = 1.0
    magnitude_weight: float = 1.0
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.language_enc = build_from_cfg(dict(self.language_encoder), ENCODERS)
        self.fuser = build_from_cfg(
            dict(self.latent_language_fuser), ENCODERS, num_part=self.num_part_latent
        )
        self.pcd_enc = build_from_cfg(
            dict(self.pcd_encoder), ENCODERS, num_anchors=self.num_part_latent,
            dtype=self.dtype,
        )
        self.listener = PartglotClassifier(
            text_dim=self.text_dim, part_dim=self.out_dim,
            num_part=self.num_part_latent,
            language_encoder=dict(type="LSTM", text_dim=self.text_dim),
        )

    def loss(self, batch, epoch=0) -> Dict[str, jnp.ndarray]:
        """batch: target/distractor clouds + attn maps + part_indicator + text.
        Edit the distractor's latent toward the target; supervise direction,
        magnitude and the listener's logit."""
        target = batch["target"]
        distractor = batch["distractor"]
        B, N = target.shape[:2]
        x = jnp.stack([target, distractor], 1).reshape(B * 2, N, 3)
        attn = jnp.stack(
            [batch["target_attn_map"], batch["distractor_attn_map"]], 1
        ).reshape(B * 2, N, -1)
        codes = self.pcd_enc(jnp.concatenate([x, attn], axis=-1), train=False)
        if isinstance(codes, tuple):
            codes = codes[0]
        codes = jax.lax.stop_gradient(codes).reshape(B, 2, self.num_part_latent, -1)
        tgt_lat, dis_lat = codes[:, 0], codes[:, 1]

        tfeat, _ = self.language_enc(batch["text"], deterministic=False)
        edited = self.fuser(dis_lat, batch["part_indicator"], tfeat)[:, 0]

        ind = batch["part_indicator"][..., None]
        true_delta = (tgt_lat - dis_lat) * ind
        pred_delta = (edited - dis_lat) * ind
        tn = true_delta / (jnp.linalg.norm(true_delta, axis=-1, keepdims=True) + 1e-8)
        pn = pred_delta / (jnp.linalg.norm(pred_delta, axis=-1, keepdims=True) + 1e-8)
        direction = (1.0 - (tn * pn).sum(-1)) * batch["part_indicator"]
        magnitude = (
            jnp.linalg.norm(true_delta, axis=-1) - jnp.linalg.norm(pred_delta, axis=-1)
        ) ** 2 * batch["part_indicator"]
        logit = self.listener(edited, batch["text"], batch["part_indicator"], train=False)
        return {
            "direction_loss": self.direction_weight * direction.sum() / ind.sum(),
            "magnitude_loss": self.magnitude_weight * magnitude.sum() / ind.sum(),
            "logit_loss": -self.logit_weight * jax.nn.log_sigmoid(logit).mean(),
        }


@MODELS.register_module()
class AnchorDiffGenSuperSegments(AnchorDiffAE):
    """AnchorDiffAE over PartGlot super-segments (anchor_gen_supseg.py:27-880):
    identical machinery with n_class = number of super-segments; segment
    one-hots come from the sup-seg dataset instead of semantic part labels."""

    pass


@MODELS.register_module()
class Aligner(nn.Module):
    """Standalone parameter regressor (networks/parameter_regressor.py:12-60):
    encoder codes -> per-part 6-dof params, gaussian-likelihood fit loss.

    The reference's own ``forward`` is broken as shipped: it feeds channel-
    last ``ref`` (B, N, 3) against channel-FIRST per-point params (B, 3, N)
    (parameter_regressor.py:43), a broadcast error for any N != 3 — pinned
    in tests/test_reference_parity_supseg.py, which golden-tests the
    runnable encoder+regressor path and the evident intended loss."""

    encoder: dict
    n_class: int = 4
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.encoder_mod = build_from_cfg(
            dict(self.encoder), ENCODERS, num_anchors=self.n_class, dtype=self.dtype
        )
        self.regressor = MLP([512, 512, 512, 512, 64, 6], dtype=self.dtype)

    def regress(self, batch, train: bool = False):
        """Codes -> per-part (B, K, 6) params and per-sample fit loss (B,)."""
        from ..models.part_encoder import gather_per_point
        from ..utils.gaussian import gaussian_log_likelihood

        ref = batch["ref"]
        seg_mask = batch["ref_seg_mask"].astype(jnp.int32)
        seg_flag = batch["ref_attn_map"]
        valid_id = batch["present"]
        B = ref.shape[0]
        codes = self.encoder_mod(
            jnp.concatenate([ref, seg_flag], axis=-1), train=train
        )
        if isinstance(codes, tuple):
            codes = codes[0]
        params = self.regressor(codes.reshape(B, self.n_class, -1))  # (B, K, 6)
        mean, logvar = params[..., :3], params[..., 3:]
        mean_pp = gather_per_point(mean, seg_mask)
        logvar_pp = gather_per_point(logvar, seg_mask)
        flag_pp = gather_per_point(valid_id[..., None], seg_mask)[..., 0]
        ll = -gaussian_log_likelihood(ref, mean_pp, logvar_pp).mean(-1)
        fit = (ll * flag_pp).sum(-1) / flag_pp.sum(-1)
        return params, fit

    def predict_params(self, batch):
        """Eval branch (parameter_regressor.py:60): per-part mean/logvar plus
        the per-sample fit loss, keyed like the reference's result tuple."""
        params, fit = self.regress(batch, train=False)
        return {
            "index": batch.get("id"),
            "mean": params[..., :3],
            "logvar": params[..., 3:],
            "loss": fit,
        }

    def loss(self, batch, epoch=0) -> Dict[str, jnp.ndarray]:
        _, fit = self.regress(batch, train=True)
        return {"fit_loss": fit.mean()}


@MODELS.register_module()
class PartglotFinetune(nn.Module):
    """Listener-guided finetune step (partglot_finetune.py): maximize the
    frozen listener's preference for language-edited generations."""

    editor: dict
    num_part: int = 4
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.editor_mod = build_from_cfg(dict(self.editor), MODELS, dtype=self.dtype)

    def loss(self, batch, epoch=0):
        return self.editor_mod.loss(batch, epoch=epoch)
