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


class _LatentProjection(nn.Module):
    """Per-part extrinsic-parameter projection (anchor_gen_supseg.py:140-199):
    a down-projection splits each primary part latent into an intrinsic code
    and shift[, log-scale] params; the params are re-embedded through an
    up-projection and added back, optionally through a zero-init post-FF.

    ``project_pe_type``: 0 = one Linear emitting intrinsic+extrinsic;
    1 = MLP emits extrinsic only (intrinsic = latent); 2 = MLP over the
    FLATTENED K*part_dim latent. ``share_projection=False`` uses grouped
    (per-anchor) projections like the reference's groups=K Conv1d."""

    part_dim: int
    param_dim: int
    num_anchors: int
    project_pe_type: int = 0
    share_projection: bool = True
    post_ff: bool = False
    post_norm: Optional[str] = "gn"
    post_dp: float = 0.2
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        pd, qd, K = self.part_dim, self.param_dim, self.num_anchors
        if not self.share_projection:
            self.down_kernel = self.param(
                "down_kernel", nn.initializers.lecun_normal(), (K, pd, pd + qd)
            )
            self.down_bias = self.param("down_bias", nn.initializers.zeros, (K, pd + qd))
            self.up_kernel = self.param(
                "up_kernel", nn.initializers.lecun_normal(), (K, qd, pd)
            )
            self.up_bias = self.param("up_bias", nn.initializers.zeros, (K, pd))
        elif self.project_pe_type == 0:
            self.down0 = nn.Dense(pd + qd, dtype=self.dtype)
            self.up0 = nn.Dense(pd, dtype=self.dtype)
        elif self.project_pe_type == 1:
            self.down_mlp = [
                nn.Dense(128, dtype=self.dtype),
                nn.Dense(64, dtype=self.dtype),
                nn.Dense(qd, dtype=self.dtype),
            ]
            self.up0 = nn.Dense(pd, dtype=self.dtype)
        else:
            self.down_mlp = [
                nn.Dense(256, dtype=self.dtype),
                nn.Dense(64, dtype=self.dtype),
                nn.Dense(qd * K, dtype=self.dtype),
            ]
            self.up0 = nn.Dense(pd, dtype=self.dtype)
        if self.post_ff:
            if self.post_norm == "gn":
                self.ff_norm = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype)
            elif self.post_norm == "bn":
                self.ff_norm = TorchBatchNorm(dtype=self.dtype)
            self.ff_drop = nn.Dropout(self.post_dp)
            self.ff_out = nn.Dense(
                self.part_dim, dtype=self.dtype, kernel_init=nn.initializers.zeros
            )

    def down(self, latent):
        """latent (B, K, part_dim) -> (intrinsic, extrinsic (B, K, param_dim))."""
        B = latent.shape[0]
        if not self.share_projection:
            out = jnp.einsum("bki,kio->bko", latent, self.down_kernel) + self.down_bias[None]
            return out[..., : self.part_dim], out[..., self.part_dim :]
        if self.project_pe_type == 0:
            out = self.down0(latent)
            return out[..., : self.part_dim], out[..., self.part_dim :]
        if self.project_pe_type == 1:
            h = nn.relu(latent)
            for lyr in self.down_mlp[:-1]:
                h = nn.relu(lyr(h))
            return latent, self.down_mlp[-1](h)
        h = nn.relu(latent.reshape(B, -1))
        for lyr in self.down_mlp[:-1]:
            h = nn.relu(lyr(h))
        ext = self.down_mlp[-1](h)
        return latent, ext.reshape(B, self.num_anchors, self.param_dim)

    def up(self, intrinsic, params, latent, deterministic: bool = True):
        """Re-embed params and add; optional zero-init post-FF residual."""
        if self.share_projection:
            emb = self.up0(params)
        else:
            emb = jnp.einsum("bki,kio->bko", params, self.up_kernel) + self.up_bias[None]
        out = intrinsic + emb
        if not self.post_ff:
            return out
        h = out
        if self.post_norm == "gn":
            h = self.ff_norm(h)
        elif self.post_norm == "bn":
            h = self.ff_norm(h, use_running_average=deterministic)
        h = nn.silu(h)
        h = self.ff_drop(h, deterministic=deterministic)
        return latent + self.ff_out(h)


@MODELS.register_module()
class AnchorDiffGenSuperSegments(nn.Module):
    """Decomposer-based generator over PartGlot super-segments
    (anchor_gen_supseg.py:27-853): the encoder's PRIMARY part latents are
    optionally projected into intrinsic codes + per-part shift/scale
    (``project_latent``), the decomposer regresses anchors + SECONDARY
    latents + a global code, an anchor loss (optionally annealed / zeroed /
    replaced by gt or global anchors) supervises the per-point anchors, and
    the anchored diffusion trains with the global code as the ctx token and
    the per-point part latent concatenated onto the denoiser input.

    Reference defect (same family as AnchoredGeneration/PDM, pinned in
    tests/test_reference_parity_supseg.py): its forward passes
    ``code= + pointwise_latent= (+variance/reduce/anchor_assignment)`` to
    ``training_losses`` — a kwarg set no shipped diffusion accepts — so the
    reference train path crashes; this is the evident intent. The
    ``language_edit`` branch requires external LDM/language checkpoints
    (anchor_gen_supseg.py:189-198); the equivalent surface here is
    AnchorDiffAE.language_edit_latents."""

    encoder: dict
    decomposer: dict
    diffusion: dict
    sampler: dict
    num_anchors: int
    num_timesteps: int
    npoints: int = 2048
    anchor_loss_weight: float = 1.0
    anchor_weight_annealing: bool = False
    annealing_epoch: int = 500
    # NOTE: the config field name mirrors the reference kwarg and SHADOWS
    # the loss() method on instances — always invoke via
    # method=<Class>.loss (never method='loss' or instance.loss()).
    loss: Optional[dict] = None
    include_attn_weight_in_encoder: bool = True
    guidance: bool = False
    part_latent_dropout_prob: float = 0.2
    global_latent_dropout_prob: float = 0.2
    use_primary: bool = False
    use_zero_anchor: bool = False
    use_global_anchor: bool = False
    use_gt_anchors: bool = False
    project_latent: bool = False
    project_pe_type: int = 0
    post_ff: bool = False
    post_norm: Optional[str] = "gn"
    post_dp: float = 0.2
    use_log_for_scale: bool = True
    share_projection: bool = True
    learn_var: bool = False
    detach_anchor: bool = False
    detach_variance: bool = True
    part_dim: int = 256
    global_shift: bool = False
    global_scale: bool = False
    vertical_only: bool = True
    normal_diffusion: bool = False
    sample_by_seg_mask: bool = False
    forward_sample: bool = False
    ret_traj: bool = False
    ret_interval: int = 20
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.encoder_mod = build_from_cfg(
            dict(self.encoder), ENCODERS, num_anchors=self.num_anchors,
            dtype=self.dtype,
        )
        self.decomposer_mod = build_from_cfg(
            dict(self.decomposer), DECOMPOSERS, num_anchors=self.num_anchors,
            point_dim=3, dtype=self.dtype,
        )
        dcfg = dict(self.diffusion)
        self.net = build_from_cfg(dict(dcfg.pop("net")), NETS, dtype=self.dtype)
        self.diff = build_diffusion(dcfg, self.num_timesteps)
        self.t_sampler = build_from_cfg(
            dict(self.sampler), SAMPLERS, num_timesteps=self.num_timesteps
        )
        lcfg = self.loss if isinstance(self.loss, dict) else None
        self.anchor_loss_func = build_from_cfg(dict(lcfg), METRICS) if lcfg else None
        if self.project_latent:
            self.projection = _LatentProjection(
                part_dim=self.part_dim,
                param_dim=6 if self.learn_var else 3,
                num_anchors=self.num_anchors,
                project_pe_type=self.project_pe_type,
                share_projection=self.share_projection,
                post_ff=self.post_ff,
                post_norm=self.post_norm,
                post_dp=self.post_dp,
                dtype=self.dtype,
            )

    @property
    def points_per_anchor(self):
        return self.npoints // self.num_anchors

    def get_primary_latent(self, batch, train: bool = False):
        """(anchor_gen_supseg.py:619-628)."""
        x = batch["input"]
        if self.include_attn_weight_in_encoder:
            x = jnp.concatenate([x, batch["attn_map"]], axis=-1)
        lat = self.encoder_mod(x, train=train)
        return lat[0] if isinstance(lat, tuple) else lat

    def project_primary_latent(self, latent, ref=None, train: bool = False,
                               fix_shift=None, fix_scale=None):
        """(anchor_gen_supseg.py:630-702): split off per-part shift/scale,
        optional train-time global shift/scale augments applied to BOTH the
        params and ref, re-embed; returns (latent, corrected_anchor,
        corrected_scale (exp'd / relu'd), ref)."""
        B = latent.shape[0]
        intrinsic, extrinsic = self.projection.down(latent)
        if self.learn_var:
            shift, scale = extrinsic[..., :3], extrinsic[..., 3:]
        else:
            # the reference's non-learn_var scale is ONES pre-exponentiation
            # (anchor_gen_supseg.py:648), i.e. a constant e after exp
            shift, scale = extrinsic, jnp.ones_like(extrinsic)
        part_shifts = jnp.zeros((B, 1, 3), latent.dtype)
        part_scales = jnp.ones((B, 1, 3), latent.dtype)
        if train and self.global_shift:
            rand_shift = jax.random.uniform(self.make_rng("sample"), (B, 1, 3)) - 0.5
            if self.vertical_only:
                rand_shift = rand_shift * jnp.asarray([0.0, 1.0, 0.0])
            part_shifts = rand_shift
            ref = None if ref is None else ref + rand_shift
        if train and self.global_scale:
            part_scales = jax.random.uniform(self.make_rng("sample"), (B, 1, 3)) / 2 + 0.7
            ref = None if ref is None else ref * part_scales
        corrected_anchor = (shift + part_shifts) * part_scales
        corrected_scale = scale + jnp.log(part_scales)
        if fix_shift is not None:
            corrected_anchor = jnp.broadcast_to(fix_shift, corrected_anchor.shape)
        if fix_scale is not None:
            corrected_scale = jnp.broadcast_to(fix_scale, corrected_scale.shape)
        params = (
            jnp.concatenate([corrected_anchor, corrected_scale], axis=-1)
            if self.learn_var
            else corrected_anchor
        )
        latent = self.projection.up(intrinsic, params, latent, deterministic=not train)
        corrected_scale = (
            jnp.exp(corrected_scale)
            if self.use_log_for_scale
            else nn.relu(corrected_scale)
        )
        return latent, corrected_anchor, jnp.exp(corrected_scale), ref

    def get_params(self, batch):
        """(shift, log scale) from the projection (anchor_gen_supseg.py:611-617)."""
        lat = self.get_primary_latent(batch, train=False)
        _, shift, scale, _ = self.project_primary_latent(lat, train=False)
        return shift, jnp.log(scale)

    def _encode_decompose(self, batch, train: bool = False):
        """Shared head of train/eval forward (anchor_gen_supseg.py:749-772)."""
        ref = batch["ref"]
        primary = self.get_primary_latent(batch, train=train)
        corrected_anchor = corrected_scale = None
        if self.project_latent:
            primary, corrected_anchor, corrected_scale, ref = (
                self.project_primary_latent(primary, ref=ref, train=train)
            )
        global_feature, anchors, secondary = self.decomposer_mod(primary, train=train)
        part_latent = primary if self.use_primary else secondary
        variances = 1.0
        if self.project_latent:
            anchors = corrected_anchor
            if self.learn_var:
                variances = corrected_scale
        if self.use_zero_anchor:
            anchors = jnp.zeros_like(anchors)
        if self.use_global_anchor:
            anchors = batch["global_anchor_mean"]
        if self.use_gt_anchors:
            anchors = batch["part_means"][..., 1:]
        return global_feature, anchors, part_latent, variances, ref

    def _model_fn(self, pointwise_latent, code, train: bool = False):
        ctx_tok = code[:, None, :]

        def fn(inp, ts, c, anc, var, seg, vid):
            h = jnp.concatenate([inp, pointwise_latent.astype(inp.dtype)], axis=-1)
            return self.net(h, ts, ctx_tok, anc, var, seg, vid, deterministic=not train)

        return fn

    def loss(self, batch, epoch=0) -> Dict[str, jnp.ndarray]:
        """Train forward (anchor_gen_supseg.py:774-813)."""
        from .part_encoder import gather_per_point

        seg_mask = batch["seg_mask"].astype(jnp.int32)
        B = batch["input"].shape[0]
        global_feature, anchors, part_latent, variances, ref = (
            self._encode_decompose(batch, train=True)
        )
        if self.guidance:
            keep = (
                jax.random.uniform(self.make_rng("sample"), part_latent.shape[:-1])
                >= self.part_latent_dropout_prob
            )
            part_latent = part_latent * keep[..., None]
            gkeep = (
                jax.random.uniform(self.make_rng("sample"), (B,))
                >= self.global_latent_dropout_prob
            )
            global_feature = global_feature * gkeep[:, None]

        t, _ = self.t_sampler.sample(self.make_rng("sample"), B)
        latent_pp = gather_per_point(part_latent, seg_mask)
        anchor_pp = gather_per_point(anchors, seg_mask)
        var_pp = (
            gather_per_point(variances, seg_mask)
            if not isinstance(variances, float)
            else None
        )

        if self.anchor_weight_annealing:
            ratio = 1.0 / self.annealing_epoch
            w = ratio * min(epoch, self.annealing_epoch)
        elif self.use_zero_anchor or self.use_global_anchor or self.use_gt_anchors:
            w = 0.0
        else:
            w = self.anchor_loss_weight
        if self.anchor_loss_func is None:
            base_anchor = ((anchor_pp - ref) ** 2).sum(-1).mean()
        elif var_pp is not None:
            base_anchor = self.anchor_loss_func(ref, anchor_pp, var=var_pp)
        else:
            base_anchor = self.anchor_loss_func(ref, anchor_pp)
        losses = {"anchor_loss": w * base_anchor}

        if self.normal_diffusion:
            anchor_pp = anchor_pp * 0
            var_pp = None if var_pp is None else jnp.ones_like(var_pp)
        if self.detach_anchor:
            anchor_pp = jax.lax.stop_gradient(anchor_pp)
        if self.detach_variance and var_pp is not None:
            var_pp = jax.lax.stop_gradient(var_pp)

        model_fn = self._model_fn(latent_pp, global_feature, train=True)
        diff_losses = self.diff.training_losses(
            model_fn, self.make_rng("sample"), ref, t,
            anchors=anchor_pp, variance=var_pp, seg_mask=seg_mask,
        )
        losses.update(diff_losses)
        return losses

    def predict(self, batch) -> Dict[str, jnp.ndarray]:
        """Eval forward (anchor_gen_supseg.py:815-853): per-point anchors and
        latents by seg-mask gather or equal split, then reverse decode (or
        forward-chain visualization)."""
        from .part_encoder import gather_per_point

        B = batch["input"].shape[0]
        global_feature, anchors, part_latent, variances, ref = (
            self._encode_decompose(batch, train=False)
        )
        if self.sample_by_seg_mask:
            seg = batch["seg_mask"].astype(jnp.int32)
            multiple = self.npoints // seg.shape[1]
            assignments = jnp.repeat(seg, multiple, axis=1)
        else:
            assignments = jnp.broadcast_to(
                jnp.repeat(
                    jnp.arange(self.num_anchors, dtype=jnp.int32),
                    self.points_per_anchor,
                )[None],
                (B, self.npoints),
            )
        anchor_pp = gather_per_point(anchors, assignments)
        latent_pp = gather_per_point(part_latent, assignments)
        var_pp = (
            gather_per_point(variances, assignments)
            if not isinstance(variances, float)
            else None
        )
        if self.normal_diffusion:
            anchor_pp = anchor_pp * 0
            var_pp = None if var_pp is None else jnp.ones_like(var_pp)

        if self.forward_sample:
            traj = self.diff.q_sample_loop(self.make_rng("sample"), ref, anchor_pp)
            out = {"pred": ref, "traj": traj}
        else:
            model_fn = self._model_fn(latent_pp, global_feature, train=False)
            out = self.diff.p_sample_loop(
                model_fn, self.make_rng("sample"), anchor_pp, variance=var_pp,
                ret_traj=self.ret_traj, ret_interval=self.ret_interval,
            )
        out["input"] = batch["input"]
        out["input_ref"] = ref
        out["anchors"] = anchors
        out["seg_mask"] = assignments
        out["seg_mask_ref"] = batch["seg_mask"]
        out["assigned_anchor"] = anchor_pp
        return out

    def combine_latent(self, batch, ids) -> Dict[str, jnp.ndarray]:
        """Assemble ONE shape from K donors: part i's primary latent comes
        from shape ids[i] (anchor_gen_supseg.py:357-399). The reference
        branch references undefined ``new_params``/``gts`` (NameError as
        shipped, pinned); this is the evident intent — diag-mixed latents,
        ``mixing``-style projection keeping each donor's own shift/scale,
        equal-split decode."""
        from .part_encoder import gather_per_point

        ids = jnp.asarray(ids)
        primary = self.get_primary_latent(
            {k: batch[k][ids] for k in ("input", "attn_map")}, train=False
        )  # (K, K, C)
        mixed = jnp.stack(
            [primary[i, i] for i in range(self.num_anchors)], 0
        )[None]  # (1, K, C)
        variances = proj_anchors = None
        if self.project_latent:
            mixed, proj_anchors, scale, _ = self.project_primary_latent(mixed, train=False)
            if self.learn_var:
                variances = scale
        global_feature, dec_anchors, secondary = self.decomposer_mod(mixed, train=False)
        part_latent = mixed if self.use_primary else secondary
        anchors = proj_anchors if self.project_latent else dec_anchors
        if self.use_zero_anchor:
            anchors = jnp.zeros_like(anchors)
        assignments = jnp.broadcast_to(
            jnp.repeat(
                jnp.arange(self.num_anchors, dtype=jnp.int32), self.points_per_anchor
            )[None],
            (1, self.npoints),
        )
        anchor_pp = gather_per_point(anchors, assignments)
        latent_pp = gather_per_point(part_latent, assignments)
        var_pp = (
            gather_per_point(variances, assignments) if variances is not None else None
        )
        model_fn = self._model_fn(latent_pp, global_feature, train=False)
        out = self.diff.p_sample_loop(
            model_fn, self.make_rng("sample"), anchor_pp, variance=var_pp
        )
        out["anchors"] = anchors
        out["seg_mask"] = assignments
        return out

    def anchor_drift(self, batch, n_drift: int = 10, max_scale: float = 2.0
                     ) -> Dict[str, jnp.ndarray]:
        """Shift each shape's anchors along random unit directions at
        ``n_drift`` magnitudes, re-embed through the projection, decode
        (anchor_gen_supseg.py:567-610)."""
        from .part_encoder import gather_per_point

        assert self.project_latent, "anchor_drift needs the latent projection"
        seg = batch["seg_mask"].astype(jnp.int32)
        B = batch["input"].shape[0]
        primary = self.get_primary_latent(batch, train=False)
        intrinsic, extrinsic = self.projection.down(primary)
        anchors = extrinsic[..., :3]
        direction = jax.random.normal(
            self.make_rng("sample"), (B, n_drift, self.num_anchors, 1)
        )
        direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
        scales = jnp.linspace(0.0, max_scale, n_drift).reshape(1, -1, 1, 1)
        shifted = (direction * scales + anchors[:, None]).reshape(
            B * n_drift, self.num_anchors, 3
        )
        intr = jnp.repeat(intrinsic, n_drift, axis=0)
        lat = jnp.repeat(primary, n_drift, axis=0)
        params = (
            jnp.concatenate([shifted, jnp.zeros_like(shifted)], -1)
            if self.learn_var
            else shifted
        )
        lat = self.projection.up(intr, params, lat, deterministic=True)
        global_feature, _, part_latent = self.decomposer_mod(lat, train=False)
        if self.use_primary:
            part_latent = lat
        multiple = self.npoints // seg.shape[1]
        assignments = jnp.repeat(jnp.repeat(seg, n_drift, axis=0), multiple, axis=1)
        anchor_pp = gather_per_point(shifted, assignments)
        latent_pp = gather_per_point(part_latent, assignments)
        model_fn = self._model_fn(latent_pp, global_feature, train=False)
        out = self.diff.p_sample_loop(model_fn, self.make_rng("sample"), anchor_pp)
        return {
            "pred": out["pred"].reshape(B, n_drift, self.npoints, 3),
            "anchors": shifted.reshape(B, n_drift, self.num_anchors, 3),
            "input": batch["input"],
            "seg_mask": seg,
        }

    def interpolate_latent(self, batch, id1: int, id2: int, anchor_id: int,
                           steps: int = 10) -> Dict[str, jnp.ndarray]:
        """Interpolate ONE part's primary latent between two shapes
        (anchor_gen_supseg.py:255-336, structure; the reference branch
        hardcodes ids and re-derives per-point tensors the same way)."""
        from .part_encoder import gather_per_point

        sub = {
            k: v[jnp.array([id1, id2])]
            for k, v in batch.items()
            if hasattr(v, "shape") and v.shape[:1] == batch["input"].shape[:1]
        }
        global_feature, anchors, part_latent, variances, _ = (
            self._encode_decompose(sub, train=False)
        )
        w = jnp.linspace(0.0, 1.0, steps)[:, None]
        lat = jnp.repeat(part_latent[:1], steps, axis=0)
        mixed_part = part_latent[0, anchor_id] * (1 - w) + part_latent[1, anchor_id] * w
        lat = lat.at[:, anchor_id].set(mixed_part)
        anchors_i = jnp.repeat(anchors[:1], steps, axis=0)
        code = jnp.repeat(global_feature[:1], steps, axis=0)
        assignments = jnp.broadcast_to(
            jnp.repeat(
                jnp.arange(self.num_anchors, dtype=jnp.int32), self.points_per_anchor
            )[None],
            (steps, self.npoints),
        )
        anchor_pp = gather_per_point(anchors_i, assignments)
        latent_pp = gather_per_point(lat, assignments)
        model_fn = self._model_fn(latent_pp, code, train=False)
        out = self.diff.p_sample_loop(model_fn, self.make_rng("sample"), anchor_pp)
        out["seg_mask"] = assignments
        return out


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
