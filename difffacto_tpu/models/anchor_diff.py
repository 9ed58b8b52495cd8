"""AnchorDiffAE orchestrator: part encoder -> anchors -> cross diffusion.

Re-designs the reference orchestrator (reference:
python/difffacto/models/networks/anchor_gen.py:30-1134) as one Flax module
exposing pure methods, plus module-level jittable pipelines:

* ``AnchorDiffAE.loss``            — the whole training forward (encoder +
  prior/fit losses + q_sample + denoiser + mse/vb) as ONE jitted program;
* ``AnchorDiffAE.denoise``         — one denoiser evaluation; bound into the
  diffusion's ``lax.scan`` reverse chain by ``decode``;
* ``decode(...)``                  — reverse diffusion chain (anchor_gen.py:145-169);
* ``sample_generation(...)``       — unconditional generation: flow prior ->
  CIMLE aligner hypotheses -> reverse chain (anchor_gen.py:1034-1084);
* ``reconstruct(...)``             — encode a shape and re-decode it
  (anchor_gen.py:1085-1128);
* ``cache_noise_scores(...)``      — CIMLE best-of-N noise selection
  (anchor_gen.py:807-836).

Everything channel-last; every stochastic draw comes from named flax rngs
('sample' for latents/noise, 'dropout' for training dropout).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.registry import DIFFUSIONS, ENCODERS, MODELS, NETS, SAMPLERS, build_from_cfg
from .diffusion import AnchoredDiffusion
from .part_encoder import gather_per_point
from .samplers import Uniform


def ensure_attn_maps(batch):
    """Rebuild one-hot part maps device-side from integer seg masks.

    The hot datasets construct ``attn_map``/``ref_attn_map`` as exactly
    ``eye(K)[seg_mask]`` (data/shapenet_seg.py, data/synthetic.py — the
    reference does the same host-side, datasets/shapenet_seg.py:526-543), so
    streaming the (B, N, K) float32 maps over the host->device link costs 4x
    the point clouds themselves for no information.  ``Runner`` ships only
    the int8 masks (``device_batch(slim_attn=True)``) and the jitted entry
    points call this to expand them on device.  No-op when the maps are
    already present; int masks are upcast to int32 either way.
    """
    if "seg_mask" not in batch and "ref_seg_mask" not in batch:
        return batch
    out = dict(batch)
    K = out["present"].shape[-1] if "present" in out else None
    for mask_key, map_key in (("seg_mask", "attn_map"), ("ref_seg_mask", "ref_attn_map")):
        m = out.get(mask_key)
        if m is None:
            continue
        if m.dtype != jnp.int32:
            out[mask_key] = m = m.astype(jnp.int32)
        if map_key not in out and K is not None:
            out[map_key] = jax.nn.one_hot(m, K, dtype=jnp.float32)
    return out


def build_diffusion(diffusion_cfg: dict, num_timesteps: int) -> AnchoredDiffusion:
    """Build the pure-math diffusion object from its config (net key removed).

    Dispatches through the DIFFUSIONS registry so PointDiffusion/LDM configs
    get their vanilla-DDPM settings instead of anchored defaults.
    """
    cfg = dict(diffusion_cfg)
    kind = cfg.pop("type", "AnchoredDiffusion")
    cfg.pop("net", None)
    cfg["num_timesteps"] = num_timesteps
    return build_from_cfg(dict(type=kind, **cfg), DIFFUSIONS)


@MODELS.register_module()
class AnchorDiffAE(nn.Module):
    """Constructor args mirror the reference (anchor_gen.py:32-80)."""

    encoder: dict
    diffusion: dict
    sampler: dict
    num_anchors: int
    num_timesteps: int
    npoints: int = 2048
    zero_anchors: bool = False
    gen: bool = False
    sample_noise_num: int = 20
    cimle: bool = False
    cimle_sample_num: int = 10
    diffusion_loss_weight: float = 1.0
    use_input: bool = False
    learn_var: bool = False
    detach_variance: bool = True
    detach_anchor: bool = True
    ret_traj: bool = False
    ret_interval: int = 20
    interpolate_part_id: int = 2
    fix_part_ids: Optional[tuple] = None
    noise_reg_loss: bool = True
    reg_loss_weight: float = 1.0
    pretrain_prior: bool = False
    train_language: bool = False
    language_encoder: Optional[dict] = None
    clip_weight: float = 1.0
    triplet_weight: float = 1.0
    triplet_thresh: float = 0.1
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.encoder_mod = build_from_cfg(dict(self.encoder), ENCODERS, dtype=self.dtype)
        net_cfg = dict(self.diffusion["net"])
        if self.pretrain_prior:
            # one denoiser per part for per-part diffusion pretraining
            # (anchor_gen.py:84-86, 915-968)
            self.net_list = [
                build_from_cfg(dict(net_cfg), NETS, dtype=self.dtype)
                for _ in range(self.num_anchors)
            ]
            self.net = self.net_list[0]
        else:
            self.net = build_from_cfg(net_cfg, NETS, dtype=self.dtype)
        self.diff = build_diffusion(self.diffusion, self.num_timesteps)
        self.t_sampler = build_from_cfg(
            dict(self.sampler), SAMPLERS, num_timesteps=self.num_timesteps
        )
        if self.train_language:
            from .language import ZeroMLP

            zdim = self.encoder["encoder"]["zdim"]
            self.language_enc = build_from_cfg(
                dict(self.language_encoder or dict(type="LSTM")), ENCODERS
            )
            self.update_mlp = ZeroMLP(
                [zdim * 2, zdim * 2, zdim], dtype=self.dtype, name="update_mlp"
            )

    # ------------------------------------------------------------ primitives
    def denoise(self, x, t, ctx, anchors, variances, seg_mask, valid_id, train: bool = False):
        """One denoiser call — the scan body for sampling, and the training net."""
        return self.net(
            x, t, ctx, anchors, variances, seg_mask, valid_id, deterministic=not train
        )

    def encode(self, batch, noise=None, epoch=-1, train: bool = False):
        """Encoder forward passthrough (ctx, mean_pp, logvar_pp, flag_pp, losses, latents)."""
        return self.encoder_mod(batch, noise=noise, epoch=epoch, train=train)

    def sample_latents(self, sample_num, fixed_id=None, valid_id=None, epoch=0, K=None, part_code=None):
        return self.encoder_mod.sample_latents(
            sample_num,
            self.npoints,
            fixed_id=fixed_id,
            valid_id=valid_id,
            epoch=epoch,
            K=self.cimle_sample_num if K is None else K,
            part_code=part_code,
        )

    def sample_noise_candidates(self, batch, num=None):
        return self.encoder_mod.sample_noise_candidates(
            batch, self.sample_noise_num if num is None else num
        )

    # -------------------------------------------------------------- training
    def loss(
        self, batch: Dict[str, jnp.ndarray], epoch=0, train: bool = True
    ) -> Dict[str, jnp.ndarray]:
        """Full training loss (anchor_gen.py:970-1023), one jittable program.

        ``train=False`` runs the same loss with eval-mode normalization
        (BN running stats, no dropout): deterministic per-sample math, used
        for val-loss reporting and the sharding numerical-equivalence gates
        (train-mode BN batch statistics amplify f32 reduction-order noise,
        see tests/test_parallel.py::test_sp_loss_grads_match_single_device).
        """
        ref = batch["ref"]
        seg_mask = batch["ref_seg_mask"].astype(jnp.int32)
        valid_id = batch.get("present")
        dp_valid_id = batch.get("dp_present")
        B, N, _ = ref.shape

        ctx, mean_pp, logvar_pp, flag_pp, loss_dict, latents = self.encoder_mod(
            batch, epoch=epoch, train=train
        )
        if self.zero_anchors:
            mean_pp = jnp.zeros_like(mean_pp)
        # Reference computes variance BEFORE detaching logvar (anchor_gen.py:
        # 1003 vs 1013-1014), so variance keeps its gradient; only the anchor
        # is actually detached. Preserved deliberately.
        variance_pp = jnp.exp(logvar_pp)
        if self.detach_anchor:
            mean_pp = jax.lax.stop_gradient(mean_pp)

        # Optional batch overrides (mirrors the reference training_losses'
        # noise= parameter, anchored_diffusion.py:760-771): deterministic
        # replay for tests and the sp/dp numerical-equivalence gates.
        t = batch.get("diffusion_t")
        if t is None:
            t, _ = self.t_sampler.sample(self.make_rng("sample"), B)

        dp_flags = None
        if dp_valid_id is not None:
            dp_flags = gather_per_point(dp_valid_id[..., None], seg_mask)[..., 0]

        def model_fn(inp, ts, c, anc, var, seg, vid):
            return self.denoise(inp, ts, c, anc, var, seg, vid, train=train)

        x0 = batch["input"] if self.use_input else ref
        diff_losses = self.diff.training_losses(
            model_fn,
            self.make_rng("sample"),
            x0,
            t,
            anchors=mean_pp,
            variance=variance_pp,
            ctx=ctx,
            seg_mask=seg_mask,
            valid_id=dp_valid_id,
            flags=dp_flags,
            noise=batch.get("diffusion_noise"),
        )
        diff_losses["mse_loss"] = self.diffusion_loss_weight * diff_losses["mse_loss"]
        loss_dict.update(diff_losses)
        return loss_dict

    # ------------------------------------------------------- editing helpers
    def encode_part_code(self, x, seg_flag, sample: bool = False):
        """Per-part latent codes from a (possibly mixed) cloud:
        (B, N, 3), (B, N, K) -> (B, K, zdim)."""
        means, logvars = self.encoder_mod.get_part_code(x, seg_flag, train=False)
        if sample and self.encoder_mod.gen:
            from ..utils.gaussian import reparameterize_gaussian

            return reparameterize_gaussian(self.make_rng("sample"), means, logvars)
        return means

    def latents_to_decode(self, part_code, valid_id, noise=None, seg_mask=None):
        """Aligner + gather + ctx from explicit latents (the common tail of
        combine_latent / interpolate_* — anchor_gen.py:499-514).

        Returns (ctx, mean_pp, variance_pp, seg_mask, (mean, logvar)).
        """
        enc = self.encoder_mod
        mean, logvar = enc.get_params_from_part_code(part_code, valid_id, noise=noise)
        if seg_mask is None:
            ids = jnp.arange(self.num_anchors, dtype=part_code.dtype)[None] * valid_id + jnp.argmax(
                valid_id, axis=1
            )[:, None].astype(part_code.dtype) * (1 - valid_id)
            seg_mask = jnp.repeat(
                ids.astype(jnp.int32), self.npoints // self.num_anchors, axis=1
            )
        lv = logvar + enc.log_scale_var if logvar is not None else logvar
        mean_pp, logvar_pp, _ = enc.gather_all(seg_mask, anchors=mean, variances=lv)
        ctx = enc.prepare_ctx(part_code, mean, logvar, seg_mask=seg_mask)
        return ctx, mean_pp, jnp.exp(logvar_pp), seg_mask, (mean, logvar)

    def edit_losses(
        self,
        z,
        x,
        seg_flag,
        valid_id,
        ref_means,
        ref_vars,
        fix_ids,
        edit_part_id,
        edit_part_mean=None,
        edit_part_var=None,
        fit_weight: float = 1.0,
    ):
        """Noise-optimization losses for shape editing (anchor_gen.py:872-893):
        keep fixed parts' params near reference, pull the edited part toward
        the target, L2-regularize the noise."""
        enc = self.encoder_mod
        means, _ = enc.get_part_code(x, seg_flag, train=False)
        mean, logvar = enc.get_params_from_part_code(means, valid_id, noise=z)
        fit = (
            jnp.concatenate([mean, logvar], axis=-1)
            - jnp.concatenate([ref_means, jnp.log(ref_vars)], axis=-1)
        ) ** 2
        fit = fit * (valid_id * fix_ids)[..., None]
        fit = fit.sum(axis=(-1, -2)) / (valid_id * fix_ids).sum(-1)
        out = {"fit_loss": fit_weight * fit}
        edit = 0.0
        if edit_part_mean is not None:
            edit = edit + ((mean[:, edit_part_id] - edit_part_mean) ** 2).mean()
        if edit_part_var is not None:
            edit = edit + ((logvar[:, edit_part_id] - jnp.log(edit_part_var)) ** 2).mean()
        out["edit_loss"] = edit
        if self.noise_reg_loss:
            out["reg_loss"] = self.reg_loss_weight * (z**2).sum(-1)
        return out

    def recon_losses(self, batch, z):
        """Fit losses for CIMLE noise optimization (anchor_gen.py:895-913)."""
        _, _, _, _, loss_dict, _ = self.encoder_mod(batch, noise=z, epoch=-1, train=False)
        if self.noise_reg_loss:
            loss_dict["reg_loss"] = self.reg_loss_weight * (z**2).sum(-1)
        return loss_dict

    # ------------------------------------------------------------- pretrain
    def pretrain_loss(self, part_inputs, valid=None) -> Dict[str, jnp.ndarray]:
        """Per-part diffusion pretraining (anchor_gen.py:915-938):
        part_inputs (B, K, Np, 3) normalized per-part clouds; each part gets
        its own denoiser conditioned on that part's latent token."""
        from ..utils.gaussian import reparameterize_gaussian

        B, K, Np, _ = part_inputs.shape
        flat = part_inputs.reshape(B, K * Np, 3)
        seg_flag = jnp.repeat(jnp.eye(K, dtype=flat.dtype)[None], B, axis=0)
        seg_flag = jnp.repeat(seg_flag, Np, axis=1).reshape(B, K * Np, K)
        pc_means, pc_logvars = self.encoder_mod.get_part_code(flat, seg_flag, train=True)
        part_code = reparameterize_gaussian(self.make_rng("sample"), pc_means, pc_logvars)
        loss_dict = dict(
            self.encoder_mod.get_prior_loss(
                part_code, pc_means, pc_logvars,
                jnp.ones((B, K), flat.dtype) if valid is None else valid,
            )
        )
        mse = 0.0
        for i in range(K):
            t, _ = self.t_sampler.sample(self.make_rng("sample"), B)
            net_i = self.net_list[i]

            def model_fn(inp, ts, c, anc, var, seg, vid, _n=net_i):
                return _n(inp, ts, c, anc, var, seg, vid, deterministic=False)

            dl = self.diff.training_losses(
                model_fn,
                self.make_rng("sample"),
                part_inputs[:, i],
                t,
                anchors=jnp.zeros((B, Np, 3), flat.dtype),
                variance=jnp.ones((B, Np, 3), flat.dtype)
                if self.diff.learn_variance
                else None,
                ctx=part_code[:, i : i + 1],
                seg_mask=jnp.zeros((B, Np), jnp.int32),
            )
            mse = mse + dl["mse_loss"]
        loss_dict["mse_loss"] = mse / K
        return loss_dict

    def pretrain_sample(self, sample_num: int, num_points: int):
        """Sample each part's pretrained diffusion independently
        (anchor_gen.py:951-968). Returns list of (S, Np, 3)."""
        codes = jax.random.normal(
            self.make_rng("sample"),
            (sample_num, self.num_anchors, self.encoder["encoder"]["zdim"]),
        )
        outs = []
        for i in range(self.num_anchors):
            net_i = self.net_list[i]

            def model_fn(inp, ts, c, anc, var, seg, vid, _n=net_i):
                return _n(inp, ts, c, anc, var, seg, vid, deterministic=True)

            out = self.diff.p_sample_loop(
                model_fn,
                self.make_rng("sample"),
                jnp.zeros((sample_num, num_points, 3)),
                ctx=codes[:, i : i + 1],
                seg_mask=jnp.zeros((sample_num, num_points), jnp.int32),
            )
            outs.append(out["pred"])
        return outs

    # ------------------------------------------------------------- language
    def language_train_step(self, batch) -> Dict[str, jnp.ndarray]:
        """Contrastive language-editing losses (anchor_gen.py:534-574).

        batch: input (B, 3, N, 3) triplets (target / to-edit / distractor),
        attn_map (B, 3, N, K), part_indicator (B, K), text (B, L) tokens.
        """
        from ..utils.gaussian import reparameterize_gaussian
        from .language import clip_style_loss, triplet_loss

        x = batch["input"]
        attn = batch["attn_map"]
        part_ind = batch["part_indicator"]
        texts = batch["text"]
        B, three, N, _ = x.shape
        K = self.num_anchors

        text_feat, _ = self.language_enc(texts, deterministic=False)
        pc_means, pc_logvars = self.encoder_mod.get_part_code(
            x.reshape(B * 3, N, 3), attn.reshape(B * 3, N, K), train=True
        )
        if self.encoder_mod.gen:
            codes = reparameterize_gaussian(self.make_rng("sample"), pc_means, pc_logvars)
        else:
            codes = pc_means
        zdim = codes.shape[-1]
        part_id = jnp.argmax(part_ind, axis=-1).astype(jnp.int32)  # (B,)
        per_shape = codes.reshape(B, 3, K, zdim)
        ref_lat = jnp.take_along_axis(
            per_shape, part_id[:, None, None, None], axis=2
        )[:, :, 0]  # (B, 3, zdim)
        tgt, to_edit, distractor = ref_lat[:, 0], ref_lat[:, 1], ref_lat[:, 2]
        delta = self.update_mlp(jnp.concatenate([text_feat, to_edit], axis=-1))
        modified = to_edit + delta
        clip_l, cos = clip_style_loss(modified, tgt, distractor)
        trip_l, pos_d, neg_d = triplet_loss(modified, tgt, distractor, self.triplet_thresh)
        return {
            "clip_loss": self.clip_weight * clip_l,
            "triplet_loss": self.triplet_weight * trip_l.mean(),
            "cos_sim_pos": cos[:, 0].mean(),
            "cos_sim_neg": cos[:, 1].mean(),
            "pos_diff": pos_d,
            "neg_diff": neg_d,
        }

    def language_edit_latents(self, part_code, text_tokens, part_id):
        """Apply a text edit to one part's latent (anchor_gen.py:576-723 core):
        part_code (B, K, zdim) -> edited codes."""
        text_feat, _ = self.language_enc(text_tokens, deterministic=True)
        selected = part_code[:, part_id]
        delta = self.update_mlp(jnp.concatenate([text_feat, selected], axis=-1))
        return part_code.at[:, part_id].set(selected + delta)

    # ----------------------------------------------------- eval-path helpers
    def prepare_generation(self, sample_num, fixed_id, valid_id, epoch=0):
        """Latents for unconditional generation (anchor_gen.py:1042).

        Returns (ctx, mean_pp, variance_pp, seg_mask, valid_id, latents)
        with leading dim sample_num * cimle_sample_num.
        """
        ctx, mean_pp, logvar_pp, seg_mask, valid_id, latents = self.sample_latents(
            sample_num, fixed_id=fixed_id, valid_id=valid_id, epoch=epoch
        )
        return ctx, mean_pp, jnp.exp(logvar_pp), seg_mask, valid_id, latents

    def prepare_reconstruction(self, batch, noise=None, epoch=-1):
        """Latents for encode->decode eval (anchor_gen.py:1085-1095)."""
        ctx, mean_pp, logvar_pp, flag_pp, _, latents = self.encoder_mod(
            batch, noise=noise, epoch=epoch, train=False
        )
        return ctx, mean_pp, jnp.exp(logvar_pp), latents


# ---------------------------------------------------------------------------
# Pure pipelines over a bound (module, variables) pair.
#
# Each pipeline is jitted once per (model, static-arg) combination and cached:
# eager per-op dispatch on this host is ~100x slower than compiled execution,
# and on TPU jit is mandatory anyway.
# ---------------------------------------------------------------------------

_PIPELINE_CACHE: dict = {}


def _cached_jit(key, build, model=None):
    """Keys include id(model); pinning the model in the entry keeps that id
    from being recycled by a later allocation (a freed model's address could
    otherwise alias a new model and return a stale jitted closure)."""
    entry = _PIPELINE_CACHE.get(key)
    if entry is None:
        entry = (jax.jit(build()), model)
        _PIPELINE_CACHE[key] = entry
    return entry[0]


def _model_fn(model: AnchorDiffAE, variables, train: bool = False, rngs=None):
    def fn(inp, ts, ctx, anchors, variance, seg_mask, valid_id):
        return model.apply(
            variables,
            inp,
            ts,
            ctx,
            anchors,
            variance,
            seg_mask,
            valid_id,
            train,
            method=AnchorDiffAE.denoise,
            rngs=rngs,
        )

    return fn


def decode(
    model: AnchorDiffAE,
    variables,
    rng,
    anchors,
    ctx=None,
    variance=None,
    seg_mask=None,
    valid_id=None,
    noise=None,
    ret_traj: Optional[bool] = None,
    ret_interval: Optional[int] = None,
    mesh=None,
):
    """Reverse diffusion chain (anchor_gen.py:145-169) as one lax.scan program.

    With ``mesh`` (>1 device) and ``ret_traj=False``, the chain runs under
    ``shard_map``: generation is embarrassingly parallel over the batch
    ('data' axis) AND over the point-token axis ('points' axis of a 2-D
    mesh, parallel/mesh.py) — the denoiser cross-attends each point token to
    only 4 replicated context tokens, so a point shard needs no collectives.
    Each device runs its local (batch, points) tile through the Pallas trunk
    kernel (which a plain-GSPMD custom call would not partition), and the
    rng is folded per device so shards draw independent noise. 'points'
    sharding is the single-shape LATENCY lever: one cloud's reverse chain
    spreads over the mesh row.
    """
    ret_traj = model.ret_traj if ret_traj is None else ret_traj
    ret_interval = model.ret_interval if ret_interval is None else ret_interval
    mesh_axes = tuple(mesh.axis_names) if mesh is not None else ()
    n_data = mesh.shape["data"] if "data" in mesh_axes else (
        getattr(mesh, "size", 1) if mesh is not None else 1
    )
    n_points = mesh.shape["points"] if "points" in mesh_axes else 1
    use_shard = (
        mesh is not None
        and getattr(mesh, "size", 1) > 1
        and not ret_traj
        and anchors.shape[0] % n_data == 0  # shard_map needs even shards
        and anchors.shape[1] % n_points == 0
    )

    def build():
        diff = build_diffusion(model.diffusion, model.num_timesteps)

        def run(variables, rng, anchors, ctx, variance, seg_mask, valid_id, noise):
            return diff.p_sample_loop(
                _model_fn(model, variables),
                rng,
                anchors,
                ctx=ctx,
                variance=variance,
                seg_mask=seg_mask,
                valid_id=valid_id,
                noise=noise,
                ret_traj=ret_traj,
                ret_interval=ret_interval,
            )

        if not use_shard:
            return run

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axes = tuple(mesh.axis_names)

        def local_run(variables, rng, *args):
            for ax in axes:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(ax))
            return run(variables, rng, *args)

        if axes == ("data", "points"):
            dp, dpp = P("data"), P("data", "points")
            # (anchors, ctx, variance, seg_mask, valid_id, noise): per-point
            # tensors shard both axes; per-part tensors (ctx, valid_id) have
            # no point axis and shard batch only.
            in_specs = (P(), P(), dpp, dp, dpp, dpp, dp, dpp)
            out_pred = dpp
        else:
            axis = axes[0]
            in_specs = (P(), P()) + (P(axis),) * 6
            out_pred = P(axis)

        return shard_map(
            local_run,
            mesh=mesh,
            in_specs=in_specs,
            out_specs={"pred": out_pred},
            check_vma=False,
        )

    # The denoiser reads kernel-selection env knobs at TRACE time; key the
    # cached trace on them so toggling mid-process (A/B runs) takes effect
    # instead of silently reusing the old program.
    env_key = tuple(
        os.environ.get(k, "")
        for k in (
            "DIFFFACTO_FUSE_HEAD",
            "DIFFFACTO_FUSE_TAIL",
            "DIFFFACTO_PALLAS_INTERPRET",
        )
    )
    fn = _cached_jit(
        (
            "decode", id(model), ret_traj, ret_interval,
            id(mesh) if use_shard else None, env_key,
        ),
        build,
        (model, mesh),
    )
    return fn(variables, rng, anchors, ctx, variance, seg_mask, valid_id, noise)


def sample_generation(
    model: AnchorDiffAE,
    variables,
    rng,
    sample_num: int,
    valid_id=None,
    fixed_id=None,
    epoch: int = 0,
    ret_traj: bool = False,
    mesh=None,
):
    """Unconditional generation (anchor_gen.py:1034-1084): flow prior ->
    aligner (K CIMLE hypotheses) -> reverse chain. Returns dict with 'pred'
    (S*K, N, 3), 'seg_mask', 'valid_id', 'anchors', 'latents'."""
    lat_rng, dec_rng = jax.random.split(rng)
    if fixed_id is None:
        fixed_id = jnp.zeros((model.num_anchors,), jnp.float32)

    def build():
        def run(variables, fixed_id, valid_id, epoch, rng):
            return model.apply(
                variables,
                sample_num,
                fixed_id,
                valid_id,
                epoch,
                method=AnchorDiffAE.prepare_generation,
                rngs={"sample": rng},
            )

        return run

    prep = _cached_jit(("prepare_generation", id(model), sample_num), build, model)
    ctx, mean_pp, var_pp, seg_mask, vid, latents = prep(
        variables, fixed_id, valid_id, epoch, lat_rng
    )
    out = decode(
        model,
        variables,
        dec_rng,
        mean_pp,
        ctx=ctx,
        variance=var_pp,
        seg_mask=seg_mask,
        valid_id=vid,
        ret_traj=ret_traj,
        mesh=mesh,
    )
    out.update(
        seg_mask=seg_mask, valid_id=vid, anchors=mean_pp, variance=var_pp, latents=latents
    )
    return out


def reconstruct(
    model: AnchorDiffAE,
    variables,
    rng,
    batch,
    noise=None,
    epoch: int = -1,
    ret_traj: bool = False,
):
    """Encode-and-decode a batch of shapes (anchor_gen.py:1085-1128)."""
    enc_rng, dec_rng = jax.random.split(rng)

    def build():
        def run(variables, batch, noise, epoch, rng):
            return model.apply(
                variables,
                ensure_attn_maps(batch),
                noise,
                epoch,
                method=AnchorDiffAE.prepare_reconstruction,
                rngs={"sample": rng},
            )

        return run

    prep = _cached_jit(("prepare_reconstruction", id(model)), build, model)
    ctx, mean_pp, var_pp, latents = prep(variables, batch, noise, epoch, enc_rng)
    seg_mask = batch["ref_seg_mask"].astype(jnp.int32)
    valid_id = batch.get("present")
    if noise is not None and noise.ndim == 3:
        K = noise.shape[1]
        seg_mask = jnp.repeat(seg_mask, K, axis=0)
        valid_id = jnp.repeat(valid_id, K, axis=0) if valid_id is not None else None
    out = decode(
        model,
        variables,
        dec_rng,
        mean_pp,
        ctx=ctx,
        variance=var_pp,
        seg_mask=seg_mask,
        valid_id=valid_id,
        ret_traj=ret_traj,
    )
    out.update(seg_mask=seg_mask, valid_id=valid_id, anchors=mean_pp, latents=latents)
    return out


def select_best_noise(
    model: AnchorDiffAE, variables, rng, batch, num: Optional[int] = None
):
    """CIMLE noise caching: best-of-N by fit loss (anchor_gen.py:807-813).

    Returns (noise (B, num, D), best_idx (B,), selected (B, D)).
    """
    def build():
        def run(variables, batch, rng):
            return model.apply(
                variables,
                ensure_attn_maps(batch),
                num,
                method=AnchorDiffAE.sample_noise_candidates,
                rngs={"sample": rng},
            )

        return run

    fn = _cached_jit(("sample_noise_candidates", id(model), num), build, model)
    noise, fit = fn(variables, batch, rng)
    best = jnp.argmin(fit, axis=1)
    selected = jnp.take_along_axis(noise, best[:, None, None], axis=1)[:, 0]
    return noise, best, selected
