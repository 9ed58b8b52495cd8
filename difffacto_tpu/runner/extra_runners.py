"""Secondary runners: per-part pretraining, latent GAN, mixing, language.

Re-implements the reference's specialized training/eval loops (reference:
python/difffacto/runner/pretrain_runner.py:37-261, gan_runner.py:17-440,
mixing_runner.py:10-124, language_runner.py:17-…) on jitted train steps.
Each subclasses ``Runner``'s config plumbing and replaces the step.
"""

from __future__ import annotations

import functools
import os
import pickle
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import AnchorDiffAE
from ..models.anchor_diff import decode
from ..models.gan import dis_loss, gen_loss, gradient_penalty
from ..parallel.optim import build_optimizer_from_cfg
from ..parallel.train import parse_losses
from ..utils.registry import DISCRIMINATORS, GENERATORS, build_from_cfg
from .runner import Runner, check_interval, device_batch


def _split_parts(batch, n_class: int, pts_per_part: int, rng: np.random.RandomState):
    """Per-part normalized clouds (B, K, Np, 3) from a dataset batch —
    the host-side prep PretrainRunner does (pretrain_runner.py:151-184)."""
    ref = np.asarray(batch["ref"])
    seg = np.asarray(batch["ref_seg_mask"])
    B = ref.shape[0]
    out = np.zeros((B, n_class, pts_per_part, 3), np.float32)
    for b in range(B):
        for k in range(n_class):
            idx = np.nonzero(seg[b] == k)[0]
            if len(idx) == 0:
                continue
            sel = rng.choice(idx, pts_per_part, replace=True)
            part = ref[b, sel]
            m, s = part.mean(0), part.std(0).clip(1e-2, None)
            out[b, k] = (part - m) / s
    return jnp.asarray(out)


class PretrainRunner(Runner):
    """Per-part diffusion pretraining (pretrain_runner.py:37-261)."""

    def __init__(self, args=None, cfg=None):
        if cfg is not None and cfg.model is not None:
            cfg.model.pretrain_prior = True
        super().__init__(args=args, cfg=cfg)
        self.pts_per_part = int(self.cfg.pts_per_part or 512)
        self._np_rng = np.random.RandomState(self.seed)

        model = self.model

        @jax.jit
        def step(state, part_inputs, rng):
            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                outs, mutated = model.apply(
                    variables, part_inputs, method=AnchorDiffAE.pretrain_loss,
                    rngs={"sample": rng, "dropout": jax.random.fold_in(rng, 1)},
                    mutable=["batch_stats"],
                )
                total, means = parse_losses(outs)
                return total, (means, mutated.get("batch_stats", {}))

            (total, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics["total_loss"] = total
            return (
                state.replace(
                    step=state.step + 1, params=params,
                    batch_stats=new_stats or state.batch_stats, opt_state=new_opt,
                ),
                metrics,
            )

        self._pretrain_step = step

    def _init_variables(self, example):
        from ..parallel.train import TrainState

        parts = jnp.zeros(
            (2, self.model.num_anchors, int(self.cfg.pts_per_part or 512), 3),
            jnp.float32,
        )
        rngs = {
            "params": jax.random.PRNGKey(self.seed),
            "sample": jax.random.PRNGKey(self.seed + 1),
            "dropout": jax.random.PRNGKey(self.seed + 2),
        }
        variables = jax.jit(
            lambda r, p: self.model.init(r, p, method=AnchorDiffAE.pretrain_loss)
        )(rngs, parts)
        return TrainState.create(variables, self.tx)

    def train(self):
        rng = jax.random.PRNGKey(self.seed + self.epoch)
        for i, batch in enumerate(self.train_loader):
            parts = _split_parts(batch, self.model.num_anchors, self.pts_per_part, self._np_rng)
            rng, sub = jax.random.split(rng)
            self.state, metrics = self._pretrain_step(self.state, parts, sub)
            self.iter += 1
            if check_interval(self.iter, self.log_interval):
                self.logger.log(
                    {k: float(np.mean(v)) for k, v in metrics.items()}, step=self.iter
                )
        self.epoch += 1

    def val(self):
        variables = self.state.variables()
        outs = self.model.apply(
            variables, 4, self.pts_per_part, method=AnchorDiffAE.pretrain_sample,
            rngs={"sample": jax.random.PRNGKey(self.seed)},
        )
        out_dir = os.path.join(self.work_dir, "val")
        os.makedirs(out_dir, exist_ok=True)
        np.savez(
            os.path.join(out_dir, f"pretrain_samples_{self.epoch}.npz"),
            **{f"part_{i}": np.asarray(o) for i, o in enumerate(outs)},
        )
        return {}


class GanRunner(Runner):
    """Latent GAN over frozen encoder codes (gan_runner.py:17-440)."""

    def __init__(self, args=None, cfg=None):
        super().__init__(args=args, cfg=cfg)
        cfg = self.cfg
        self.generator = build_from_cfg(
            (cfg.generator or dict(type="Generator")).dump()
            if hasattr(cfg.generator or {}, "dump")
            else dict(cfg.generator or dict(type="Generator")),
            GENERATORS,
        )
        self.discriminator = build_from_cfg(
            (cfg.discriminator or dict(type="Discriminator")).dump()
            if hasattr(cfg.discriminator or {}, "dump")
            else dict(cfg.discriminator or dict(type="Discriminator")),
            DISCRIMINATORS,
        )
        self.gan_loss_type = cfg.gan_loss_type or "wgan"
        self.gp_weight = cfg.gp_weight if cfg.gp_weight is not None else 10.0
        # reference GanRunner default (utils/gan_losses.py:68 gp_type kwarg)
        self.gp_type = getattr(cfg, "gp_type", None) or "zero_center"
        self.n_critic = cfg.n_critic or 5

        rng = jax.random.PRNGKey(self.seed)
        z0 = self.generator.sample_noise(rng, 2)
        self.g_vars = self.generator.init({"params": rng}, z0)
        fake0 = self.generator.apply(self.g_vars, z0)
        self.d_vars = self.discriminator.init({"params": rng}, fake0)
        self.g_tx = build_optimizer_from_cfg(dict(type="Adam", lr=cfg.g_lr or 1e-4, betas=(0.5, 0.9)))
        self.d_tx = build_optimizer_from_cfg(dict(type="Adam", lr=cfg.d_lr or 1e-4, betas=(0.5, 0.9)))
        self.g_opt = self.g_tx.init(self.g_vars["params"])
        self.d_opt = self.d_tx.init(self.d_vars["params"])
        self._build_steps()

    def _build_steps(self):
        gen_mod, dis_mod = self.generator, self.discriminator
        kind, gp_w, gp_type = self.gan_loss_type, self.gp_weight, self.gp_type

        @jax.jit
        def d_step(d_params, d_opt, g_vars, real_codes, rng):
            z = gen_mod.sample_noise(rng, real_codes.shape[0])
            fake = gen_mod.apply(g_vars, z)

            def loss_fn(p):
                dv = {"params": p}
                real_s = dis_mod.apply(dv, real_codes)
                fake_s = dis_mod.apply(dv, fake)
                l = dis_loss(real_s, fake_s, kind)
                if kind == "wgan" and gp_w > 0:
                    l = l + gradient_penalty(
                        lambda x: dis_mod.apply(dv, x), rng, real_codes, fake, gp_w,
                        gp_type=gp_type,
                    )
                return l

            l, g = jax.value_and_grad(loss_fn)(d_params)
            upd, d_opt = self.d_tx.update(g, d_opt, d_params)
            return optax.apply_updates(d_params, upd), d_opt, l

        @functools.partial(jax.jit, static_argnums=(4,))
        def g_step(g_params, g_opt, d_vars, rng, batch_size):
            z = gen_mod.sample_noise(rng, batch_size)

            def loss_fn(p):
                fake = gen_mod.apply({"params": p}, z)
                return gen_loss(dis_mod.apply(d_vars, fake), kind)

            l, g = jax.value_and_grad(loss_fn)(g_params)
            upd, g_opt = self.g_tx.update(g, g_opt, g_params)
            return optax.apply_updates(g_params, upd), g_opt, l

        self._d_step = d_step
        self._g_step = g_step

    def real_codes(self, batch):
        """Frozen-encoder part codes as GAN 'real' samples (gan_runner.py:141-180)."""
        variables = self.state.variables()
        db = device_batch(batch)

        def enc(mdl, x, flag):
            m, _ = mdl.encoder_mod.get_part_code(x, flag, train=False)
            return m

        return self.model.apply(variables, db["input"], db["ref_attn_map"], method=enc)

    def train(self):
        rng = jax.random.PRNGKey(self.seed + self.epoch)
        for i, batch in enumerate(self.train_loader):
            codes = self.real_codes(batch)
            rng, r1, r2 = jax.random.split(rng, 3)
            dp, self.d_opt, dl = self._d_step(
                self.d_vars["params"], self.d_opt, self.g_vars, codes, r1
            )
            self.d_vars = {"params": dp}
            if i % self.n_critic == 0:
                gp, self.g_opt, gl = self._g_step(
                    self.g_vars["params"], self.g_opt, self.d_vars, r2, int(codes.shape[0])
                )
                self.g_vars = {"params": gp}
            self.iter += 1
            if check_interval(self.iter, self.log_interval):
                self.logger.log(
                    {"d_loss": float(dl), "g_loss": float(gl)}, step=self.iter
                )
        self.epoch += 1

    def generate_codes(self, num: int, rng):
        z = self.generator.sample_noise(rng, num)
        return self.generator.apply(self.g_vars, z)


class MixingRunner(Runner):
    """Part mixing over a dataset of generated shapes (mixing_runner.py:10-124)."""

    def mixing(self, seed: int = 0):
        from .editing import combine_latent

        rng = jax.random.PRNGKey(seed)
        outs = []
        for batch in self.val_loader:
            rng, sub = jax.random.split(rng)
            outs.append(
                combine_latent(self.model, self.state.variables(), sub, device_batch(batch))
            )
        out_dir = os.path.join(self.work_dir, "mixing")
        os.makedirs(out_dir, exist_ok=True)
        merged = {
            k: np.concatenate([o[k] for o in outs]) for k in outs[0] if isinstance(outs[0][k], np.ndarray)
        }
        with open(os.path.join(out_dir, "mixing.pkl"), "wb") as f:
            pickle.dump(merged, f)
        self.logger.print_log(f"mixing results -> {out_dir}/mixing.pkl")
        return merged


class LanguageRunner(Runner):
    """Language-editing training (language_runner.py:17-…): trains the LSTM
    encoder + update MLP with contrastive/triplet losses over text triplets."""

    def _init_variables(self, example):
        from ..parallel.train import TrainState

        rngs = {
            "params": jax.random.PRNGKey(self.seed),
            "sample": jax.random.PRNGKey(self.seed + 1),
            "dropout": jax.random.PRNGKey(self.seed + 2),
        }
        # init through BOTH the standard loss (full model tree) and the
        # language step (LSTM + update MLP), then merge the param trees.
        # The language dataset yields shape triplets; slice one shape per
        # item to form a standard batch for the base init.
        K = self.model.num_anchors
        B, _, N = example["input"].shape[:3]
        base_batch = {
            "input": example["input"][:, 0],
            "ref": example["ref"][:, 0],
            "ref_seg_mask": example["ref_seg_mask"][:, 0],
            "seg_mask": example["seg_mask"][:, 0],
            "ref_attn_map": example["ref_attn_map"][:, 0],
            "attn_map": example["attn_map"][:, 0],
            "present": jnp.ones((B, K), jnp.float32),
            "dp_present": jnp.ones((B, K), jnp.float32),
            "part_shift": jnp.zeros((B, K, 3), jnp.float32),
            "part_scale": jnp.ones((B, K, 3), jnp.float32),
            "noise": jnp.zeros((B, 1), jnp.float32),
        }
        base = jax.jit(
            lambda r, b: self.model.init(r, b, 0, method=AnchorDiffAE.loss)
        )(rngs, base_batch)
        lang_batch = {
            "input": jnp.zeros((2, 3, 64, 3), jnp.float32),
            "attn_map": jnp.zeros((2, 3, 64, self.model.num_anchors), jnp.float32),
            "part_indicator": jnp.tile(jnp.eye(self.model.num_anchors)[0][None], (2, 1)),
            "text": jnp.zeros((2, 8), jnp.int32),
        }
        lang = jax.jit(
            lambda r, b: self.model.init(r, b, method=AnchorDiffAE.language_train_step)
        )(rngs, lang_batch)

        import flax

        merged = flax.core.unfreeze(base)
        lang_u = flax.core.unfreeze(lang)

        def merge(a, b):
            for k, v in b.items():
                if k in a and isinstance(a[k], dict) and isinstance(v, dict):
                    merge(a[k], v)
                else:
                    a.setdefault(k, v)
            return a

        for col in lang_u:
            merged.setdefault(col, {})
            merge(merged[col], lang_u[col])
        return TrainState.create(merged, self.tx)

    def __init__(self, args=None, cfg=None):
        if cfg is not None and cfg.model is not None:
            cfg.model.train_language = True
        super().__init__(args=args, cfg=cfg)

        model = self.model

        @jax.jit
        def step(state, batch, rng):
            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                outs, mutated = model.apply(
                    variables, batch, method=AnchorDiffAE.language_train_step,
                    rngs={"sample": rng, "dropout": jax.random.fold_in(rng, 1)},
                    mutable=["batch_stats"],
                )
                total, means = parse_losses(outs)
                return total, (means, mutated.get("batch_stats", {}))

            (total, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            # only language modules train (language_runner trains enc+mlp)
            grads = jax.tree_util.tree_map_with_path(
                lambda path, g: g
                if any("language" in str(p) or "update_mlp" in str(p) for p in path)
                else jnp.zeros_like(g),
                grads,
            )
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics["total_loss"] = total
            return (
                state.replace(
                    step=state.step + 1, params=params,
                    batch_stats=new_stats or state.batch_stats, opt_state=new_opt,
                ),
                metrics,
            )

        self._language_step = step

    def train(self):
        rng = jax.random.PRNGKey(self.seed + self.epoch)
        for i, batch in enumerate(self.train_loader):
            db = {
                k: jnp.asarray(np.asarray(v))
                for k, v in batch.items()
                if k in ("input", "ref", "attn_map", "ref_attn_map", "seg_mask",
                         "ref_seg_mask", "part_indicator", "text")
            }
            rng, sub = jax.random.split(rng)
            self.state, metrics = self._language_step(self.state, db, sub)
            self.iter += 1
            if check_interval(self.iter, self.log_interval):
                self.logger.log(
                    {k: float(np.mean(v)) for k, v in metrics.items()}, step=self.iter
                )
        self.epoch += 1
