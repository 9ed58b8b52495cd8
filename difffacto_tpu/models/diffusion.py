"""Anchored Gaussian diffusion: forward kernel, posterior, losses, sampling.

TPU-native re-design of the reference DDPM (reference:
python/difffacto/models/diffusions/anchored_diffusion.py:13-852). The math is
identical — anchored forward kernel
``x_t = sqrt(a_bar_t)(x_0 - a) + a + sqrt(1-a_bar_t) * L * eps`` with the
extra anchor posterior coefficient — but the architecture is functional:

* ``AnchoredDiffusion`` is a frozen config + precomputed schedule; every
  method is a pure function taking an explicit ``model_fn`` (the bound
  denoiser apply) and rng keys;
* the reverse chain (``p_sample_loop``) is a single ``lax.scan`` over
  precomputed step arrays — the reference's per-step python loop with its
  per-step kernel launches (anchored_diffusion.py:566-588) becomes one
  compiled program;
* all tensors are channel-last (B, N, 3).

Supports the full reference option surface: 10 model-mean types, 4 variance
modes (learned-range vb term included), classifier-free guidance, DDIM with
uniform/quad step subsets, per-point ``flags`` masking for dropped parts.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.schedule import (
    DiffusionSchedule,
    ddim_steps,
    ddim_xt_dir_coeff,
    extract,
    make_beta_schedule,
    make_schedule,
)
from ..parallel.axes import fold_points, psum_points, sp_size
from ..utils.gaussian import gaussian_log_likelihood, normal_kl
from ..utils.registry import DIFFUSIONS

# Model mean types (reference utils/constants.py:3-17)
PREVIOUS_X = "prev_x"
START_X = "x_0"
EPSILON = "epsilon"
DRIFTED_EPSILON1 = "drifted_epsilon1"
DRIFTED_EPSILON2 = "drifted_epsilon2"
DRIFTED_EPSILON3 = "drifted_epsilon3"
DRIFTED_EPSILON4 = "drifted_epsilon4"
DRIFTED_EPSILON5 = "drifted_epsilon5"
EPSILON_AND_ANCHOR = "epsilon_and_anchor"
SCALED_EPSILON = "scaled_epsilon"

# Variance modes (constants.py:20-30)
LEARNED = "learned"
LEARNED_RANGE = "learned_range"
FIXED_SMALL = "fixed_small"
FIXED_LARGE = "fixed_large"

ModelFn = Callable[..., jnp.ndarray]


@DIFFUSIONS.register_module()
@dataclasses.dataclass(frozen=True)
class AnchoredDiffusion:
    """Frozen diffusion process. ``net`` config is built by the orchestrator;
    this object is pure math. Constructor args mirror the reference
    (anchored_diffusion.py:15-42)."""

    num_timesteps: int
    beta_1: float
    beta_T: float
    k: float = 1.0
    res: bool = True
    mode: str = "linear"
    use_beta: bool = True
    rescale_timesteps: bool = False
    loss_type: str = "mse"
    model_mean_type: str = EPSILON
    model_var_type: str = FIXED_SMALL
    scale_loss: bool = False
    clip_xstart: bool = False
    include_anchors: bool = True
    include_cov: bool = False
    learn_anchor: bool = True
    learn_variance: bool = False
    classifier_weight: float = 1.0
    guidance: bool = False
    ddim_sampling: bool = False
    ddim_nsteps: int = 10
    ddim_discretize: str = "uniform"
    ddim_eta: float = 1.0
    net: Optional[dict] = None  # consumed by the orchestrator, kept for cfg parity

    def __post_init__(self):
        object.__setattr__(
            self, "schedule", make_schedule(self.num_timesteps, self.beta_1, self.beta_T, self.mode)
        )
        if self.ddim_sampling:
            steps = ddim_steps(self.num_timesteps, self.ddim_nsteps, self.ddim_discretize)
            betas = make_beta_schedule(self.num_timesteps, self.beta_1, self.beta_T, self.mode)
            object.__setattr__(
                self,
                "xt_dir_coeff",
                jnp.asarray(ddim_xt_dir_coeff(betas, self.ddim_eta), jnp.float32),
            )
        else:
            steps = np.arange(self.num_timesteps, dtype=np.int32)
        object.__setattr__(self, "steps", jnp.asarray(steps, jnp.int32))

    # ---------------------------------------------------------------- utils
    def _anchors(self, anchors):
        return anchors if self.learn_anchor else jnp.zeros_like(anchors)

    def _variance(self, variance, like):
        """Per-point variance L^2; defaults to k^2 when not learned
        (anchored_diffusion.py:167-168)."""
        if self.learn_variance:
            assert variance is not None
            return variance
        return jnp.full_like(like, self.k * self.k)

    def scale_timesteps(self, t):
        if self.rescale_timesteps:
            return t.astype(jnp.float32) * (1000.0 / self.num_timesteps)
        if self.use_beta:
            return jnp.take(self.schedule.betas, t)
        return t

    # ------------------------------------------------------------- q kernel
    def q_sample(self, rng, x_start, t, anchors, noise=None, variance=None):
        """Anchored forward kernel (anchored_diffusion.py:148-173)."""
        anchors = self._anchors(anchors)
        if noise is None:
            noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
        variance = self._variance(variance, x_start)
        L = jnp.sqrt(variance)
        s = self.schedule
        nd = x_start.ndim
        return (
            extract(s.sqrt_alphas_cumprod, t, nd) * (x_start - anchors)
            + anchors
            + extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * L * noise
        )

    def q_posterior_mean(self, x_start, x_t, t, anchors):
        anchors = self._anchors(anchors)
        s = self.schedule
        nd = x_t.ndim
        return (
            extract(s.posterior_mean_coef1, t, nd) * x_start
            + extract(s.posterior_mean_coef2, t, nd) * x_t
            + extract(s.posterior_mean_coef3, t, nd) * anchors
        )

    def q_posterior_variance(self, t, variance):
        s = self.schedule
        nd = variance.ndim
        post_var = extract(s.posterior_variance, t, nd) * variance
        post_logvar = extract(s.posterior_log_variance_clipped, t, nd) + jnp.log(variance)
        return post_var, post_logvar

    # ------------------------------------------------------- reverse kernel
    def _predict_xstart_from_eps(self, x_t, t, anchors, eps, L):
        anchors = self._anchors(anchors)
        s = self.schedule
        nd = x_t.ndim
        if L is None:
            L = jnp.ones_like(x_t)
        return (
            extract(s.sqrt_recip_alphas_cumprod, t, nd) * (x_t - anchors)
            + anchors
            - extract(s.sqrt_recipm1_alphas_cumprod, t, nd) * L * eps
        )

    def _predict_xstart_from_drifted_eps(self, x_t, t, eps):
        s = self.schedule
        return extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * (x_t - eps)

    def _predict_xstart_from_xprev(self, x_t, t, anchors, xprev):
        anchors = self._anchors(anchors)
        s = self.schedule
        nd = x_t.ndim
        c1 = extract(s.posterior_mean_coef1, t, nd)
        c2 = extract(s.posterior_mean_coef2, t, nd)
        c3 = extract(s.posterior_mean_coef3, t, nd)
        return (xprev - c2 * x_t - c3 * anchors) / c1

    def _process_xstart(self, x):
        return jnp.clip(x, -10, 10) if self.clip_xstart else x

    def model_input(self, x, anchors, variance):
        """Assemble denoiser input channels (anchored_diffusion.py:249-256)."""
        inp = x - anchors if self.res else x
        if self.include_anchors:
            inp = jnp.concatenate([inp, anchors], axis=-1)
        if self.include_cov:
            inp = jnp.concatenate([inp, variance], axis=-1)
        return inp

    def p_mean_variance(
        self,
        model_fn: ModelFn,
        x,
        t,
        anchors,
        ctx=None,
        variance=None,
        seg_mask=None,
        valid_id=None,
        frozen_out=None,
    ):
        """Posterior parameters from the model (anchored_diffusion.py:227-395)."""
        s = self.schedule
        nd = x.ndim
        inp = self.model_input(x, anchors, variance)
        ts = self.scale_timesteps(t)

        if frozen_out is not None:
            model_output = frozen_out
        else:
            model_output = model_fn(inp, ts, ctx, anchors, variance, seg_mask, valid_id)
            if self.guidance:
                uncond_ctx = jax.tree_util.tree_map(jnp.zeros_like, ctx)
                uncond = model_fn(inp, ts, uncond_ctx, anchors, variance, seg_mask, valid_id)
                model_output = (
                    1.0 - self.classifier_weight
                ) * uncond + self.classifier_weight * model_output

        C = x.shape[-1]
        if self.model_var_type in (LEARNED, LEARNED_RANGE):
            model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
            if self.model_var_type == LEARNED:
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = extract(s.posterior_log_variance_clipped, t, nd)
                max_log = extract(s.log_betas, t, nd)
                frac = (model_var_values + 1) / 2
                model_log_variance = frac * max_log + (1 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        else:
            fixed = {
                FIXED_LARGE: (s.fixed_large_variance, s.fixed_large_log_variance),
                FIXED_SMALL: (s.posterior_variance, s.posterior_log_variance_clipped),
            }[self.model_var_type]
            model_variance = extract(fixed[0], t, nd)
            model_log_variance = extract(fixed[1], t, nd)

        variance = self._variance(variance, x)
        L = jnp.sqrt(variance)
        # Scale the per-timestep variance by the per-point variance
        # (anchored_diffusion.py:307-314).
        model_sqrt_log_variance = 0.5 * model_log_variance + jnp.log(L)
        model_variance = model_variance * variance
        model_log_variance = model_log_variance + jnp.log(variance)

        mt = self.model_mean_type
        if mt == PREVIOUS_X:
            pred_xstart = self._process_xstart(
                self._predict_xstart_from_xprev(x, t, anchors, model_output)
            )
            model_mean = model_output
            xt_dir = None
        else:
            out = model_output
            if mt == DRIFTED_EPSILON1:
                out = extract(s.sqrt_recip_alphas_cumprod, t, nd) * out
                pred_xstart = self._process_xstart(self._predict_xstart_from_drifted_eps(x, t, out))
            elif mt == DRIFTED_EPSILON3:
                out = extract(s.sqrt_recipm1_alphas_cumprod, t, nd) * out
                pred_xstart = self._process_xstart(self._predict_xstart_from_drifted_eps(x, t, out))
            elif mt == DRIFTED_EPSILON4:
                out = out - anchors
                pred_xstart = self._process_xstart(self._predict_xstart_from_drifted_eps(x, t, out))
            elif mt == DRIFTED_EPSILON5:
                # Reference QUIRK: the DR5 transform inside the drift branch is
                # DEAD CODE (anchored_diffusion.py:347-348 sits under an elif
                # that only admits DR1-DR4, :340), so at sampling time DR5
                # falls through to the plain-epsilon branch (:364-367).
                # Reproduce the shipped behavior, not the dead intent; pinned
                # by tests/test_reference_parity.py::test_mean_type_sweep.
                pred_xstart = self._process_xstart(
                    self._predict_xstart_from_eps(x, t, anchors, out, L)
                )
            elif mt == DRIFTED_EPSILON2:
                pred_xstart = self._process_xstart(self._predict_xstart_from_drifted_eps(x, t, out))
            elif mt == START_X:
                pred_xstart = self._process_xstart(out)
            elif mt == EPSILON_AND_ANCHOR:
                pred_eps, pred_anchor = jnp.split(out, 2, axis=-1)
                pred_xstart = self._process_xstart(
                    self._predict_xstart_from_eps(x, t, pred_anchor, pred_eps, L)
                )
            elif mt == SCALED_EPSILON:
                pred_xstart = self._process_xstart(
                    self._predict_xstart_from_eps(x, t, anchors, out, None)
                )
            elif mt == EPSILON:
                pred_xstart = self._process_xstart(
                    self._predict_xstart_from_eps(x, t, anchors, out, L)
                )
            else:
                raise NotImplementedError(mt)
            xt_dir = (
                L * extract(self.xt_dir_coeff, t, nd) * out if self.ddim_sampling else None
            )
            model_mean = self.q_posterior_mean(pred_xstart, x, t, anchors)

        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
            "sqrt_log_variance": model_sqrt_log_variance,
            "xt_dir": xt_dir,
        }

    def p_sample(self, model_fn, rng, x, t, anchors, ctx=None, variance=None, seg_mask=None, valid_id=None, noise=None):
        """One reverse step (anchored_diffusion.py:450-484).

        ``noise`` overrides the per-step Gaussian draw (used by
        ``p_sample_loop`` to feed precomputed scan xs instead of running a
        small threefry kernel every step)."""
        out = self.p_mean_variance(model_fn, x, t, anchors, ctx, variance, seg_mask, valid_id)
        if noise is None:
            noise = jax.random.normal(rng, x.shape, x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        if self.ddim_sampling:
            anchors_eff = self._anchors(anchors)
            s = self.schedule
            sample = (
                (out["pred_xstart"] - anchors_eff)
                * jnp.sqrt(extract(s.alphas_cumprod_prev, t, x.ndim))
                + anchors_eff
                + out["xt_dir"]
                + self.ddim_eta * nonzero * jnp.sqrt(out["variance"]) * noise
            )
        else:
            sample = out["mean"] + nonzero * jnp.sqrt(out["variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def p_sample_loop(
        self,
        model_fn: ModelFn,
        rng,
        anchors,
        ctx=None,
        variance=None,
        seg_mask=None,
        valid_id=None,
        noise=None,
        ret_traj: bool = False,
        ret_interval: int = 20,
        step_noise=None,
    ):
        """Full reverse chain as one ``lax.scan``.

        Returns dict with 'pred' (B, N, 3); when ``ret_traj``, also
        'traj' (T_kept, B, N, 3) with 'traj_t' step labels — the scan-native
        equivalent of the reference's generator keeping every
        ``ret_interval``-th step (anchor_gen.py:145-169).

        ``step_noise`` (T, B, N, 3), optional: per-step Gaussian draws fed as
        scan xs instead of in-loop threefry (deterministic replay — the
        golden reverse-chain parity test against the reference's
        ``p_sample_loop_progressive``, anchored_diffusion.py:529-588;
        throughput-neutral per the A/B note below).
        """
        # Chain state/math stays f32 regardless of the denoiser's compute
        # dtype — schedule coefficients are f32 and bf16 accumulation over
        # 100 steps visibly degrades sample quality.
        anchors = anchors.astype(jnp.float32)
        if variance is not None:
            variance = variance.astype(jnp.float32)
        var_full = self._variance(variance, anchors)
        L = jnp.sqrt(var_full)
        init_rng, chain_rng = jax.random.split(rng)
        if noise is None:
            x_T = L * jax.random.normal(init_rng, anchors.shape, anchors.dtype) + (
                anchors if self.learn_anchor else 0.0
            )
        else:
            x_T = noise

        steps = self.steps[::-1]  # descending
        # Per-step threefry draw inside the scan body. A/B-measured against
        # precomputing the whole chain's noise as (T, B, N, 3) scan xs:
        # identical throughput at the headline workload (177.8 vs 178.0
        # shapes/s, ±2 noise), so the inline draw wins on HBM footprint
        # (the xs variant materializes ~314 MB).
        step_rngs = jax.random.split(chain_rng, steps.shape[0])

        def body(x, inp):
            if step_noise is None:
                t_scalar, srng = inp
                eps = None
            else:
                t_scalar, srng, eps = inp
            t = jnp.full((x.shape[0],), t_scalar, jnp.int32)
            out = self.p_sample(
                model_fn, srng, x, t, anchors, ctx, variance, seg_mask,
                valid_id, noise=eps,
            )
            nxt = out["sample"]
            y = nxt if ret_traj else jnp.zeros((0,), x.dtype)
            return nxt, y

        xs = (
            (steps, step_rngs)
            if step_noise is None
            else (steps, step_rngs, step_noise.astype(anchors.dtype))
        )
        final, traj = jax.lax.scan(body, x_T, xs)
        result = {"pred": final}
        if ret_traj:
            keep = np.asarray(self.steps)[::-1] % ret_interval == 0
            keep_idx = np.nonzero(keep)[0]
            result["traj"] = traj[keep_idx]
            result["traj_t"] = np.asarray(self.steps)[::-1][keep_idx]
        return result

    def q_sample_loop(self, rng, gt, anchors, variance=None, noise=None):
        """Forward-chain visualization (anchored_diffusion.py:625-639)."""
        if noise is None:
            noise = jax.random.normal(rng, gt.shape, gt.dtype)
        ts = jnp.arange(1, self.num_timesteps, dtype=jnp.int32)

        def body(_, t_scalar):
            t = jnp.full((gt.shape[0],), t_scalar, jnp.int32)
            return None, self.q_sample(None, gt, t, anchors, noise=noise, variance=variance)

        _, traj = jax.lax.scan(body, None, ts)
        return traj

    # ---------------------------------------------------------------- loss
    def _vb_terms(
        self, model_fn, x_start, x_t, t, anchors, ctx, variance, frozen_out, seg_mask, flags
    ):
        """Variational-bound term for learned variance
        (anchored_diffusion.py:641-688, diagonalized sanely)."""
        C = x_start.shape[-1]
        var_full = self._variance(variance, x_start)
        true_mean = self.q_posterior_mean(x_start, x_t, t, anchors)
        true_var, true_logvar = self.q_posterior_variance(t, var_full)
        out = self.p_mean_variance(
            model_fn, x_t, t, anchors, ctx, variance, seg_mask, None, frozen_out=frozen_out
        )
        kl = normal_kl(true_mean, true_logvar, out["mean"], out["log_variance"], dim=C)
        kl = kl.sum(-1)  # (B, N)
        nll = -gaussian_log_likelihood(
            x_start, out["mean"], out["log_variance"], dim=C
        ).sum(-1)
        if flags is not None:
            f = flags.reshape(flags.shape[0], -1)
            fsum = psum_points(f.sum(1))
            kl = psum_points((kl * f).sum(1)) / (fsum * math.log(2.0))
            nll = psum_points((nll * f).sum(1)) / (fsum * math.log(2.0))
        else:
            npts = kl.shape[-1] * sp_size()
            kl = psum_points(kl.sum(-1)) / (npts * math.log(2.0))
            nll = psum_points(nll.sum(-1)) / (npts * math.log(2.0))
        return jnp.where(t == 0, nll, kl)

    def training_losses(
        self,
        model_fn: ModelFn,
        rng,
        x_start,
        t,
        anchors=None,
        variance=None,
        ctx=None,
        seg_mask=None,
        valid_id=None,
        flags=None,
        noise=None,
        reduce: bool = True,
    ):
        """MSE (+vb) training loss (anchored_diffusion.py:760-852).

        flags: optional (B, N) per-point mask for dropped parts.
        """
        s = self.schedule
        loss_dict = {}
        if anchors is None:
            anchors = jnp.zeros_like(x_start)
        if noise is None:
            # Per-point noise: decorrelate across point shards (replicated
            # draws like timesteps come from the unfolded stream upstream).
            noise = jax.random.normal(fold_points(rng), x_start.shape, x_start.dtype)
        nd = x_start.ndim
        ori_anchors = anchors
        anchors_eff = self._anchors(anchors)
        x_t = self.q_sample(None, x_start, t, anchors_eff, noise=noise, variance=variance)

        inp = self.model_input(x_t, ori_anchors, variance)
        model_output = model_fn(
            inp, self.scale_timesteps(t), ctx, ori_anchors, variance, seg_mask, valid_id
        )

        if self.model_var_type in (LEARNED, LEARNED_RANGE):
            model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
            loss_dict["model_var_value"] = psum_points(model_var_values.sum()) / (
                model_var_values.size * sp_size()
            )
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(model_output), model_var_values], axis=-1
            )
            vb = self._vb_terms(
                model_fn, x_start, x_t, t, ori_anchors, ctx, variance, frozen, seg_mask, flags
            ).mean()
            loss_dict["vb_loss"] = vb * self.num_timesteps / 1000.0

        var_full = self._variance(variance, x_start)
        L = jnp.sqrt(var_full)
        sa = extract(s.sqrt_alphas_cumprod, t, nd)
        soma = extract(s.sqrt_one_minus_alphas_cumprod, t, nd)
        sra = extract(s.sqrt_recip_alphas_cumprod, t, nd)
        srma = extract(s.sqrt_recipm1_alphas_cumprod, t, nd)
        target = {
            START_X: lambda: x_start,
            EPSILON: lambda: noise,
            SCALED_EPSILON: lambda: L * noise,
            DRIFTED_EPSILON1: lambda: (1.0 - sa) * anchors_eff + soma * noise,
            DRIFTED_EPSILON2: lambda: (sra - 1.0) * anchors_eff + srma * noise,
            DRIFTED_EPSILON3: lambda: (1.0 - sa) / soma * anchors_eff + L * noise,
            DRIFTED_EPSILON4: lambda: sra * anchors_eff + srma * noise,
            DRIFTED_EPSILON5: lambda: (1.0 - sa) / soma * anchors_eff / L + noise,
            EPSILON_AND_ANCHOR: lambda: jnp.concatenate([noise, anchors_eff], axis=-1),
        }[self.model_mean_type]()

        diff = (target - model_output) ** 2
        if flags is not None:
            diff = diff * flags[..., None]
        if reduce:
            if flags is not None:
                diff = psum_points(diff.mean(-1).sum()) / psum_points(flags.sum())
            else:
                diff = psum_points(diff.sum()) / (diff.size * sp_size())
        if self.scale_loss:
            b = extract(s.betas, t, diff.ndim if hasattr(diff, "ndim") else 1)
            acp = extract(s.alphas_cumprod, t, diff.ndim if hasattr(diff, "ndim") else 1)
            diff = diff * b * b / (2 * (1.0 - b) * (1.0 - acp))
        loss_dict["mse_loss"] = diff
        return loss_dict
