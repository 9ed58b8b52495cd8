"""PointFlow: continuous normalizing flows for part-based clouds.

Re-implements the reference PointFlow orchestrator and its CNF stack
(reference: python/difffacto/models/networks/flow.py:13-230 and
flow_utils/cnf.py:33, odefunc.py:59-137). The torchdiffeq adjoint ODE
becomes a fixed-step RK4 integrator inside ``lax.scan`` — jit/grad-friendly
with static step counts — with exact divergence for the 3-D point flow
(three forward-mode JVPs) and a Hutchinson estimator for the latent flow.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.gaussian import gaussian_entropy, standard_normal_logprob
from ..utils.registry import ENCODERS, MODELS, build_from_cfg
from .part_encoder import gather_per_point


class ConcatSquashODE(nn.Module):
    """Concat-squash ODE dynamics f(y, t, ctx) (flow_utils/odefunc.py:59-137)."""

    dims: Sequence[int]
    out_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, y, t, ctx):
        """y (..., D), t scalar, ctx (..., C) broadcastable to y's batch."""
        cond = jnp.concatenate(
            [jnp.broadcast_to(jnp.atleast_1d(t), ctx.shape[:-1] + (1,)), ctx], axis=-1
        )
        h = y
        for i, f in enumerate(self.dims):
            gate = jax.nn.sigmoid(nn.Dense(f, name=f"gate_{i}", dtype=self.dtype)(cond))
            bias = nn.Dense(f, use_bias=False, name=f"bias_{i}", dtype=self.dtype)(cond)
            h = nn.Dense(f, name=f"lin_{i}", dtype=self.dtype)(h) * gate + bias
            h = jnp.tanh(h)
        gate = jax.nn.sigmoid(nn.Dense(self.out_dim, name="gate_out", dtype=self.dtype)(cond))
        bias = nn.Dense(self.out_dim, use_bias=False, name="bias_out", dtype=self.dtype)(cond)
        return nn.Dense(self.out_dim, name="lin_out", dtype=self.dtype)(h) * gate + bias


class CNF(nn.Module):
    """Fixed-step RK4 CNF with divergence accounting.

    ``exact_trace`` uses D forward-mode JVPs (right for D=3 points);
    otherwise a single-probe Hutchinson estimate (latent flows).
    """

    dims: Sequence[int] = (256, 256, 256)
    out_dim: int = 3
    steps: int = 20
    T: float = 0.5
    exact_trace: bool = True
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.ode = ConcatSquashODE(self.dims, self.out_dim, dtype=self.dtype)

    def _f_and_div(self, y, t, ctx, eps):
        f = lambda yy: self.ode(yy, t, ctx)
        val = f(y)
        if self.exact_trace:
            div = jnp.zeros(y.shape[:-1], y.dtype)
            for i in range(self.out_dim):
                basis = jnp.zeros_like(y).at[..., i].set(1.0)
                _, jvp = jax.jvp(f, (y,), (basis,))
                div = div + jvp[..., i]
        else:
            _, jvp = jax.jvp(f, (y,), (eps,))
            div = (jvp * eps).sum(-1)
        return val, div

    def __call__(self, y, ctx, logp=None, reverse: bool = False, eps=None):
        """Integrate y over [0, T] (or reversed). y (..., D); ctx broadcast.

        Returns (y_out, delta_logp) where logp_out = logp + delta (forward
        accumulates -div like the reference convention)."""
        dt = self.T / self.steps
        if reverse:
            dt = -dt
        t0 = self.T if reverse else 0.0
        if eps is None:
            eps = jnp.ones_like(y)

        def rk4(mdl, carry, i):
            y, dl = carry
            t = t0 + dt * i.astype(y.dtype)

            k1, d1 = mdl._f_and_div(y, t, ctx, eps)
            k2, d2 = mdl._f_and_div(y + 0.5 * dt * k1, t + 0.5 * dt, ctx, eps)
            k3, d3 = mdl._f_and_div(y + 0.5 * dt * k2, t + 0.5 * dt, ctx, eps)
            k4, d4 = mdl._f_and_div(y + dt * k3, t + dt, ctx, eps)
            y = y + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
            dl = dl + dt / 6.0 * (d1 + 2 * d2 + 2 * d3 + d4)
            return (y, dl), None

        init = (y, jnp.zeros(y.shape[:-1], y.dtype))
        (y_out, div_int), _ = nn.scan(
            rk4,
            variable_broadcast="params",
            split_rngs={"params": False},
        )(self, init, jnp.arange(self.steps))
        delta_logp = -div_int  # density change along the path
        if logp is None:
            return y_out, delta_logp
        return y_out, logp + delta_logp


@MODELS.register_module()
class PointFlow(nn.Module):
    """CNF-based part generative model (networks/flow.py:13-230)."""

    encoder: dict
    point_cnf: dict
    latent_cnf: dict
    part_aligner: Optional[dict] = None
    input_dim: int = 3
    zdim: int = 128
    n_class: int = 4
    use_latent_flow: bool = True
    use_deterministic_encoder: bool = False
    prior_weight: float = 1.0
    recon_weight: float = 1.0
    entropy_weight: float = 1.0
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.encoder_mod = build_from_cfg(dict(self.encoder), ENCODERS, dtype=self.dtype)
        pc = dict(self.point_cnf)
        self.point_flow = CNF(
            dims=tuple(pc.get("dims", (256, 256, 256))),
            out_dim=self.input_dim,
            steps=pc.get("steps", 20),
            exact_trace=True,
            dtype=self.dtype,
        )
        if self.use_latent_flow:
            lc = dict(self.latent_cnf)
            self.latent_flows = [
                CNF(
                    dims=tuple(lc.get("dims", (256, 256))),
                    out_dim=self.zdim,
                    steps=lc.get("steps", 10),
                    exact_trace=False,
                    dtype=self.dtype,
                )
                for _ in range(self.n_class)
            ]
        self.aligner = (
            build_from_cfg(dict(self.part_aligner), ENCODERS, dtype=self.dtype)
            if self.part_aligner
            else None
        )

    def loss(self, batch, epoch=0) -> Dict[str, jnp.ndarray]:
        x = batch["input"]
        ref = batch["ref"]
        seg_mask = batch["ref_seg_mask"].astype(jnp.int32)
        seg_flag = batch["attn_map"]
        valid_id = batch["present"]
        B, N, _ = ref.shape

        if self.encoder["type"] == "PointNetV2":
            z_mu, z_sigma = self.encoder_mod(x, seg_flag, train=True)
        else:
            # whole-cloud VAE encoders take [xyz | seg one-hot] channels
            z_mu, z_sigma = self.encoder_mod(
                jnp.concatenate([x, seg_flag], axis=-1), train=True
            )
        if self.use_deterministic_encoder:
            z = z_mu
            entropy = jnp.zeros((B,), ref.dtype)
        else:
            from ..utils.gaussian import reparameterize_gaussian

            z = reparameterize_gaussian(self.make_rng("sample"), z_mu, z_sigma)
            entropy = gaussian_entropy(z_sigma.reshape(B * self.n_class, -1), axis=-1)

        loss_dict = {}
        mean = logvar = None
        if self.aligner is not None:
            mean, logvar = self.aligner(z, valid_id, deterministic=False)
            mean_pp, logvar_pp, _ = (
                gather_per_point(mean, seg_mask),
                gather_per_point(logvar, seg_mask),
                None,
            )
            from ..utils.gaussian import gaussian_log_likelihood

            loss_dict["fit_loss"] = -gaussian_log_likelihood(
                ref, mean_pp, logvar_pp
            ).mean()

        # latent prior via per-part CNFs
        if self.use_latent_flow:
            log_pz_parts = []
            for i in range(self.n_class):
                w, delta = self.latent_flows[i](z[:, i], jnp.zeros((B, 1), z.dtype))
                log_pw = standard_normal_logprob(w).sum(-1)
                log_pz_parts.append(log_pw - delta * valid_id[:, i])
            log_pz = jnp.stack(log_pz_parts, 1).sum(1) / valid_id.sum(1)
        else:
            log_pz = jnp.zeros((B,), ref.dtype)

        # reconstruction likelihood via the point CNF conditioned on latents
        ctx_vec = z.reshape(B, -1)
        if mean is not None:
            ctx_vec = jnp.concatenate(
                [ctx_vec, mean.reshape(B, -1), jnp.exp(logvar).reshape(B, -1)], axis=-1
            )
        ctx_pp = jnp.broadcast_to(ctx_vec[:, None], (B, N, ctx_vec.shape[-1]))
        y, delta_log_py = self.point_flow(ref, ctx_pp)
        log_py = standard_normal_logprob(y).sum(-1)  # (B, N)
        log_px = log_py.sum(-1) - delta_log_py.sum(-1)

        loss_dict["entropy_loss"] = -entropy.mean() * self.entropy_weight
        loss_dict["recon_loss"] = -log_px.mean() * self.recon_weight / N
        loss_dict["prior_loss"] = -log_pz.mean() * self.prior_weight
        return loss_dict

    def sample(self, sample_num: int, num_points: int, valid_id=None):
        """Sample latents through the latent CNFs (reverse), then points
        through the point CNF (reverse)."""
        rngs = self.make_rng("sample")
        r1, r2 = jax.random.split(rngs)
        w = jax.random.normal(r1, (sample_num, self.n_class, self.zdim))
        if self.use_latent_flow:
            zs = []
            for i in range(self.n_class):
                zi, _ = self.latent_flows[i](w[:, i], jnp.zeros((sample_num, 1)), reverse=True)
                zs.append(zi)
            z = jnp.stack(zs, 1)
        else:
            z = w
        if valid_id is None:
            valid_id = jnp.ones((sample_num, self.n_class))
        ctx_vec = z.reshape(sample_num, -1)
        if self.aligner is not None:
            mean, logvar = self.aligner(z, valid_id, deterministic=True)
            ctx_vec = jnp.concatenate(
                [ctx_vec, mean.reshape(sample_num, -1), jnp.exp(logvar).reshape(sample_num, -1)],
                axis=-1,
            )
        y = jax.random.normal(r2, (sample_num, num_points, self.input_dim))
        ctx_pp = jnp.broadcast_to(ctx_vec[:, None], (sample_num, num_points, ctx_vec.shape[-1]))
        pts, _ = self.point_flow(y, ctx_pp, reverse=True)
        return z, pts
