"""Point-cloud completion models: PCN, CoarsePCN, DiffuCompletion.

Re-implements the reference completion family (reference:
python/difffacto/models/networks/PCN.py:6-80, coarsePCN.py,
completion.py:7-100): a PCN folding decoder over a global code, its
coarse-only variant, and a diffusion-based completer conditioned on the
partial cloud's code.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.layers import TorchBatchNorm
from ..ops.chamfer import chamfer_l1, chamfer_l2
from ..utils.registry import DIFFUSIONS, ENCODERS, MODELS, NETS, SAMPLERS, build_from_cfg
from .anchor_diff import build_diffusion
from .supseg_encoders import _TwoStage


class PCNEncoder(nn.Module):
    """Two-stage global encoder shared by the completion family
    (networks/PCN.py:15-26 first/second_conv incl. BatchNorms, global-first
    concat; golden parity: tests/test_reference_parity_supseg.py)."""

    encoder_channel: int = 1024
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        return _TwoStage(self.encoder_channel, global_first=True, dtype=self.dtype)(
            xyz, None, train=train
        )


@MODELS.register_module()
class PCN(nn.Module):
    """Coarse MLP + folding refinement decoder (PCN.py:6-80)."""

    num_pred: int = 2048
    encoder_channel: int = 1024
    grid_size: int = 4  # folding grid: num_pred = num_coarse * grid^2
    loss: str = "cd_l1"
    dtype: Optional[jnp.dtype] = None

    @property
    def num_coarse(self):
        return self.num_pred // (self.grid_size**2)

    @nn.compact
    def __call__(self, partial, train: bool = False):
        """partial (B, Np, 3) -> (coarse (B, num_coarse, 3), fine (B, num_pred, 3))."""
        B = partial.shape[0]
        feat = PCNEncoder(self.encoder_channel, dtype=self.dtype)(partial, train=train)
        h = nn.Dense(1024, dtype=self.dtype)(feat)
        h = nn.relu(h)
        h = nn.Dense(1024, dtype=self.dtype)(h)
        h = nn.relu(h)
        coarse = nn.Dense(3 * self.num_coarse, dtype=self.dtype)(h).reshape(
            B, self.num_coarse, 3
        )

        # folding seed channel order matches the reference: channel 0 varies
        # FAST across the g*g grid, channel 1 slow (networks/PCN.py:43-45)
        g = self.grid_size
        lin = jnp.linspace(-0.05, 0.05, g)
        mesh = jnp.meshgrid(lin, lin, indexing="ij")
        grid = jnp.stack([mesh[1], mesh[0]], -1).reshape(1, 1, g * g, 2)
        grid = jnp.broadcast_to(grid, (B, self.num_coarse, g * g, 2)).reshape(
            B, self.num_pred, 2
        )
        center = jnp.repeat(coarse, g * g, axis=1)  # (B, num_pred, 3)
        feat_pp = jnp.broadcast_to(feat[:, None], (B, self.num_pred, feat.shape[-1]))
        # concat order [feat, seed, point_feat] (networks/PCN.py:71)
        h = jnp.concatenate([feat_pp, grid, center], axis=-1)
        h = nn.Dense(512, dtype=self.dtype)(h)
        h = TorchBatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Dense(512, dtype=self.dtype)(h)
        h = TorchBatchNorm(dtype=self.dtype)(h, use_running_average=not train)
        h = nn.relu(h)
        fine = nn.Dense(3, dtype=self.dtype)(h) + center
        return coarse, fine

    def get_loss(self, coarse, fine, gt):
        cd = chamfer_l1 if self.loss == "cd_l1" else chamfer_l2
        return {"coarse_loss": cd(coarse, gt).mean(), "fine_loss": cd(fine, gt).mean()}

    def loss(self, batch, epoch=0) -> Dict[str, jnp.ndarray]:
        gt = batch["ref"]
        partial = batch["input"]
        coarse, fine = self(partial, train=True)
        return self.get_loss(coarse, fine, gt)


@MODELS.register_module()
class CoarsePCN(nn.Module):
    """Coarse-only PCN (coarsePCN.py:5-49): encodes the FULL cloud and
    regresses ``num_anchors`` coarse points against that same cloud — the
    reference reads BOTH gt and the encoder input from ``pcds['pointcloud']``
    (coarsePCN.py:33-34), making this an anchor-pretraining task, not a
    partial-cloud completer."""

    num_anchors: int = 448
    encoder_channel: int = 1024
    loss: str = "cd_l2"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        B = xyz.shape[0]
        feat = PCNEncoder(self.encoder_channel, dtype=self.dtype)(xyz, train=train)
        h = nn.Dense(1024, dtype=self.dtype)(feat)
        h = nn.relu(h)
        h = nn.Dense(1024, dtype=self.dtype)(h)
        h = nn.relu(h)
        return nn.Dense(3 * self.num_anchors, dtype=self.dtype)(h).reshape(
            B, self.num_anchors, 3
        )

    def loss(self, batch, epoch=0) -> Dict[str, jnp.ndarray]:
        gt = batch["ref"]
        coarse = self(gt, train=True)  # full cloud in AND out (see class doc)
        cd = chamfer_l1 if self.loss == "cd_l1" else chamfer_l2
        return {"coarse_loss": cd(coarse, gt).mean()}


@MODELS.register_module()
class DiffuCompletion(nn.Module):
    """Diffusion completion (completion.py:7-100): a vanilla point DPM
    conditioned on the partial cloud's global code."""

    diffusion: dict
    sampler: dict
    num_timesteps: int
    encoder_channel: int = 512
    npoints: int = 2048
    ret_traj: bool = False
    ret_interval: int = 20
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.partial_encoder = PCNEncoder(self.encoder_channel, dtype=self.dtype)
        self.net = build_from_cfg(dict(self.diffusion["net"]), NETS, dtype=self.dtype)
        self.diff = build_diffusion(self.diffusion, self.num_timesteps)
        self.t_sampler = build_from_cfg(
            dict(self.sampler), SAMPLERS, num_timesteps=self.num_timesteps
        )

    def denoise(self, x, t, ctx, anchors, variances, seg_mask, valid_id, train: bool = False):
        return self.net(x, t, ctx, anchors, variances, seg_mask, valid_id,
                        deterministic=not train)

    def encode(self, partial, train: bool = False):
        return self.partial_encoder(partial, train=train)[:, None]  # (B, 1, C)

    def decode(self, code, rng, noise=None):
        """Reverse chain conditioned on the partial-cloud code (reference
        completion.py:26-42 ``decode`` via p_sample_loop_progressive):
        returns dict with 'pred' (B, npoints, 3) and, when ``ret_traj``,
        every ``ret_interval``-th intermediate under 'traj'."""
        B = code.shape[0]
        zeros = jnp.zeros((B, self.npoints, 3), jnp.float32)

        def model_fn(inp, ts, c, anc, var, seg, vid):
            return self.denoise(inp, ts, c, anc, var, seg, vid, train=False)

        return self.diff.p_sample_loop(
            model_fn,
            rng,
            zeros,
            ctx=code,
            seg_mask=jnp.zeros((B, self.npoints), jnp.int32),
            noise=noise,
            ret_traj=self.ret_traj,
            ret_interval=self.ret_interval,
        )

    def reconstruct(self, batch):
        """Eval forward (reference completion.py:45-57 else-branch): encode
        the partial cloud, decode, and return pred/ref/input."""
        out = self.decode(self.encode(batch["input"]), self.make_rng("sample"))
        out["ref"] = batch["ref"]
        out["input"] = batch["input"]
        return out

    def loss(self, batch, epoch=0) -> Dict[str, jnp.ndarray]:
        gt = batch["ref"]
        partial = batch["input"]
        B = gt.shape[0]
        code = self.encode(partial, train=True)
        t, _ = self.t_sampler.sample(self.make_rng("sample"), B)

        def model_fn(inp, ts, c, anc, var, seg, vid):
            return self.denoise(inp, ts, c, anc, var, seg, vid, train=True)

        return self.diff.training_losses(
            model_fn, self.make_rng("sample"), gt, t,
            anchors=jnp.zeros_like(gt), ctx=code,
            seg_mask=jnp.zeros(gt.shape[:2], jnp.int32),
        )
