"""Alternative diffusion processes: vanilla point DPM and latent diffusion.

* ``PointDiffusion`` re-implements the reference's vanilla DDPM over point
  clouds (reference: python/difffacto/models/diffusions/point_diffusion.py:17-516).
  Mathematically it is the anchored process with anchors pinned to zero and
  unit per-point variance, so it delegates to ``AnchoredDiffusion`` — one
  verified implementation of the schedule/posterior math instead of two.
* ``LDM`` re-implements latent diffusion over part codes (reference:
  models/diffusions/latent_diffusion.py:12-550) — the same vanilla process
  on (B, K, zdim) latents with the LDMNet denoiser.
* ``LatentDiffusionDrift`` (latent_diffusion_drift.py:13) is LDM with the
  drifted-epsilon mean parameterization.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from ..utils.registry import DIFFUSIONS
from .diffusion import AnchoredDiffusion


def _vanilla(num_timesteps, beta_1, beta_T, mode, use_beta, rescale_timesteps,
             loss_type, model_mean_type, model_var_type, scale_loss, net):
    return AnchoredDiffusion(
        num_timesteps=num_timesteps,
        beta_1=beta_1,
        beta_T=beta_T,
        k=1.0,
        res=False,
        mode=mode,
        use_beta=use_beta,
        rescale_timesteps=rescale_timesteps,
        loss_type=loss_type,
        model_mean_type=model_mean_type,
        model_var_type=model_var_type,
        scale_loss=scale_loss,
        include_anchors=False,
        learn_anchor=False,   # anchors forced to zero -> vanilla DDPM
        learn_variance=False,
        net=net,
    )


@DIFFUSIONS.register_module()
def PointDiffusion(
    net=None,
    num_timesteps: int = 100,
    beta_1: float = 1e-4,
    beta_T: float = 0.02,
    mode: str = "linear",
    use_beta: bool = True,
    rescale_timesteps: bool = False,
    loss_type: str = "mse",
    model_mean_type: str = "epsilon",
    model_var_type: str = "fixed_small",
    scaled_loss: bool = False,
    include_global_latent: bool = False,
    include_anchor_latent: bool = True,
    include_anchors: bool = False,
) -> AnchoredDiffusion:
    """Vanilla point DPM (point_diffusion.py:17-120)."""
    return _vanilla(
        num_timesteps, beta_1, beta_T, mode, use_beta, rescale_timesteps,
        loss_type, model_mean_type, model_var_type, scaled_loss, net,
    )


@DIFFUSIONS.register_module()
def LDM(
    net=None,
    num_timesteps: int = 100,
    beta_1: float = 1e-4,
    beta_T: float = 0.02,
    mode: str = "linear",
    use_beta: bool = True,
    rescale_timesteps: bool = False,
    loss_type: str = "mse",
    model_mean_type: str = "epsilon",
    model_var_type: str = "fixed_small",
    **_,
) -> AnchoredDiffusion:
    """Latent diffusion over part codes (latent_diffusion.py:12)."""
    return _vanilla(
        num_timesteps, beta_1, beta_T, mode, use_beta, rescale_timesteps,
        loss_type, model_mean_type, model_var_type, False, net,
    )


@DIFFUSIONS.register_module()
def LatentDiffusionDrift(
    net=None,
    num_timesteps: int = 100,
    beta_1: float = 1e-4,
    beta_T: float = 0.02,
    mode: str = "linear",
    use_beta: bool = False,  # the drift class's own default (drift:22)
    rescale_timesteps: bool = False,
    loss_type: str = "mse",
    model_mean_type: str = "epsilon",
    model_var_type: str = "fixed_small",
    classifier_weight: float = 1.0,
    **_,
) -> AnchoredDiffusion:
    """'Drift' latent diffusion (latent_diffusion_drift.py:13-466). Despite
    the name, the SHIPPED math is a VANILLA chain: training q_samples with a
    ZERO prior (latent_diffusion_drift.py:480) and p_mean_variance zeroes
    the prior before every mean-type branch (:219), so prior/code only
    CONDITION the net — with classifier-free guidance mixed at
    classifier_weight (:196-198). Configured accordingly; the anchored
    q_sample form its q_sample would compute with a nonzero prior is
    exactly AnchoredDiffusion's (k=1), available via the flagship class."""
    return AnchoredDiffusion(
        num_timesteps=num_timesteps,
        beta_1=beta_1,
        beta_T=beta_T,
        k=1.0,
        res=False,
        mode=mode,
        use_beta=use_beta,
        rescale_timesteps=rescale_timesteps,
        loss_type=loss_type,
        model_mean_type=model_mean_type,
        model_var_type=model_var_type,
        include_anchors=False,
        learn_anchor=False,
        learn_variance=False,
        guidance=classifier_weight != 1.0,
        classifier_weight=classifier_weight,
        net=net,
    )
