"""Editing applications: part mixing, interpolation, single-part resampling,
transformation editing, noise optimization.

Re-implements the reference's editing surface under one module (the reference
scattered these across broken tools/ entry points importing a stale package
name — SURVEY.md §2.7):

* ``combine_latent``           <- anchor_gen.py:457-532 (random permutation mixing)
* ``combine_latent_specific``  <- anchor_gen.py:412-455 (explicit per-part inputs)
* ``interpolate_latent``       <- anchor_gen.py:206-305 (one part's code interpolated)
* ``interpolate_params``       <- anchor_gen.py:338-410 (drift/stretch editing)
* ``sample_one_part``          <- anchor_gen.py:307-337 + part_encoders.py:623-710
* ``optimize_noise``           <- tools/optimize_noise.py:73-113 (Adam on CIMLE z)
* ``shape_edit``               <- tools/shape_edit.py:77-130 (noise -> target params)

All are pure functions over (model, variables); gradient-based editing uses
``jax.value_and_grad`` + optax instead of torch autograd loops.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.anchor_diff import AnchorDiffAE, decode
from ..utils.gaussian import reparameterize_gaussian


def _apply(model, variables, method, *args, rng=None, **kwargs):
    rngs = {"sample": rng} if rng is not None else None
    return model.apply(variables, *args, method=method, rngs=rngs, **kwargs)


# ------------------------------------------------------------------ mixing
def combine_latent(model: AnchorDiffAE, variables, rng, batch, K: Optional[int] = None):
    """Random part mixing: each part slot permuted across the batch
    (anchor_gen.py:457-532). Returns pred dict."""
    rng_code, rng_perm, rng_noise, rng_dec = jax.random.split(rng, 4)
    x = batch["input"]
    seg_flag = batch["attn_map"]
    valid_id = np.asarray(batch["present"]).copy()
    B = x.shape[0]
    K = (model.cimle_sample_num if model.cimle else 1) if K is None else K

    part_code = np.array(
        _apply(model, variables, AnchorDiffAE.encode_part_code, x, seg_flag, True, rng=rng_code)
    )
    perm_rng = np.random.RandomState(int(jax.random.randint(rng_perm, (), 0, 2**31 - 1)))
    for i in range(model.num_anchors):
        perm = perm_rng.permutation(B)
        part_code[:, i] = part_code[perm, i]
        valid_id[:, i] = valid_id[perm, i] * valid_id[:, i]

    part_code = jnp.repeat(jnp.asarray(part_code), K, axis=0)
    valid_j = jnp.repeat(jnp.asarray(valid_id), K, axis=0)
    noise_dim = (model.encoder.get("part_aligner") or {}).get("noise_dim", 32)
    noise = jax.random.normal(rng_noise, (B * K, noise_dim)) if model.cimle else None
    ctx, mean_pp, var_pp, seg_mask, _ = _apply(
        model, variables, AnchorDiffAE.latents_to_decode, part_code, valid_j, noise
    )
    out = decode(
        model, variables, rng_dec, mean_pp, ctx=ctx, variance=var_pp,
        seg_mask=seg_mask, valid_id=valid_j, ret_traj=False,
    )
    pred = np.asarray(out["pred"]).reshape(B, K, model.npoints, 3)
    result = {f"pred_sample_{i}": pred[:, i] for i in range(K)}
    result["pred"] = pred[:, 0]
    result["pred_seg_mask"] = np.asarray(seg_mask).reshape(B, K, -1)[:, 0]
    result["input_ref"] = np.asarray(batch["ref"])
    result["ref_seg_mask"] = np.asarray(batch["ref_seg_mask"])
    result["shift"] = np.asarray(batch["shift"])
    result["scale"] = np.asarray(batch["scale"])
    return result


def combine_latent_specific(
    model: AnchorDiffAE, variables, rng, part_clouds: Sequence[np.ndarray], K: Optional[int] = None
):
    """Mix explicit per-part clouds (one array per part slot; all-zero array =
    absent part) into one shape (anchor_gen.py:412-455)."""
    assert len(part_clouds) == model.num_anchors
    rng_noise, rng_dec = jax.random.split(rng)
    valid = np.array([1.0 if np.any(p != 0) else 0.0 for p in part_clouds], np.float32)[None]
    flags, pts = [], []
    for i, p in enumerate(part_clouds):
        if np.any(p != 0):
            one = np.zeros((p.shape[0], model.num_anchors), np.float32)
            one[:, i] = 1
            flags.append(one)
            pts.append(p)
    x = jnp.asarray(np.concatenate(pts))[None]
    seg_flag = jnp.asarray(np.concatenate(flags))[None]

    part_code = _apply(model, variables, AnchorDiffAE.encode_part_code, x, seg_flag, False)
    K = (model.cimle_sample_num if model.cimle else 1) if K is None else K
    part_code = jnp.repeat(part_code, K, axis=0)
    valid_j = jnp.repeat(jnp.asarray(valid), K, axis=0)
    noise = jax.random.normal(rng_noise, (K, 32)) if model.cimle else None
    # absent slots -> slot 0 is NOT remapped here: reference uses
    # arange*valid (anchor_gen.py:437), reproduced by latents_to_decode when
    # argmax(valid)=0; keep identical behavior.
    ctx, mean_pp, var_pp, seg_mask, _ = _apply(
        model, variables, AnchorDiffAE.latents_to_decode, part_code, valid_j, noise
    )
    out = decode(
        model, variables, rng_dec, mean_pp, ctx=ctx, variance=var_pp,
        seg_mask=seg_mask, valid_id=valid_j, ret_traj=False,
    )
    pred = np.asarray(out["pred"])  # (K, npoints, 3)
    result = {f"pred_sample_{i}": pred[i : i + 1] for i in range(K)}
    result["pred"] = pred[0:1]
    result["pred_seg_mask"] = np.asarray(seg_mask)[0:1]
    result["input"] = np.asarray(x)
    result["seg_mask"] = np.asarray(jnp.argmax(seg_flag, axis=2))
    result["shift"] = np.zeros((1, 1, 3), np.float32)
    result["scale"] = np.ones((1, 1, 1), np.float32)
    return result


# ------------------------------------------------------------ interpolation
def interpolate_latent(
    model: AnchorDiffAE, variables, rng, batch, part_id: Optional[int] = None, mid_num: int = 10
):
    """Interpolate one part's code toward a permuted partner shape over
    ``mid_num`` steps (anchor_gen.py:206-305)."""
    part_id = model.interpolate_part_id if part_id is None else part_id
    rng_code, rng_perm, rng_noise, rng_dec = jax.random.split(rng, 4)
    x = batch["input"]
    seg_flag = batch["attn_map"]
    valid_id = jnp.asarray(batch["present"])
    ref_seg = np.asarray(batch["ref_seg_mask"])
    B = x.shape[0]

    part_code = np.array(
        _apply(model, variables, AnchorDiffAE.encode_part_code, x, seg_flag, True, rng=rng_code)
    )
    perm = np.random.RandomState(
        int(jax.random.randint(rng_perm, (), 0, 2**31 - 1))
    ).permutation(B)
    K = mid_num
    dx = np.linspace(0, 1, K, dtype=np.float32).reshape(1, K, 1)
    src = part_code[:, part_id]
    dst = part_code[perm, part_id]
    interp = src[:, None] + (dst[:, None] - src[:, None]) * dx  # (B, K, zdim)
    codes = np.repeat(part_code[:, None], K, axis=1)  # (B, K, n_class, zdim)
    codes[:, :, part_id] = interp
    codes = jnp.asarray(codes.reshape(B * K, model.num_anchors, -1))

    valid_r = jnp.repeat(valid_id, K, axis=0)
    noise = jax.random.normal(rng_noise, (B, 32)) if model.cimle else None
    noise_r = jnp.repeat(noise, K, axis=0) if noise is not None else None
    seg_mask = jnp.repeat(jnp.asarray(ref_seg.astype(np.int32)), K, axis=0)

    ctx, mean_pp, var_pp, seg_mask, _ = _apply(
        model, variables, AnchorDiffAE.latents_to_decode, codes, valid_r, noise_r, seg_mask
    )
    out = decode(
        model, variables, rng_dec, mean_pp, ctx=ctx, variance=var_pp,
        seg_mask=seg_mask, valid_id=valid_r, ret_traj=False,
    )
    pred = np.asarray(out["pred"]).reshape(B, K, -1, 3)
    result = {f"interpolate sample {i}": pred[:, i] for i in range(K)}
    result["pred"] = pred[:, 0]
    result["pred_seg_mask"] = ref_seg
    result["ref_seg_mask"] = ref_seg
    result["input_ref"] = np.asarray(batch["ref"])
    result["permuted_ref"] = np.asarray(batch["ref"])[perm]
    result["permuted_ref_seg_mask"] = ref_seg[perm]
    result["shift"] = np.asarray(batch["shift"])
    result["scale"] = np.asarray(batch["scale"])
    return result


def interpolate_two_shapes(
    model: AnchorDiffAE, variables, rng, pcds1, mask1, pcds2, mask2,
    part_id: int, mid_num: int = 10,
):
    """Interpolate part ``part_id`` between two EXPLICIT shapes
    (anchor_gen.py:188-204 + part_encoders.py:1009-1050).

    pcds1/pcds2 (B, N, 3); mask1/mask2 (B, N) int part labels.
    Returns pred (B, mid_num, npoints, 3) and seg masks.
    """
    K_cls = model.num_anchors
    rng_c1, rng_c2, rng_noise, rng_dec = jax.random.split(rng, 4)
    one1 = jax.nn.one_hot(jnp.asarray(mask1), K_cls)
    one2 = jax.nn.one_hot(jnp.asarray(mask2), K_cls)
    c1 = np.array(_apply(model, variables, AnchorDiffAE.encode_part_code,
                         jnp.asarray(pcds1), one1, True, rng=rng_c1))
    c2 = np.asarray(_apply(model, variables, AnchorDiffAE.encode_part_code,
                           jnp.asarray(pcds2), one2, True, rng=rng_c2))
    B = c1.shape[0]
    valid = np.zeros((B, K_cls), np.float32)
    for i in range(K_cls):
        valid[:, i] = (np.asarray(mask1) == i).any(1)

    dx = np.linspace(0, 1, mid_num, dtype=np.float32).reshape(1, mid_num, 1)
    interp = c1[:, part_id][:, None] + (c2[:, part_id][:, None] - c1[:, part_id][:, None]) * dx
    codes = np.repeat(c1[:, None], mid_num, axis=1)
    codes[:, :, part_id] = interp
    codes = jnp.asarray(codes.reshape(B * mid_num, K_cls, -1))
    valid_r = jnp.repeat(jnp.asarray(valid), mid_num, axis=0)
    noise = jax.random.normal(rng_noise, (B, 32)) if model.cimle else None
    noise_r = jnp.repeat(noise, mid_num, axis=0) if noise is not None else None
    seg = jnp.repeat(jnp.asarray(np.asarray(mask1).astype(np.int32)), mid_num, axis=0)

    ctx, mean_pp, var_pp, seg, _ = _apply(
        model, variables, AnchorDiffAE.latents_to_decode, codes, valid_r, noise_r, seg
    )
    out = decode(model, variables, rng_dec, mean_pp, ctx=ctx, variance=var_pp,
                 seg_mask=seg, valid_id=valid_r, ret_traj=False)
    N = seg.shape[1]
    return (
        np.asarray(out["pred"]).reshape(B, mid_num, N, 3),
        np.asarray(seg).reshape(B, mid_num, N),
    )


def select_best_noise_whole(model: AnchorDiffAE, variables, rng, batch, num: int = 10):
    """CIMLE eval_whole noise selection: decode every hypothesis through the
    full reverse chain and pick the lowest-Chamfer reconstruction per shape
    (anchor_gen.py:815-836). Returns (noise (B, num, D), best_idx, selected)."""
    from ..models.anchor_diff import reconstruct, select_best_noise
    from ..ops.chamfer import chamfer_l2

    rng_n, rng_dec = jax.random.split(rng)
    noise, _, _ = select_best_noise(model, variables, rng_n, batch, num)
    out = reconstruct(model, variables, rng_dec, batch, noise=noise)
    B = batch["ref"].shape[0]
    pred = out["pred"].reshape(B, num, -1, 3)
    ref = jnp.asarray(batch["ref"])
    shift = jnp.asarray(batch["shift"])
    scale = jnp.asarray(batch["scale"])
    pred_w = pred * scale[:, None] + shift[:, None]
    ref_w = ref * scale + shift
    cds = jax.vmap(lambda p, r: chamfer_l2(p, jnp.broadcast_to(r[None], p.shape)))(
        pred_w, ref_w
    )  # (B, num)
    best = jnp.argmin(cds, axis=1)
    selected = jnp.take_along_axis(noise, best[:, None, None], axis=1)[:, 0]
    return noise, best, selected


def interpolate_params(model: AnchorDiffAE, variables, rng, batch, part_id: int = 1):
    """Transformation editing: stretch part ``part_id`` along x/z by factors
    sqrt(dx), dx in [1, 5] (anchor_gen.py:338-410)."""
    rng_code, rng_noise, rng_dec = jax.random.split(rng, 3)
    x = batch["input"]
    seg_flag = batch["attn_map"]
    valid_id = jnp.asarray(batch["present"])
    ref_seg = np.asarray(batch["ref_seg_mask"]).astype(np.int32)
    B = x.shape[0]
    K = model.cimle_sample_num

    part_code = _apply(
        model, variables, AnchorDiffAE.encode_part_code, x, seg_flag, True, rng=rng_code
    )
    dx = jnp.linspace(1.0, 5.0, K).reshape(1, K, 1)
    dx = jnp.broadcast_to(dx, (B, K, 1)).reshape(B * K, 1)

    codes = jnp.repeat(part_code, K, axis=0)
    valid_r = jnp.repeat(valid_id, K, axis=0)
    noise = jax.random.normal(rng_noise, (B, 32)) if model.cimle else None
    noise_r = jnp.repeat(noise, K, axis=0) if noise is not None else None
    seg_mask = jnp.repeat(jnp.asarray(ref_seg), K, axis=0)

    # aligner params, then the stretch edit on (x, z) of the chosen part
    def _edit(mdl, pc, vid, nz, seg, dxx):
        enc = mdl.encoder_mod
        mean, logvar = enc.get_params_from_part_code(pc, vid, noise=nz)
        mean = mean.at[:, part_id, 0].multiply(jnp.sqrt(dxx[:, 0]))
        mean = mean.at[:, part_id, 2].multiply(jnp.sqrt(dxx[:, 0]))
        logvar = logvar.at[:, part_id, 0].add(jnp.log(dxx[:, 0]))
        logvar = logvar.at[:, part_id, 2].add(jnp.log(dxx[:, 0]))
        lv = logvar + enc.log_scale_var
        mean_pp, logvar_pp, _ = enc.gather_all(seg, anchors=mean, variances=lv)
        ctx = enc.prepare_ctx(pc, mean, logvar, seg_mask=seg)
        return ctx, mean_pp, jnp.exp(logvar_pp)

    ctx, mean_pp, var_pp = model.apply(
        variables, codes, valid_r, noise_r, seg_mask, dx, method=_edit
    )
    out = decode(
        model, variables, rng_dec, mean_pp, ctx=ctx, variance=var_pp,
        seg_mask=seg_mask, valid_id=valid_r, ret_traj=False,
    )
    pred = np.asarray(out["pred"]).reshape(B, K, -1, 3)
    result = {f"interpolate sample {i}": pred[:, i] for i in range(K)}
    result["pred"] = pred[:, 0]
    result["pred_seg_mask"] = ref_seg
    result["ref_seg_mask"] = ref_seg
    result["seg_mask"] = ref_seg
    result["input_ref"] = np.asarray(batch["ref"])
    result["shift"] = np.asarray(batch["shift"])
    result["scale"] = np.asarray(batch["scale"])
    return result


# ------------------------------------------------ diversity subsampling
def _param_scores(mean, logvar, valid, draws):
    """Per-candidate bbox-normalized sample statistics used as the diversity
    score (part_encoders.py:553-561): draw 512 points per part from the
    candidate Gaussians, normalize by the valid-part bbox, score =
    [mean | 2*log(std)] per part (std unbiased, torch parity)."""
    C = mean.shape[0]
    scores = np.empty(mean.shape[:-1] + (6,), np.float64)  # (C, K, 6)
    for c in range(C):
        pts = draws[c] * np.exp(0.5 * logvar[c])[None] + mean[c][None]  # (512, K, 3)
        vpts = pts[:, valid.astype(bool)].reshape(-1, 3)
        shift = (vpts.max(0) + vpts.min(0)) / 2
        scale = (vpts.max(0) - vpts.min(0)).max() / 2
        pts = (pts - shift) / scale
        scores[c] = np.concatenate(
            [pts.mean(0), 2.0 * np.log(pts.std(0, ddof=1))], axis=-1
        )
    return scores


def _greedy_select(param, score, valid, num):
    """Greedy farthest-score selection (part_encoders.py:563-583): start at
    candidate 0, repeatedly add the candidate maximizing the minimum
    valid-weighted MSE score distance to the selected set."""
    C = score.shape[0]
    selected = [0]
    vsum = valid.sum()
    while len(selected) < num:
        best_i, best_d = None, -np.inf
        for i in range(C):
            if i in selected:
                continue
            d = ((score[i][None] - score[selected]) ** 2) * valid[None, :, None]
            d = d.sum(axis=(-1, -2)) / vsum
            dmin = d.min()
            if dmin > best_d:
                best_d, best_i = dmin, i
        selected.append(best_i)
    return selected


def subsample_params(mean, logvar, valid_id, num, rng=None, return_ids=False,
                     _point_draws=None):
    """Selective down-sampling of aligner param candidates
    (part_encoders.py:545-589), host-side numpy.

    mean/logvar: (B, C, K, 3) — C candidate parameter sets per row;
    valid_id: (B, K). Returns (mean_sel, logvar_sel) each (B, num, K, 3)
    (+ the (B, num) selected indices with ``return_ids``).
    """
    mean = np.asarray(mean, np.float64)
    logvar = np.asarray(logvar, np.float64)
    valid_id = np.asarray(valid_id, np.float64)
    B, C, Kc, _ = mean.shape
    if num > C:
        raise ValueError(
            f"subsample_params: requested {num} candidates but only {C} exist"
        )
    rng = rng or np.random.RandomState(0)
    if _point_draws is None:
        _point_draws = rng.standard_normal((B, C, 512, Kc, 3))
    ids = np.empty((B, num), np.int64)
    for b in range(B):
        scores = _param_scores(mean[b], logvar[b], valid_id[b], _point_draws[b])
        ids[b] = _greedy_select(mean[b], scores, valid_id[b], num)
    msel = np.take_along_axis(mean, ids[..., None, None], axis=1).astype(np.float32)
    vsel = np.take_along_axis(logvar, ids[..., None, None], axis=1).astype(np.float32)
    if return_ids:
        return (msel, vsel), ids
    return msel, vsel


def subsample_params_global(mean, logvar, valid_id, num, rng=None,
                            _point_draws=None):
    """Greedy diverse selection ACROSS rows (part_encoders.py:592-621):
    mean/logvar (B, K, 3), valid_id (B, K) -> ((mean_sel, logvar_sel) each
    (num, K, 3), selected row indices)."""
    mean = np.asarray(mean, np.float64)
    logvar = np.asarray(logvar, np.float64)
    valid_id = np.asarray(valid_id, np.float64)
    B, Kc, _ = mean.shape
    rng = rng or np.random.RandomState(0)
    if _point_draws is None:
        _point_draws = rng.standard_normal((B, 512, Kc, 3))
    # each row is scored with ITS OWN valid-part bbox normalization
    score = np.concatenate([
        _param_scores(mean[b : b + 1], logvar[b : b + 1], valid_id[b],
                      _point_draws[b : b + 1])
        for b in range(B)
    ])
    selected = [0]
    alive = np.ones(B, bool)
    alive[0] = False
    while len(selected) < num:
        sel_valid = valid_id[selected]  # (S, K)
        d = ((score[:, None] - score[selected][None]) ** 2)  # (B, S, K, 6)
        w = (valid_id[:, None] * sel_valid[None])[..., None]
        d = (d * w).sum(axis=(-1, -2)) / np.maximum(w[..., 0].sum(-1), 1e-12)
        d = d.min(1)
        d[~alive] = -np.inf
        i = int(np.argmax(d))
        alive[i] = False
        selected.append(i)
    sel = np.asarray(selected, np.int64)
    return (mean[sel].astype(np.float32), logvar[sel].astype(np.float32)), sel


# --------------------------------------------------- single-part resampling
def sample_one_part(
    model: AnchorDiffAE,
    variables,
    rng,
    codes,
    valid_id,
    gt_mean,
    gt_logvar,
    seg_mask,
    part_id: int,
    sample_num_each: int = 10,
    fix_size: bool = True,
    noise_search: int = 100,
    param_sample_num: int = 1,
    selective: bool = False,
):
    """Resample ONE part's latent from the flow prior while keeping the rest
    (anchor_gen.py:307-337, part_encoders.py:623-710).

    ``fix_size=True`` searches ``noise_search`` aligner noises and keeps the
    best fit to the other parts' reference params (part_encoders.py:677-682).
    ``fix_size=False`` keeps ``param_sample_num`` parameter sets per variant:
    the greedy-diverse ``subsample_params`` selection when ``selective``
    (part_encoders.py:684-685), else simply the first candidates (:686-687).

    codes: (S, K_cls, zdim); gt_mean/gt_logvar: (S, K_cls, 3); seg_mask (S, N).
    """
    rng_w, rng_noise, rng_dec = jax.random.split(rng, 3)
    S = codes.shape[0]
    E = sample_num_each
    zdim = codes.shape[-1]
    n_class = model.num_anchors

    # new codes for the chosen part from the flow prior
    w = jax.random.normal(rng_w, (S * E, n_class, zdim))

    def _flow_reverse(mdl, ww):
        return mdl.encoder_mod.flow(ww, reverse=True)

    new_codes = model.apply(variables, w, method=_flow_reverse)[:, part_id]
    codes_rep = jnp.repeat(jnp.asarray(codes), E, axis=0)
    codes_rep = codes_rep.at[:, part_id].set(new_codes)

    # noise search: K candidates per (shape, variant)
    Kn = noise_search
    noise = jax.random.normal(rng_noise, (S * E * Kn, 32))
    codes_search = jnp.repeat(codes_rep, Kn, axis=0)
    valid_rep = jnp.repeat(jnp.asarray(valid_id), E * Kn, axis=0)

    def _params(mdl, pc, vid, nz):
        return mdl.encoder_mod.get_params_from_part_code(pc, vid, noise=nz)

    mean, logvar = model.apply(variables, codes_search, valid_rep, noise, method=_params)
    mean = mean.reshape(S, E, Kn, n_class, 3)
    logvar = logvar.reshape(S, E, Kn, n_class, 3)
    gt = jnp.concatenate(
        [jnp.asarray(gt_mean), jnp.asarray(gt_logvar)], axis=-1
    )[:, None, None]  # (S,1,1,K_cls,6)
    P = 1 if fix_size else max(1, param_sample_num)
    if P > Kn:
        raise ValueError(
            f"sample_one_part: param_sample_num={P} exceeds noise_search={Kn} candidates"
        )
    if fix_size:
        fit = ((jnp.concatenate([mean, logvar], axis=-1) - gt) ** 2).sum(-1)
        fit = fit * jnp.asarray(valid_id)[:, None, None, :]
        fit = fit.at[..., part_id].set(0.0)
        idx = jnp.argmin(fit.sum(-1), axis=2)[..., None]  # (S, E, 1)
    elif selective:
        (_, _), ids = subsample_params(
            np.asarray(mean).reshape(S * E, Kn, n_class, 3),
            np.asarray(logvar).reshape(S * E, Kn, n_class, 3),
            np.repeat(np.asarray(valid_id), E, axis=0),
            P,
            return_ids=True,
        )
        idx = jnp.asarray(ids.reshape(S, E, P))
    else:
        idx = jnp.broadcast_to(jnp.arange(P)[None, None], (S, E, P))

    take = lambda a: jnp.take_along_axis(a, idx[..., None, None], axis=2)
    mean_b = take(mean).reshape(S * E * P, n_class, 3)
    logvar_b = take(logvar).reshape(S * E * P, n_class, 3)
    codes_rep = jnp.repeat(codes_rep, P, axis=0)

    seg = jnp.repeat(jnp.asarray(seg_mask).astype(jnp.int32), E * P, axis=0)
    valid_e = jnp.repeat(jnp.asarray(valid_id), E * P, axis=0)

    def _prep(mdl, pc, m, lvr, sm):
        enc = mdl.encoder_mod
        mean_pp, logvar_pp, _ = enc.gather_all(sm, anchors=m, variances=lvr)
        ctx = enc.prepare_ctx(pc, m, lvr, seg_mask=sm)
        return ctx, mean_pp, jnp.exp(logvar_pp)

    ctx, mean_pp, var_pp = model.apply(variables, codes_rep, mean_b, logvar_b, seg, method=_prep)
    out = decode(
        model, variables, rng_dec, mean_pp, ctx=ctx, variance=var_pp,
        seg_mask=seg, valid_id=valid_e, ret_traj=False,
    )
    N = seg.shape[1]
    EP = E * P
    return {
        "pred": np.asarray(out["pred"]).reshape(S, EP, N, 3),
        "seg_mask": np.asarray(seg).reshape(S, EP, N),
        "valid_id": np.asarray(valid_e).reshape(S, EP, n_class),
        "codes": np.asarray(codes_rep).reshape(S, EP, n_class, zdim),
        "means": np.asarray(mean_b).reshape(S, EP, n_class, 3),
        "logvars": np.asarray(logvar_b).reshape(S, EP, n_class, 3),
    }


# ------------------------------------------------------ gradient-based edits
def optimize_noise(
    model: AnchorDiffAE, variables, rng, batch, steps: int = 100, lr: float = 1.0
):
    """Optimize the CIMLE noise z to minimize the encoder fit loss + reg
    (tools/optimize_noise.py:73-113) with Adam."""
    B = batch["ref"].shape[0]
    z0 = jax.random.normal(rng, (B, 32))
    tx = optax.adam(lr)
    opt_state = tx.init(z0)

    def loss_fn(z):
        losses = model.apply(
            variables, batch, z, method=AnchorDiffAE.recon_losses,
            rngs={"sample": jax.random.PRNGKey(0)},
        )
        return sum(v.mean() for k, v in losses.items() if "loss" in k)

    @jax.jit
    def step(z, opt_state):
        val, g = jax.value_and_grad(loss_fn)(z)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(z, updates), opt_state, val

    z = z0
    history = []
    for _ in range(steps):
        z, opt_state, val = step(z, opt_state)
        history.append(float(val))
    return z, history


def shape_edit(
    model: AnchorDiffAE,
    variables,
    rng,
    batch,
    edit_part_id: int,
    edit_part_mean=None,
    edit_part_var=None,
    fix_ids=None,
    steps: int = 100,
    lr: float = 0.1,
    fit_weight: float = 1.0,
):
    """Optimize aligner noise so the edited part hits target mean/var while
    the other parts stay put (tools/shape_edit.py:77-130); then decode."""
    x = batch["input"]
    seg_flag = batch["attn_map"]
    valid_id = jnp.asarray(batch["present"])
    B = x.shape[0]
    if fix_ids is None:
        fix_ids = jnp.ones_like(valid_id).at[:, edit_part_id].set(0.0)
    ref_means = jnp.asarray(batch["part_shift"])
    ref_vars = jnp.asarray(batch["part_scale"]) ** 2

    rng_z, rng_dec = jax.random.split(rng)
    z0 = jax.random.normal(rng_z, (B, 32))
    tx = optax.adam(lr)
    opt_state = tx.init(z0)

    def loss_fn(z):
        losses = model.apply(
            variables, z, x, seg_flag, valid_id, ref_means, ref_vars, fix_ids,
            edit_part_id, edit_part_mean, edit_part_var, fit_weight,
            method=AnchorDiffAE.edit_losses,
        )
        return sum(v.mean() for k, v in losses.items() if "loss" in k)

    @jax.jit
    def step(z, opt_state):
        val, g = jax.value_and_grad(loss_fn)(z)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(z, updates), opt_state, val

    z = z0
    for _ in range(steps):
        z, opt_state, val = step(z, opt_state)

    # decode with the optimized noise
    codes = _apply(model, variables, AnchorDiffAE.encode_part_code, x, seg_flag, False)
    seg_mask = jnp.asarray(np.asarray(batch["ref_seg_mask"]).astype(np.int32))
    ctx, mean_pp, var_pp, seg_mask, params = _apply(
        model, variables, AnchorDiffAE.latents_to_decode, codes, valid_id, z, seg_mask
    )
    out = decode(
        model, variables, rng_dec, mean_pp, ctx=ctx, variance=var_pp,
        seg_mask=seg_mask, valid_id=valid_id, ret_traj=False,
    )
    return {"pred": np.asarray(out["pred"]), "z": np.asarray(z), "loss": float(val)}


# -------------------------------------------------------------- CLI drivers
def run_interpolation(runner, args):
    rng = jax.random.PRNGKey(args.seed)
    from .runner import device_batch

    outs = []
    for batch in runner.val_loader:
        rng, sub = jax.random.split(rng)
        outs.append(
            interpolate_latent(
                runner.model, runner.state.variables(), sub, device_batch(batch),
                part_id=args.part_id,
            )
        )
        break
    import os

    out_dir = args.interpolation_dir or os.path.join(runner.work_dir, "interpolation")
    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, "interpolation.npz"), **outs[0])
    runner.logger.print_log(f"interpolation written to {out_dir}")


def run_mixing(runner, args):
    rng = jax.random.PRNGKey(args.seed)
    from .runner import device_batch
    import os

    for batch in runner.val_loader:
        out = combine_latent(runner.model, runner.state.variables(), rng, device_batch(batch))
        break
    out_dir = os.path.join(runner.work_dir, "mixing")
    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, "mixing.npz"), **out)
    runner.logger.print_log(f"mixing written to {out_dir}")
