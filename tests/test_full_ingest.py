"""Full-model checkpoint ingestion rehearsal.

Builds a COMPLETE reference-shaped ``gen_chair`` state dict in live torch —
PointNetV2 with grouped per-part heads and non-trivial BN running stats, the
5-block part aligner (incl. the pre_norm-skip quirk, part_encoders.py:120-137),
4 x 14-layer coupling flows, and the 5-block TransformerNet denoiser with its
GEGLU time embed (attention.py:309-440) — saves it as a ``.pth``, converts it
through the REAL ``tools/convert_torch_ckpt.py`` CLI, loads the msgpack into
the full AnchorDiffAE, and checks every stage numerically against the torch
modules. This is the dress rehearsal for ingesting the reference's
``pretrained/{chair,...}.pth`` (reference configs/gen_chair.py:157).
"""

import os
import runpy
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from test_torch_ingest import (
    K,
    TorchBlock,
    TorchCoupling,
    TorchFF,
    TorchPointNetV2,
    to_np_sd,
)

ZDIM = 256
NOISE_DIM = 32
N_PTS = 64


def t_embed_np(t, dim=256):
    """Reference timestep_embedding (utils/misc.py:83-100), [cos|sin]."""
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half, dtype=np.float32) / half)
    args = np.asarray(t, np.float32)[:, None] * freqs[None]
    return np.concatenate([np.cos(args), np.sin(args)], -1).astype(np.float32)


class TorchAlignerGenChair(tnn.Module):
    """part_encoders.py:20-143 at gen_chair config: in 256, inner 8*32=256,
    depth 5, class_cond+add_class_cond (class_emb added post-proj), cimle
    cond_noise_type=0 (noise concat; pre_norm constructed but SKIPPED)."""

    def __init__(self, zdim=ZDIM, heads=8, dh=32, depth=5, noise_scale=100.0):
        super().__init__()
        inner = heads * dh
        self.noise_scale = noise_scale
        self.proj_in = tnn.Linear(zdim + NOISE_DIM, inner)
        self.class_emb = tnn.Embedding(K, inner)
        self.pre_norm = tnn.LayerNorm(inner)  # present in ckpt, unused
        self.post_norm = tnn.LayerNorm(inner)
        self.transformer_blocks = tnn.ModuleList(
            [TorchBlock(inner, heads, dh, None) for _ in range(depth)]
        )
        self.proj_out = tnn.Linear(inner, 6)

    def forward(self, part_code, mask, noise):  # channel-last (B, K, zdim)
        B = part_code.shape[0]
        n = (noise * self.noise_scale).unsqueeze(1).expand(-1, K, -1)
        h = self.proj_in(torch.cat([part_code, n], -1))
        h = h + self.class_emb.weight.unsqueeze(0)
        # NO pre_norm: reference skips it for cimle w/ cond_noise_type=0.
        for blk in self.transformer_blocks:
            h = blk(h, None, mask)
        h = self.post_norm(h)
        h = self.proj_out(h)
        return h[..., :3], h[..., 3:6]


class TorchDenoiserGenChair(tnn.Module):
    """attention.py:309-440 at gen_chair config: in 3+6+4=13, inner 8*16=128,
    depth 5, raw ctx 262 (+4 class eye, +256 t-embed), use_linear, no res."""

    def __init__(self, heads=8, dh=16, depth=5, raw_ctx=ZDIM + 6):
        super().__init__()
        inner = heads * dh
        ctx_dim = raw_ctx + K + 256
        self.proj_in = tnn.Linear(3 + 6 + K, inner)
        self.pre_norm = tnn.LayerNorm(inner)
        self.post_norm = tnn.LayerNorm(inner)
        self.time_embed = TorchFF(256)
        self.transformer_blocks = tnn.ModuleList(
            [TorchBlock(inner, heads, dh, ctx_dim) for _ in range(depth)]
        )
        self.proj_out = tnn.Linear(inner, 3)

    def forward(self, x, t, ctx, anchors, variances, seg_mask, valid_id):
        # all channel-last: x/anchors/variances (B,N,3), ctx (B,K,262)
        B, N, _ = x.shape
        eye = torch.eye(K).to(x).unsqueeze(0).expand(B, -1, -1)
        ctx = torch.cat([ctx, eye], -1)
        temb = self.time_embed(torch.from_numpy(t_embed_np(t.numpy())))
        ctx = torch.cat([ctx, temb.unsqueeze(1).expand(-1, K, -1)], -1)
        onehot = torch.nn.functional.one_hot(seg_mask.long(), K).to(x)
        h = self.proj_in(torch.cat([x, anchors, variances, onehot], -1))
        h = self.pre_norm(h)
        for blk in self.transformer_blocks:
            h = blk(h, ctx, valid_id)
        h = self.post_norm(h)
        return self.proj_out(h)  # in(13) != out(3): no residual


class TorchChainFlow(tnn.Module):
    def __init__(self, dim=ZDIM, hidden=ZDIM, depth=14):
        super().__init__()
        self.chain = tnn.ModuleList(
            [TorchCoupling(dim, hidden, swap=(i % 2 == 0)) for i in range(depth)]
        )

    def forward(self, x, reverse=False):
        inds = range(len(self.chain) - 1, -1, -1) if reverse else range(len(self.chain))
        for i in inds:
            x = self.chain[i](x, reverse=reverse)
        return x


@pytest.fixture(scope="module")
def rehearsal(tmp_path_factory):
    """Build torch modules, save the composite .pth, convert via the real
    CLI tool, and load the msgpack into a template TrainState."""
    tmp = tmp_path_factory.mktemp("ingest")
    torch.manual_seed(0)
    t_enc = TorchPointNetV2(zdim=ZDIM, num_anchors=K).eval()
    with torch.no_grad():
        for m in t_enc.modules():
            if isinstance(m, tnn.BatchNorm1d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.9, 1.1)
    t_align = TorchAlignerGenChair().eval()
    t_flows = tnn.ModuleList([TorchChainFlow() for _ in range(K)]).eval()
    with torch.no_grad():
        # keep the 14-layer inverse numerically tame for the parity check
        for coup in t_flows.modules():
            if isinstance(coup, TorchCoupling):
                coup.net_s_t[4].weight.mul_(0.01)
                coup.net_s_t[4].bias.zero_()
    t_den = TorchDenoiserGenChair().eval()

    sd = {}
    sd.update(to_np_sd(t_enc, "encoder.encoder."))
    sd.update(to_np_sd(t_align, "encoder.part_aligner."))
    sd.update(to_np_sd(t_flows, "encoder.flow."))
    sd.update(to_np_sd(t_den, "diffusion.model."))
    pth = tmp / "gen_chair_rehearsal.pth"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}}, pth)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_file = os.path.join(repo, "tests/configs/ingest_gen_chair.py")
    out = tmp / "ckpt_0.msgpack"
    argv_save = sys.argv
    try:
        sys.argv = [
            "convert_torch_ckpt.py", "--config-file", cfg_file,
            "--input", str(pth), "--output", str(out),
        ]
        runpy.run_path(os.path.join(repo, "tools/convert_torch_ckpt.py"),
                       run_name="__main__")
    finally:
        sys.argv = argv_save
    assert out.exists()

    # Rebuild the template state exactly as the tool does and deserialize.
    from flax import serialization

    from difffacto_tpu.config import get_cfg, init_cfg
    from difffacto_tpu.models import AnchorDiffAE
    from difffacto_tpu.parallel.optim import build_optimizer_from_cfg
    from difffacto_tpu.parallel.train import TrainState
    from difffacto_tpu.utils.registry import MODELS, build_from_cfg

    init_cfg(cfg_file)
    cfg = get_cfg()
    model = build_from_cfg(cfg.model.dump(), MODELS)
    B, N = 2, N_PTS
    seg = np.repeat(np.arange(K), N // K)[None].repeat(B, 0)
    batch = {
        "input": jnp.zeros((B, N, 3), jnp.float32),
        "ref": jnp.zeros((B, N, 3), jnp.float32),
        "ref_seg_mask": jnp.asarray(seg, jnp.int32),
        "seg_mask": jnp.asarray(seg, jnp.int32),
        "ref_attn_map": jnp.asarray(np.eye(K, dtype=np.float32)[seg]),
        "attn_map": jnp.asarray(np.eye(K, dtype=np.float32)[seg]),
        "present": jnp.ones((B, K), jnp.float32),
        "dp_present": jnp.ones((B, K), jnp.float32),
        "part_shift": jnp.zeros((B, K, 3), jnp.float32),
        "part_scale": jnp.ones((B, K, 3), jnp.float32),
        "noise": jnp.zeros((B, 1), jnp.float32),
    }
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda r, b: model.init(r, b, 0, method=AnchorDiffAE.loss))(
        rngs, batch
    )
    tx = build_optimizer_from_cfg(dict(type="Adam", lr=1e-3))
    state = TrainState.create(jax.device_get(variables), tx)
    with open(out, "rb") as f:
        state = serialization.from_bytes(state, f.read())
    return {
        "model": model, "state": state, "batch": batch,
        "t_enc": t_enc, "t_align": t_align, "t_flows": t_flows, "t_den": t_den,
    }


def _vars(state):
    return {"params": state.params, "batch_stats": state.batch_stats}


def test_full_sd_converts_cleanly(rehearsal):
    """Every torch key consumed; conversion changed the template params."""
    state = rehearsal["state"]
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_encoder_parity_full_scale(rehearsal):
    m, state, t_enc = rehearsal["model"], rehearsal["state"], rehearsal["t_enc"]
    rng = np.random.RandomState(0)
    pts = rng.randn(2, N_PTS, 3).astype(np.float32)
    seg = rng.randint(0, K, (2, N_PTS))
    onehot = np.eye(K, dtype=np.float32)[seg]
    with torch.no_grad():
        tm, tv = t_enc(torch.from_numpy(pts), torch.from_numpy(onehot))
    jm, jv = m.apply(
        _vars(state), jnp.asarray(pts), jnp.asarray(onehot),
        method=lambda mod, p, a: mod.encoder_mod.encoder_net(p, a),
    )
    np.testing.assert_allclose(np.asarray(jm), tm.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), atol=5e-4)


def test_aligner_parity_incl_pre_norm_skip(rehearsal):
    """The aligner must reproduce the reference INCLUDING the skipped
    pre_norm; if the jax side applied pre_norm this comparison fails."""
    m, state, t_align = rehearsal["model"], rehearsal["state"], rehearsal["t_align"]
    rng = np.random.RandomState(1)
    part_code = rng.randn(2, K, ZDIM).astype(np.float32)
    noise = (rng.randn(2, NOISE_DIM) * 0.01).astype(np.float32)
    valid = np.ones((2, K), np.float32)
    valid[1, 3] = 0.0
    with torch.no_grad():
        tm, tv = t_align(
            torch.from_numpy(part_code), torch.from_numpy(valid),
            torch.from_numpy(noise),
        )
    jm, jv = m.apply(
        _vars(state), jnp.asarray(part_code), jnp.asarray(valid), jnp.asarray(noise),
        method=lambda mod, p, v, n: mod.encoder_mod.aligner(p, v, noise=n),
    )
    np.testing.assert_allclose(np.asarray(jm), tm.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), atol=1e-3)


def test_flow_parity_full_scale(rehearsal):
    m, state, t_flows = rehearsal["model"], rehearsal["state"], rehearsal["t_flows"]
    x = np.random.RandomState(2).randn(2, K, ZDIM).astype(np.float32)
    with torch.no_grad():
        t_fwd = torch.stack(
            [t_flows[i](torch.from_numpy(x[:, i])) for i in range(K)], 1
        )
        t_rev = torch.stack(
            [t_flows[i](torch.from_numpy(x[:, i]), reverse=True) for i in range(K)], 1
        )
    j_fwd = m.apply(_vars(state), jnp.asarray(x),
                    method=lambda mod, a: mod.encoder_mod.flow(a))
    j_rev = m.apply(_vars(state), jnp.asarray(x),
                    method=lambda mod, a: mod.encoder_mod.flow(a, reverse=True))
    np.testing.assert_allclose(np.asarray(j_fwd), t_fwd.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(j_rev), t_rev.numpy(), atol=5e-4)


def test_denoiser_parity_full_scale(rehearsal):
    m, state, t_den = rehearsal["model"], rehearsal["state"], rehearsal["t_den"]
    rng = np.random.RandomState(3)
    B, N = 2, N_PTS
    x = rng.randn(B, N, 3).astype(np.float32)
    t = np.array([7.0, 42.0], np.float32)
    ctx = rng.randn(B, K, ZDIM + 6).astype(np.float32)
    anchors = rng.randn(B, N, 3).astype(np.float32) * 0.1
    variances = (np.abs(rng.randn(B, N, 3)) * 0.2 + 0.5).astype(np.float32)
    seg = np.repeat(np.arange(K), N // K)[None].repeat(B, 0)
    valid = np.ones((B, K), np.float32)
    with torch.no_grad():
        t_out = t_den(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ctx),
            torch.from_numpy(anchors), torch.from_numpy(variances),
            torch.from_numpy(seg), torch.from_numpy(valid),
        )
    j_out = m.apply(
        _vars(state), jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(anchors), jnp.asarray(variances),
        jnp.asarray(seg, jnp.int32), jnp.asarray(valid),
        method=lambda mod, *a: mod.net(*a),
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=1e-3)


@pytest.fixture(scope="module")
def rehearsal_car(tmp_path_factory):
    """Second-category rehearsal (reference configs/gen_car.py): parameter
    shapes match chair, so this exercises the two car DELTAS — the converter
    CLI driven by a gen_car-derived config, and aligner noise_scale=50
    (vs 100) flowing from config into the loaded model."""
    tmp = tmp_path_factory.mktemp("ingest_car")
    torch.manual_seed(10)
    t_enc = TorchPointNetV2(zdim=ZDIM, num_anchors=K).eval()
    t_align = TorchAlignerGenChair(noise_scale=50.0).eval()
    t_flows = tnn.ModuleList([TorchChainFlow() for _ in range(K)]).eval()
    with torch.no_grad():
        for coup in t_flows.modules():
            if isinstance(coup, TorchCoupling):
                coup.net_s_t[4].weight.mul_(0.01)
                coup.net_s_t[4].bias.zero_()
    t_den = TorchDenoiserGenChair().eval()

    sd = {}
    sd.update(to_np_sd(t_enc, "encoder.encoder."))
    sd.update(to_np_sd(t_align, "encoder.part_aligner."))
    sd.update(to_np_sd(t_flows, "encoder.flow."))
    sd.update(to_np_sd(t_den, "diffusion.model."))
    pth = tmp / "gen_car_rehearsal.pth"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}}, pth)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_file = os.path.join(repo, "tests/configs/ingest_gen_car.py")
    out = tmp / "ckpt_0.msgpack"
    argv_save = sys.argv
    try:
        sys.argv = [
            "convert_torch_ckpt.py", "--config-file", cfg_file,
            "--input", str(pth), "--output", str(out),
        ]
        runpy.run_path(os.path.join(repo, "tools/convert_torch_ckpt.py"),
                       run_name="__main__")
    finally:
        sys.argv = argv_save
    assert out.exists()

    from flax import serialization

    from difffacto_tpu.config import get_cfg, init_cfg
    from difffacto_tpu.models import AnchorDiffAE
    from difffacto_tpu.parallel.optim import build_optimizer_from_cfg
    from difffacto_tpu.parallel.train import TrainState
    from difffacto_tpu.utils.registry import MODELS, build_from_cfg

    init_cfg(cfg_file)
    cfg = get_cfg()
    assert cfg.model.encoder.part_aligner.noise_scale == 50
    model = build_from_cfg(cfg.model.dump(), MODELS)
    B, N = 2, N_PTS
    seg = np.repeat(np.arange(K), N // K)[None].repeat(B, 0)
    batch = {
        "input": jnp.zeros((B, N, 3), jnp.float32),
        "ref": jnp.zeros((B, N, 3), jnp.float32),
        "ref_seg_mask": jnp.asarray(seg, jnp.int32),
        "seg_mask": jnp.asarray(seg, jnp.int32),
        "ref_attn_map": jnp.asarray(np.eye(K, dtype=np.float32)[seg]),
        "attn_map": jnp.asarray(np.eye(K, dtype=np.float32)[seg]),
        "present": jnp.ones((B, K), jnp.float32),
        "dp_present": jnp.ones((B, K), jnp.float32),
        "part_shift": jnp.zeros((B, K, 3), jnp.float32),
        "part_scale": jnp.ones((B, K, 3), jnp.float32),
        "noise": jnp.zeros((B, 1), jnp.float32),
    }
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda r, b: model.init(r, b, 0, method=AnchorDiffAE.loss))(
        rngs, batch
    )
    tx = build_optimizer_from_cfg(dict(type="Adam", lr=1e-3))
    state = TrainState.create(jax.device_get(variables), tx)
    with open(out, "rb") as f:
        state = serialization.from_bytes(state, f.read())
    return {"model": model, "state": state, "t_align": t_align}


def test_car_config_converts_cleanly(rehearsal_car):
    leaves = jax.tree_util.tree_leaves(rehearsal_car["state"].params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_car_aligner_parity_noise_scale_50(rehearsal_car):
    """noise_scale=50 must flow config -> model; a model still at 100 would
    double the noise injection and fail this parity check."""
    m, state, t_align = (
        rehearsal_car["model"], rehearsal_car["state"], rehearsal_car["t_align"],
    )
    rng = np.random.RandomState(11)
    part_code = rng.randn(2, K, ZDIM).astype(np.float32)
    noise = (rng.randn(2, NOISE_DIM) * 0.01).astype(np.float32)
    valid = np.ones((2, K), np.float32)
    valid[0, 1] = 0.0
    with torch.no_grad():
        tm, tv = t_align(
            torch.from_numpy(part_code), torch.from_numpy(valid),
            torch.from_numpy(noise),
        )
    jm, jv = m.apply(
        _vars(state), jnp.asarray(part_code), jnp.asarray(valid), jnp.asarray(noise),
        method=lambda mod, p, v, n: mod.encoder_mod.aligner(p, v, noise=n),
    )
    np.testing.assert_allclose(np.asarray(jm), tm.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), atol=1e-3)


def test_conversion_report_clean_and_corrupted(rehearsal, tmp_path):
    """ingest_with_report: a clean .pth reports zero missing/suspicious/
    problems; a corrupted one (shape mismatch, unknown model key, whole
    aligner absent) names each failure class instead of stack-tracing."""
    from difffacto_tpu.utils.torch_ingest import ingest_with_report

    def build_sd():
        sd = {}
        sd.update(to_np_sd(rehearsal["t_enc"], "encoder.encoder."))
        sd.update(to_np_sd(rehearsal["t_align"], "encoder.part_aligner."))
        sd.update(to_np_sd(rehearsal["t_flows"], "encoder.flow."))
        sd.update(to_np_sd(rehearsal["t_den"], "diffusion.model."))
        return sd

    def save(sd, name):
        p = tmp_path / name
        torch.save(
            {"model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}}, p
        )
        return str(p)

    model, state = rehearsal["model"], rehearsal["state"]

    _, clean = ingest_with_report(save(build_sd(), "clean.pth"), model, state)
    assert clean["missing"] == []
    assert clean["suspicious"] == []
    assert clean["problems"] == []
    assert clean["written"] == clean["template_leaves"]

    sd = build_sd()
    k_bad = next(
        k for k in sorted(sd)
        if k.startswith("diffusion.model.") and np.asarray(sd[k]).ndim == 2
    )
    sd[k_bad] = np.zeros((3, 5), np.float32)  # shape mismatch
    sd["encoder.bogus_head.weight"] = np.zeros((4, 4), np.float32)  # unknown
    for k in [k for k in sd if k.startswith("encoder.part_aligner.")]:
        del sd[k]  # stage-1-style ckpt: aligner absent entirely
    sd["optimizer"] = np.zeros(3, np.float32)  # expected non-model leftover

    _, rep = ingest_with_report(save(sd, "corrupt.pth"), model, state)
    assert rep["problems"], "shape mismatch must be recorded"
    assert "encoder.bogus_head.weight" in rep["suspicious"]
    assert any("aligner" in m for m in rep["missing"])
    assert "optimizer" in rep["expected_leftovers"]


def test_end_to_end_forward_with_ingested_weights(rehearsal):
    """Training loss and a reconstruction forward both run finite on the
    ingested full checkpoint."""
    from difffacto_tpu.models import AnchorDiffAE

    m, state, batch = rehearsal["model"], rehearsal["state"], rehearsal["batch"]
    rng = np.random.RandomState(4)
    batch = dict(batch)
    batch["input"] = jnp.asarray(rng.randn(2, N_PTS, 3).astype(np.float32) * 0.3)
    batch["ref"] = batch["input"]
    losses, _ = m.apply(
        _vars(state), batch, 0,
        method=AnchorDiffAE.loss,
        rngs={"sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(losses["mse_loss"]))
