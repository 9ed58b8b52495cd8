"""Tests for secondary runners: pretrain, GAN, mixing, language."""

import os

import numpy as np
import jax
import pytest


def load_tiny_cfg(tmp_path, name="run"):
    from difffacto_tpu.config import Config

    cfg = Config(os.path.join(os.path.dirname(__file__), "configs/tiny_gen.py"))
    cfg.work_dir = str(tmp_path / name)
    cfg.max_epoch = 1
    cfg.eval_interval = None
    cfg.checkpoint_interval = None
    cfg.cimle_cache_interval = None
    return cfg


def test_pretrain_runner(tmp_path):
    from difffacto_tpu.runner import PretrainRunner

    cfg = load_tiny_cfg(tmp_path, "pretrain")
    cfg.pts_per_part = 16
    # per-part pretraining conditions on ONE part token -> pointwise denoiser
    # (the reference pretrain configs do the same)
    cfg.model.diffusion.net = dict(
        type="PointwiseNet", point_dim=3, context_dim=16, hidden=(32, 64, 32)
    )
    cfg.model.diffusion.learn_variance = False
    runner = PretrainRunner(cfg=cfg)
    runner.run()
    assert runner.epoch == 1
    out = runner.val()
    assert os.path.exists(os.path.join(runner.work_dir, "val"))


def test_gan_runner(tmp_path):
    from difffacto_tpu.runner import GanRunner

    cfg = load_tiny_cfg(tmp_path, "gan")
    cfg.generator = dict(type="Generator", noise_dim=8, out_dim=16, n_class=4)
    cfg.discriminator = dict(type="Discriminator", in_dim=64)
    cfg.n_critic = 2
    runner = GanRunner(cfg=cfg)
    runner.run()
    assert runner.epoch == 1
    codes = runner.generate_codes(4, jax.random.PRNGKey(0))
    assert codes.shape == (4, 4, 16)
    assert np.isfinite(np.asarray(codes)).all()


def test_mixing_runner(tmp_path):
    from difffacto_tpu.runner import MixingRunner

    cfg = load_tiny_cfg(tmp_path, "mixing")
    cfg.max_epoch = 0
    runner = MixingRunner(cfg=cfg)
    out = runner.mixing()
    assert "pred" in out
    assert os.path.exists(os.path.join(runner.work_dir, "mixing", "mixing.pkl"))


def test_language_runner(tmp_path):
    from difffacto_tpu.runner import LanguageRunner

    cfg = load_tiny_cfg(tmp_path, "lang")
    cfg.dataset.train = dict(type="SyntheticLanguagePart", batch_size=4, size=8, npoints=64)
    cfg.dataset.val = dict(type="SyntheticLanguagePart", batch_size=4, size=4, npoints=64, split="test")
    runner = LanguageRunner(cfg=cfg)
    runner.no_eval = True
    runner.run()
    assert runner.epoch == 1


def test_pretrain_loss_decreases(tmp_path):
    """The per-part diffusion loss must actually fall under its optimizer
    (fixed rng -> fixed noise target), and post-training samples stay finite
    (reference pretrain_runner.py:37-261)."""
    import jax.numpy as jnp
    from difffacto_tpu.models import AnchorDiffAE
    from difffacto_tpu.runner import PretrainRunner
    from difffacto_tpu.runner.extra_runners import _split_parts

    cfg = load_tiny_cfg(tmp_path, "pretrain_dir")
    cfg.pts_per_part = 16
    cfg.model.diffusion.net = dict(
        type="PointwiseNet", point_dim=3, context_dim=16, hidden=(32, 64, 32)
    )
    cfg.model.diffusion.learn_variance = False
    runner = PretrainRunner(cfg=cfg)
    batch = next(iter(runner.train_loader))
    parts = _split_parts(
        batch, runner.model.num_anchors, runner.pts_per_part, np.random.RandomState(0)
    )
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(40):
        runner.state, metrics = runner._pretrain_step(runner.state, parts, rng)
        losses.append(float(metrics["total_loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses[:3] + losses[-3:]
    outs = runner.model.apply(
        runner.state.variables(), 2, runner.pts_per_part,
        method=AnchorDiffAE.pretrain_sample, rngs={"sample": rng},
    )
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_gan_losses_move_right_direction(tmp_path):
    """D trained against a fixed fake distribution separates real from fake
    (d_loss falls); G trained against the frozen D then fools it more
    (gen_loss falls) — reference gan_runner.py:17-440."""
    from difffacto_tpu.runner import GanRunner

    cfg = load_tiny_cfg(tmp_path, "gan_dir")
    cfg.generator = dict(type="Generator", noise_dim=8, out_dim=16, n_class=4)
    cfg.discriminator = dict(type="Discriminator", in_dim=64)
    cfg.g_lr = 1e-3
    cfg.d_lr = 1e-3
    runner = GanRunner(cfg=cfg)
    codes = runner.real_codes(next(iter(runner.train_loader)))
    rng = jax.random.PRNGKey(0)

    d_losses = []
    for _ in range(30):
        dp, runner.d_opt, dl = runner._d_step(
            runner.d_vars["params"], runner.d_opt, runner.g_vars, codes, rng
        )
        runner.d_vars = {"params": dp}
        d_losses.append(float(dl))
    assert np.mean(d_losses[-5:]) < np.mean(d_losses[:5]), d_losses[:3] + d_losses[-3:]

    g_losses = []
    for _ in range(30):
        gp, runner.g_opt, gl = runner._g_step(
            runner.g_vars["params"], runner.g_opt, runner.d_vars, rng,
            int(codes.shape[0]),
        )
        runner.g_vars = {"params": gp}
        g_losses.append(float(gl))
    assert np.mean(g_losses[-5:]) < np.mean(g_losses[:5]), g_losses[:3] + g_losses[-3:]


def test_language_loss_decreases(tmp_path):
    """The triplet/contrastive language loss must fall while only language
    modules receive gradients (reference language_runner.py)."""
    import jax.numpy as jnp
    from difffacto_tpu.runner import LanguageRunner

    cfg = load_tiny_cfg(tmp_path, "lang_dir")
    cfg.dataset.train = dict(type="SyntheticLanguagePart", batch_size=4, size=8, npoints=64)
    cfg.dataset.val = dict(
        type="SyntheticLanguagePart", batch_size=4, size=4, npoints=64, split="test"
    )
    runner = LanguageRunner(cfg=cfg)
    batch = next(iter(runner.train_loader))
    db = {
        k: jnp.asarray(np.asarray(v))
        for k, v in batch.items()
        if k in ("input", "ref", "attn_map", "ref_attn_map", "seg_mask",
                 "ref_seg_mask", "part_indicator", "text")
    }
    rng = jax.random.PRNGKey(0)
    params0 = jax.device_get(runner.state.params)
    losses = []
    for _ in range(30):
        runner.state, metrics = runner._language_step(runner.state, db, rng)
        losses.append(float(metrics["total_loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses[:3] + losses[-3:]

    # only language/update_mlp params moved
    flat0 = jax.tree_util.tree_flatten_with_path(params0)[0]
    flat1 = dict(jax.tree_util.tree_flatten_with_path(jax.device_get(runner.state.params))[0])
    moved_lang = moved_other = 0.0
    for path, v0 in flat0:
        delta = float(np.abs(flat1[path] - v0).sum())
        if any("language" in str(p) or "update_mlp" in str(p) for p in path):
            moved_lang += delta
        else:
            moved_other += delta
    assert moved_lang > 0
    assert moved_other == 0.0


def test_custom_dataset_roundtrip(tmp_path):
    import pickle

    from difffacto_tpu.data import CustomDataset

    rng = np.random.RandomState(0)
    data = {
        "pred": rng.rand(6, 64, 3).astype(np.float32),
        "pred_seg_mask": rng.randint(0, 4, (6, 64)),
    }
    p = str(tmp_path / "gen.pkl")
    with open(p, "wb") as f:
        pickle.dump(data, f)
    loader, _ = CustomDataset(batch_size=3, path=p, npoints=64)
    batch = next(iter(loader))
    assert batch["input"].shape == (3, 64, 3)
    assert batch["present"].shape == (3, 4)
