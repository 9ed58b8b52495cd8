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
