"""End-to-end runner test: config -> train -> CIMLE cache -> val -> ckpt."""

import os
import shutil

import numpy as np
import pytest


@pytest.fixture()
def tiny_cfg(tmp_path):
    from difffacto_tpu.config import Config

    cfg = Config(os.path.join(os.path.dirname(__file__), "configs/tiny_gen.py"))
    cfg.work_dir = str(tmp_path / "run")
    return cfg


def test_runner_end_to_end(tiny_cfg):
    from difffacto_tpu.runner import Runner

    runner = Runner(cfg=tiny_cfg)
    runner.run()  # 2 epochs: trains, caches CIMLE noise at epoch 0, vals+saves at epoch 2
    assert runner.epoch == 2
    # checkpoint written
    ckpts = os.listdir(os.path.join(runner.work_dir, "checkpoints"))
    assert any(c.endswith(".msgpack") for c in ckpts)
    # CIMLE noise cached into the dataset
    assert len(runner.train_loader.dataset.noises) > 0
    # val artifacts
    val_files = os.listdir(os.path.join(runner.work_dir, "val"))
    assert len(val_files) > 0
    # scalars logged
    assert os.path.exists(os.path.join(runner.work_dir, "scalars.jsonl"))


def test_runner_resume(tiny_cfg):
    from difffacto_tpu.config import Config
    from difffacto_tpu.runner import Runner

    runner = Runner(cfg=tiny_cfg)
    runner.no_eval = True
    runner.run()
    # new runner resumes from the saved checkpoint
    cfg2 = tiny_cfg
    cfg2.max_epoch = 3
    runner2 = Runner(cfg=cfg2)
    assert runner2.epoch == 2
    runner2.no_eval = True
    runner2.run()
    assert runner2.epoch == 3


def test_val_gen_protocol(tiny_cfg):
    from difffacto_tpu.runner import Runner

    tiny_cfg.max_epoch = 0
    runner = Runner(cfg=tiny_cfg)
    metrics = runner.generate_samples(num_gen=8, batch=4)
    assert "1-NN-CD-acc" in metrics
    assert np.isfinite(metrics["1-NN-CD-acc"])
