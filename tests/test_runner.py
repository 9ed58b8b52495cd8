"""End-to-end runner test: config -> train -> CIMLE cache -> val -> ckpt."""

import os
import shutil

import numpy as np
import pytest


@pytest.fixture(scope="module", autouse=True)
def _fast_emd():
    """These are END-TO-END tests (train -> CIMLE cache -> val -> gen ->
    metrics -> ckpt); the metric values are sanity checks, not goldens, yet
    the CPU auction EMD at the conftest's 300 iterations dominated the file
    (test_runner_end_to_end: 208 s -> 35 s at 16 iters, measured). EMD_ITERS
    is read per call and folded into the metric-kernel cache keys, so the
    override takes effect immediately and is restored on teardown."""
    old = os.environ.get("DIFFFACTO_EMD_ITERS")
    os.environ["DIFFFACTO_EMD_ITERS"] = "16"
    yield
    if old is None:
        os.environ.pop("DIFFFACTO_EMD_ITERS", None)
    else:
        os.environ["DIFFFACTO_EMD_ITERS"] = old


@pytest.fixture()
def tiny_cfg(tmp_path):
    from difffacto_tpu.config import Config

    cfg = Config(os.path.join(os.path.dirname(__file__), "configs/tiny_gen.py"))
    cfg.work_dir = str(tmp_path / "run")
    return cfg


@pytest.mark.slow
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


def test_final_checkpoint_without_interval(tiny_cfg, monkeypatch):
    """checkpoint_interval=None must still leave a final checkpoint after a
    completed run — a follow-up --task val/val_gen in the same work_dir
    auto-resumes from it (bench_train_tpu.py's documented flow).

    run()'s save-at-end logic is what's under test; the epoch loop body is
    stubbed out (a real 2-epoch train adds ~190 s of compile to the suite)."""
    from difffacto_tpu.runner import Runner

    tiny_cfg.checkpoint_interval = None
    runner = Runner(cfg=tiny_cfg)
    runner.no_eval = True

    def fake_train():
        runner.epoch += 1

    monkeypatch.setattr(runner, "train", fake_train)
    monkeypatch.setattr(runner, "cache_noise", lambda: None)
    runner.run()
    ckpts = os.listdir(os.path.join(runner.work_dir, "checkpoints"))
    assert any(c.endswith(".msgpack") for c in ckpts)


@pytest.mark.slow
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


def test_two_stage_transition(tmp_path):
    """Stage-1 -> stage-2 wiring: a checkpoint trained WITHOUT the part
    aligner (use_gt_params=True, reference configs/train_chair_stage1.py)
    restores model_only into the FULL model (aligner params kept at init via
    the shape/name-tolerant partial load, reference runner.py:492-522) and
    stage 2 trains only the aligner (train_chair_stage2.py:155-157)."""
    import jax
    import jax.numpy as jnp
    from difffacto_tpu.config import Config
    from difffacto_tpu.runner import Runner

    cfg_path = os.path.join(os.path.dirname(__file__), "configs/tiny_gen.py")

    # stage 1: no aligner, denoiser conditioned on gt params, no CIMLE
    cfg1 = Config(cfg_path)
    cfg1.work_dir = str(tmp_path / "stage1")
    cfg1.model["encoder"]["part_aligner"] = None
    cfg1.model["encoder"]["use_gt_params"] = True
    cfg1.model["cimle"] = False
    cfg1.cimle = False
    cfg1.cimle_cache_interval = None
    runner1 = Runner(cfg=cfg1)
    runner1.no_eval = True
    runner1.run()
    ckpt = os.path.join(runner1.work_dir, "checkpoints", "ckpt_2.msgpack")
    assert os.path.exists(ckpt)
    s1_params = jax.device_get(runner1.state.params)

    # stage 2: full model (with aligner), model_only resume, aligner-only opt
    cfg2 = Config(cfg_path)
    cfg2.work_dir = str(tmp_path / "stage2")
    cfg2.model_only = True
    cfg2.resume_path = ckpt
    cfg2.train_aligner = True
    runner2 = Runner(cfg=cfg2)
    assert runner2.epoch == 0  # model_only must not restore epoch/iter

    # shared (encoder) weights carried over from stage 1 exactly
    def leaves_with_path(tree):
        return {
            tuple(getattr(k, "key", str(k)) for k in path): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    s1 = leaves_with_path(s1_params)
    s2 = leaves_with_path(jax.device_get(runner2.state.params))
    carried = 0
    for path, v2 in s2.items():
        if any("aligner" in str(p) for p in path):
            continue  # absent from the stage-1 ckpt: stays at init
        assert path in s1, path
        np.testing.assert_array_equal(s1[path], v2, err_msg=str(path))
        carried += 1
    assert carried > 0

    # stage 2 trains (aligner-only grad filter) without error
    runner2.no_eval = True
    runner2.run()
    assert runner2.epoch == 2
    s2_after = leaves_with_path(jax.device_get(runner2.state.params))
    moved_aligner = sum(
        float(np.abs(s2_after[p] - s2[p]).sum())
        for p in s2
        if any("aligner" in str(x) for x in p)
    )
    moved_other = sum(
        float(np.abs(s2_after[p] - s2[p]).sum())
        for p in s2
        if not any("aligner" in str(x) for x in p)
    )
    assert moved_aligner > 0
    assert moved_other == 0.0


@pytest.mark.slow
def test_val_gen_protocol(tiny_cfg):
    from difffacto_tpu.runner import Runner

    tiny_cfg.max_epoch = 0
    runner = Runner(cfg=tiny_cfg)
    metrics = runner.generate_samples(num_gen=8, batch=4)
    assert "1-NN-CD-acc" in metrics
    assert np.isfinite(metrics["1-NN-CD-acc"])
