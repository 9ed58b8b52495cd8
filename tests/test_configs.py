"""Every shipped config file loads, builds its model, and builds its optimizer.

The reference ships per-category configs (reference configs/gen_{chair,
airplane,car,lamp}.py, train_chair_stage{1,2}.py) whose only contract is
"run_net.py --config-file <x> works"; this pins the equivalent contract for
every top-level config in this repo, including the TPU bench configs, so a
registry rename or a base-config edit can't silently orphan one of them.

A deeper end-to-end smoke (init + loss + decode) runs on gen_lamp — the
category config whose delta (noise_scale=10) changes model behavior rather
than just data plumbing; gen_chair's full pipeline is already exercised by
__graft_entry__/test_runner.
"""

import glob
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_FILES = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(REPO, "configs", "*.py"))
)


@pytest.mark.parametrize("name", CONFIG_FILES)
def test_config_loads_and_builds(name):
    import difffacto_tpu.models  # noqa: F401 -- populates MODELS
    from difffacto_tpu.config import Config
    from difffacto_tpu.parallel import build_optimizer_from_cfg
    from difffacto_tpu.utils.registry import MODELS, build_from_cfg

    cfg = Config(os.path.join(REPO, "configs", name))
    assert cfg.model is not None, name
    model = build_from_cfg(cfg.model.dump(), MODELS)
    assert model is not None, name

    if getattr(cfg, "optimizer", None) is not None:
        scheduler = cfg.scheduler.dump() if getattr(cfg, "scheduler", None) else None
        tx = build_optimizer_from_cfg(
            cfg.optimizer.dump(),
            scheduler_cfg=scheduler,
            iters_per_epoch=10,
            max_norm=getattr(cfg, "max_norm", None),
        )
        assert tx is not None, name


def test_gen_lamp_end_to_end_smoke():
    """gen_lamp (noise_scale=10 delta) init + loss + decode on tiny shapes."""
    import jax

    from __graft_entry__ import _example_batch
    from difffacto_tpu.config import Config
    from difffacto_tpu.models import AnchorDiffAE
    from difffacto_tpu.utils.registry import MODELS, build_from_cfg

    cfg = Config(os.path.join(REPO, "configs", "gen_lamp.py"))
    mcfg = cfg.model.dump()
    assert mcfg["encoder"]["part_aligner"]["noise_scale"] == 10
    npoints = 64
    mcfg["npoints"] = npoints
    mcfg["ret_traj"] = False
    model = build_from_cfg(mcfg, MODELS)

    batch = _example_batch(B=2, npoints=npoints)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sample": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    variables = jax.jit(
        lambda r, b: model.init(r, b, 0, method=AnchorDiffAE.loss)
    )(rngs, batch)
    losses, _ = jax.jit(
        lambda v, b: model.apply(
            v, b, 0, method=AnchorDiffAE.loss,
            rngs={"sample": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
    )(variables, batch)
    assert np.isfinite(float(losses["mse_loss"]))
