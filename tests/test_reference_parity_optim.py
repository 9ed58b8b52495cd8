"""Golden parity of optimizer UPDATE MATH against the reference's own
optimizers (/root/reference/python/difffacto/optimizers/optimizers.py — thin
wrappers over torch Adam/AdamW/Adamax) and the reference runner's per-epoch
scheduler stepping (runner.py:155).

Identical initial params and per-step gradients are fed to both sides; the
full parameter trajectory must agree. Pins eps placement, bias correction,
and the L2-vs-decoupled weight-decay split (torch Adam folds wd into the
grad; AdamW decays decoupled) that our optax chain reproduces
(parallel/optim.py:_base_optimizer).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_reference_parity import _install_reference  # noqa: E402

REF_ROOT = "/root/reference/python"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not present"
)

LR = 2e-3
SHAPES = [(4, 3), (5,)]
STEPS = 8


def _seeded_arrays(seed, scale=1.0):
    rng = np.random.RandomState(seed)
    return [rng.randn(*s).astype(np.float32) * scale for s in SHAPES]


def _torch_trajectory(opt_name, opt_kwargs, grads_per_step, lr_lambda=None):
    """Run the REFERENCE optimizer class; optionally step a per-epoch
    LambdaLR like the reference runner does (runner.py:155)."""
    _install_reference()
    from difffacto.utils.registry import OPTIMS as REF_OPTIMS

    params = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in _seeded_arrays(0)]
    opt = REF_OPTIMS.get(opt_name)(params, lr=LR, **opt_kwargs)
    sched = (
        torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lr_lambda)
        if lr_lambda is not None
        else None
    )
    traj = []
    for step, grads in enumerate(grads_per_step):
        for p, g in zip(params, grads):
            p.grad = torch.from_numpy(g.copy())
        opt.step()
        opt.zero_grad()
        traj.append([p.detach().numpy().copy() for p in params])
        if sched is not None and (step + 1) % 2 == 0:  # epoch = 2 iters
            sched.step()
    return traj


def _ours_trajectory(kind, opt_kwargs, grads_per_step, scheduler_cfg=None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from difffacto_tpu.parallel.optim import build_optimizer_from_cfg

    tx = build_optimizer_from_cfg(
        dict(type=kind, lr=LR, **opt_kwargs),
        scheduler_cfg,
        iters_per_epoch=2,
    )
    params = [jnp.asarray(p) for p in _seeded_arrays(0)]
    state = tx.init(params)
    traj = []
    for grads in grads_per_step:
        updates, state = tx.update([jnp.asarray(g) for g in grads], state, params)
        params = optax.apply_updates(params, updates)
        traj.append([np.asarray(p) for p in params])
    return traj


def _assert_traj_close(ours, ref, rtol=2e-5, atol=1e-7):
    for step, (o_step, r_step) in enumerate(zip(ours, ref)):
        for o, r in zip(o_step, r_step):
            np.testing.assert_allclose(
                o, r, rtol=rtol, atol=atol, err_msg=f"step {step}"
            )


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("Adam", dict(weight_decay=0.0)),
        ("Adam", dict(weight_decay=1e-2)),  # torch: L2 folded into grad
        ("AdamW", dict(weight_decay=1e-2)),  # decoupled decay
        ("Adamax", dict(weight_decay=0.0)),
        ("Adam", dict(betas=(0.8, 0.99), eps=1e-6, weight_decay=0.0)),
    ],
)
def test_optimizer_step_parity(name, kwargs):
    grads = [_seeded_arrays(10 + s) for s in range(STEPS)]
    ref = _torch_trajectory(name, kwargs, grads)
    ours = _ours_trajectory(name, kwargs, grads)
    _assert_traj_close(ours, ref)


def test_epoch_scheduled_trajectory_parity():
    """Composed check: LinearLR stepped once per epoch (2 iters) on the torch
    side vs our floor(step/iters_per_epoch)-indexed schedule multiplier."""
    _install_reference()
    from difffacto.optimizers.schedulers import LinearLR as RefLinearLR

    sched_kw = dict(start_epoch=1, end_epoch=3, start_lr=LR, end_lr=LR / 10)
    grads = [_seeded_arrays(30 + s) for s in range(STEPS)]

    # reuse the reference LinearLR's lr_lambda by building it on a throwaway
    # optimizer and extracting the callable it hands LambdaLR
    tmp_opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(1))], lr=LR)
    lr_lambda = RefLinearLR(tmp_opt, **sched_kw).lr_lambdas[0]

    ref = _torch_trajectory("Adam", dict(weight_decay=0.0), grads, lr_lambda=lr_lambda)
    ours = _ours_trajectory(
        "Adam", dict(weight_decay=0.0), grads, scheduler_cfg=dict(type="LinearLR", **sched_kw)
    )
    _assert_traj_close(ours, ref)
