"""Golden parity of the LR-schedule family against the reference's OWN
torch schedulers (/root/reference/python/difffacto/optimizers/schedulers.py),
driven epoch-by-epoch through real torch optimizers.

Our side is a pure ``lr(epoch) -> multiplier`` function (parallel/optim.py);
the reference is a stateful torch scheduler stepped per epoch. Parity is the
full per-epoch lr sequence, including two reference quirks kept faithfully:

* ``CustomStepLR`` drops AT the milestone epoch (``bisect`` = bisect_right).
* ``CosineAnnealingLRWithWarmUp``'s post-warmup recursion rescales from the
  LAST WARMUP value, leaving the cosine tail multiplied by ~0.9 relative to
  the closed form (schedulers.py:77-106).
"""

import math
import os
import sys
import warnings

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_reference_parity import _install_reference  # noqa: E402

REF_ROOT = "/root/reference/python"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not present"
)

BASE_LR = 2e-3


def _ref_lr_sequence(build, epochs):
    """Construct the reference scheduler on a dummy Adam and record the lr
    seen by the optimizer at each epoch (before that epoch's step())."""
    opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(1))], lr=BASE_LR)
    sched = build(opt)
    out = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for _ in range(epochs):
            out.append(opt.param_groups[0]["lr"])
            sched.step()
    return np.asarray(out, np.float64)


def _our_lr_sequence(lr_func, epochs):
    return np.asarray(
        [BASE_LR * float(lr_func(e)) for e in range(epochs)], np.float64
    )


def test_linear_lr_parity():
    """schedulers.py:7-19 — the shipped schedule of every config."""
    _install_reference()
    from difffacto.optimizers.schedulers import LinearLR as RefLinearLR

    from difffacto_tpu.parallel.optim import LinearLR

    kw = dict(start_epoch=10, end_epoch=40, start_lr=BASE_LR, end_lr=1e-4)
    ref = _ref_lr_sequence(lambda o: RefLinearLR(o, **kw), 60)
    ours = _our_lr_sequence(LinearLR(**kw), 60)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_custom_step_lr_parity():
    """schedulers.py:21-28 — the drop applies AT the milestone epoch
    (bisect_right), incl. a deliberately unsorted milestone list."""
    _install_reference()
    from difffacto.optimizers.schedulers import CustomStepLR as RefCustomStepLR

    from difffacto_tpu.parallel.optim import CustomStepLR

    ms = [30, 10, 45]
    ref = _ref_lr_sequence(lambda o: RefCustomStepLR(o, list(ms), 0.3), 60)
    ours = _our_lr_sequence(CustomStepLR(list(ms), 0.3), 60)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    # the boundary epochs themselves are the regression: already dropped
    assert ref[10] == pytest.approx(BASE_LR * 0.3, rel=1e-6)
    assert ours[10] == pytest.approx(BASE_LR * 0.3, rel=1e-6)


def test_step_lr_parity():
    """torch StepLR registered verbatim (schedulers.py:110)."""
    _install_reference()
    from torch.optim.lr_scheduler import StepLR as RefStepLR

    from difffacto_tpu.parallel.optim import StepLR

    ref = _ref_lr_sequence(lambda o: RefStepLR(o, step_size=7, gamma=0.5), 40)
    ours = _our_lr_sequence(StepLR(step_size=7, gamma=0.5), 40)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_cosine_annealing_lr_parity():
    """torch CosineAnnealingLR registered verbatim (schedulers.py:112); the
    torch recursion equals the closed form when it alone drives the lr."""
    _install_reference()
    from torch.optim.lr_scheduler import CosineAnnealingLR as RefCos

    from difffacto_tpu.parallel.optim import CosineAnnealingLR

    kw = dict(T_max=50, eta_min=1e-5)
    ref = _ref_lr_sequence(lambda o: RefCos(o, **kw), 51)
    ours = _our_lr_sequence(CosineAnnealingLR(base_lr=BASE_LR, **kw), 51)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_reference_cosine_warmup_init_broken_as_shipped():
    """Pin a reference defect: CosineAnnealingLRWithWarmUp.__init__ passes
    ``verbose`` positionally to _LRScheduler (schedulers.py:76), an argument
    torch 2.x removed — direct construction raises TypeError. If a fixed
    reference/torch combo lands, drop the __new__ workaround below."""
    _install_reference()
    from difffacto.optimizers.schedulers import (
        CosineAnnealingLRWithWarmUp as RefCosWarm,
    )

    opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(1))], lr=BASE_LR)
    with pytest.raises(TypeError):
        RefCosWarm(opt, T_max=120)


def _build_ref_cos_warm(opt, T_max, eta_min, warmup_T, warmup_lr):
    """Reproduce ONLY the four attribute assignments of the broken __init__
    (schedulers.py:71-76), then enter the modern _LRScheduler init; all lr
    MATH (get_lr) is the reference's verbatim."""
    from difffacto.optimizers.schedulers import (
        CosineAnnealingLRWithWarmUp as RefCosWarm,
    )

    sched = RefCosWarm.__new__(RefCosWarm)
    sched.T_max = T_max - warmup_T
    sched.eta_min = eta_min
    sched.warmup_T = warmup_T
    sched.warmup_lr = warmup_lr
    torch.optim.lr_scheduler._LRScheduler.__init__(sched, opt, -1)
    return sched


def test_cosine_warmup_parity_and_quirk():
    """schedulers.py:31-106 — warmup ramp, then the recursion anchored at the
    last warmup value. The tail is ~0.9x the closed form (the reference quirk
    this test pins): warm(warmup_T-1) != closed(warmup_T-1)."""
    _install_reference()
    from difffacto_tpu.parallel.optim import CosineAnnealingLRWithWarmUp

    T_max, warmup_T, warmup_lr, eta_min = 120, 10, 1e-6, 0.0
    T = T_max - warmup_T  # reference internally shifts T_max
    epochs = T + 1  # stop at the half-period; past it the SGDR mirror starts
    ref = _ref_lr_sequence(
        lambda o: _build_ref_cos_warm(
            o, T_max=T_max, eta_min=eta_min, warmup_T=warmup_T, warmup_lr=warmup_lr
        ),
        epochs,
    )
    ours = _our_lr_sequence(
        CosineAnnealingLRWithWarmUp(
            T_max=T_max, eta_min=eta_min, warmup_T=warmup_T, warmup_lr=warmup_lr,
            base_lr=BASE_LR,
        ),
        epochs,
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-12)
    # pin the quirk itself: the tail is NOT the closed-form cosine
    closed_mid = eta_min + (BASE_LR - eta_min) * (
        1 + math.cos(math.pi * (T // 2) / T)
    ) / 2
    assert ref[T // 2] < 0.95 * closed_mid
