"""Mesh-sharded metric protocol: bit-identity with the single-device sweep.

The pairwise CD/EMD sweeps (the 400v400 protocol's dominant cost — reference
O(S*R) python loop, evaluation_utils.py:143-200) shard their row / pair-chunk
axes over a ('data',) mesh (metrics/eval.py). Every device runs the identical
per-row scan program on its slice, so the sharded matrices must be
BIT-identical (np.array_equal, not allclose) to the single-device ones.
"""

import os

import numpy as np
import pytest

import jax

from difffacto_tpu.metrics.eval import (
    compute_all_metrics,
    emd_cd_paired,
    pairwise_cd_emd,
    pairwise_self_cd_emd,
    set_default_eval_mesh,
)
from difffacto_tpu.parallel import make_mesh


@pytest.fixture(scope="module", autouse=True)
def _fast_emd():
    """Bit-identity doesn't need eval-grade EMD accuracy, and the sharded
    dispatches pad rows/chunks up to 8x the real work — which executes
    SEQUENTIALLY on the single-core CI host. A small iteration budget keeps
    this file fast; EMD_ITERS() is read per call and folded into the kernel
    cache keys, so the override takes effect immediately and is scoped to
    this module's tests (restored on teardown)."""
    old = os.environ.get("DIFFFACTO_EMD_ITERS")
    os.environ["DIFFFACTO_EMD_ITERS"] = "60"
    yield
    if old is None:
        os.environ.pop("DIFFFACTO_EMD_ITERS", None)
    else:
        os.environ["DIFFFACTO_EMD_ITERS"] = old


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual CPU devices"
    return make_mesh(jax.devices())


def _clouds(s, n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(s, n, 3).astype(np.float32) * 0.4


def test_pairwise_cd_emd_mesh_bit_identical(mesh8):
    sample = _clouds(6, 32, 0)
    ref = _clouds(5, 32, 1)
    mask = (np.arange(32)[None] < 30).astype(np.float32).repeat(6, 0)
    cd0, emd0 = pairwise_cd_emd(sample, ref, batch_size=4, mask_sample=mask)
    cd1, emd1 = pairwise_cd_emd(sample, ref, batch_size=4, mask_sample=mask, mesh=mesh8)
    assert cd0.shape == cd1.shape == (6, 5)
    assert np.array_equal(cd0, cd1)
    assert np.array_equal(emd0, emd1)


def test_pairwise_self_cd_emd_mesh_bit_identical(mesh8):
    pts = _clouds(7, 32, 2)
    cd0, emd0 = pairwise_self_cd_emd(pts, batch_size=4)
    cd1, emd1 = pairwise_self_cd_emd(pts, batch_size=4, mesh=mesh8)
    assert np.array_equal(cd0, cd1)
    assert np.array_equal(emd0, emd1)


def test_emd_cd_paired_mesh_bit_identical(mesh8):
    a = _clouds(9, 32, 3)
    b = _clouds(9, 32, 4)
    r0 = emd_cd_paired(a, b, batch_size=4, reduced=False)
    r1 = emd_cd_paired(a, b, batch_size=4, reduced=False, mesh=mesh8)
    assert np.array_equal(r0["MMD-CD"], r1["MMD-CD"])
    assert np.array_equal(r0["MMD-EMD"], r1["MMD-EMD"])


def test_compute_all_metrics_mesh_identical(mesh8):
    gen = _clouds(6, 32, 5)
    ref = _clouds(5, 32, 6)
    m0 = compute_all_metrics(gen, ref, batch_size=4)
    m1 = compute_all_metrics(gen, ref, batch_size=4, mesh=mesh8)
    assert m0.keys() == m1.keys()
    for k in m0:
        assert m0[k] == m1[k], k


def test_default_eval_mesh_routes_and_resets(mesh8):
    """set_default_eval_mesh shards calls with no explicit mesh (the dataset
    evaluate-hook path), and explicit/None behavior is restored after."""
    pts = _clouds(5, 32, 7)
    cd0, emd0 = pairwise_self_cd_emd(pts, batch_size=4)
    try:
        set_default_eval_mesh(mesh8)
        cd1, emd1 = pairwise_self_cd_emd(pts, batch_size=4)
    finally:
        set_default_eval_mesh(None)
    assert np.array_equal(cd0, cd1)
    assert np.array_equal(emd0, emd1)
