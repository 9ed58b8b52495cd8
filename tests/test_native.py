"""Native C++ text parser tests (falls back gracefully without g++)."""

import numpy as np
import pytest


def test_fast_loadtxt_matches_numpy(tmp_path):
    from difffacto_tpu.native import fast_loadtxt

    rng = np.random.RandomState(0)
    data = rng.randn(500, 7).astype(np.float32)
    p = str(tmp_path / "cloud.txt")
    np.savetxt(p, data, fmt="%.6f")
    a = fast_loadtxt(p)
    b = np.loadtxt(p, dtype=np.float32)
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert a.shape == (500, 7)


def test_fast_loadtxt_scientific(tmp_path):
    from difffacto_tpu.native import fast_loadtxt

    rng = np.random.RandomState(1)
    data = (rng.randn(100, 3) * 1e-5).astype(np.float64)
    p = str(tmp_path / "sci.txt")
    np.savetxt(p, data, fmt="%.8e")
    a = fast_loadtxt(p)
    b = np.loadtxt(p, dtype=np.float32)
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_fast_loadtxt_negative_and_ints(tmp_path):
    from difffacto_tpu.native import fast_loadtxt

    p = str(tmp_path / "mixed.txt")
    with open(p, "w") as f:
        f.write("1 -2.5 3\n-0.125 4e2 -1e-3\n")
    a = fast_loadtxt(p)
    np.testing.assert_allclose(
        a, np.array([[1, -2.5, 3], [-0.125, 400, -0.001]], np.float32), rtol=1e-6
    )
