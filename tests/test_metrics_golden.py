"""Golden tests pinning PRESERVED reference quirks in the metric suite.

These fixtures are tiny and hand-computed. They exist so that a future
"fix" of a deliberately-reproduced reference behavior fails loudly instead
of silently breaking parity:

* ``knn(one_way=True)`` sets ``label = pred[:n0]`` (reference
  evaluation_utils.py:225-227) — the labels are overwritten with the
  predictions, so ``acc`` is trivially 1.0. Faithful to the reference.
* ``lgan_mmd_cov`` outlier handling remaps an outlier ref's matched sample
  to ``sorted_idx[0]`` (evaluation_utils.py:258-260), shrinking COV, while
  the outlier distance still enters the MMD mean.
* ``compute_all_metrics`` builds pairwise matrices as (ref x sample) and
  transposes them for MMD/COV (evaluation_utils.py:500-541), so COV is
  normalized by the REF count and MMD averages per-ref minima.
"""

import numpy as np

from difffacto_tpu.metrics.eval import compute_all_metrics, knn, lgan_mmd_cov


def test_knn_two_way_golden():
    """Hand-computed 2x2 fixture: every column's nearest neighbor is in the
    OTHER set, so the classifier is always wrong -> acc 0."""
    Mxx = np.array([[0.0, 5.0], [5.0, 0.0]])
    Mxy = np.array([[1.0, 9.0], [9.0, 2.0]])
    Myy = np.array([[0.0, 3.0], [3.0, 0.0]])
    r = knn(Mxx, Mxy, Myy, k=1)
    assert r["acc"] == 0.0
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (0.0, 2.0, 2.0, 0.0)

    # Well-separated sets: always right -> acc 1.
    far = np.full((2, 2), 100.0)
    r2 = knn(Mxx, far, Myy, k=1)
    assert r2["acc"] == 1.0


def test_knn_one_way_label_equals_pred_quirk():
    """one_way=True overwrites label with pred (evaluation_utils.py:225-227):
    acc and acc_f are trivially perfect EVEN when the two-way classifier is
    always wrong. acc_t is 0 when there are no positive predictions."""
    Mxx = np.array([[0.0, 5.0], [5.0, 0.0]])
    Mxy = np.array([[1.0, 9.0], [9.0, 2.0]])
    Myy = np.array([[0.0, 3.0], [3.0, 0.0]])
    r = knn(Mxx, Mxy, Myy, k=1, one_way=True)
    # pred[:n0] = [0, 0]; label = pred -> tn=2, everything else 0.
    assert r["acc"] == 1.0
    np.testing.assert_allclose(r["acc_f"], 1.0, rtol=1e-9)
    assert r["acc_t"] < 1e-9  # 0 / (0 + eps)
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (0.0, 0.0, 0.0, 2.0)


def test_lgan_mmd_cov_outlier_remap_quirk():
    """An outlier ref (min dist > thresh) is remapped to the closest ref's
    matched sample, REDUCING cov; its distance still inflates mmd."""
    all_dist = np.array(
        [
            [0.1, 10.0, 3000.0],
            [5.0, 0.2, 4000.0],
            [6.0, 7.0, 2000.0],
        ]
    )
    r = lgan_mmd_cov(all_dist, thresh=1000.0)
    # Without the remap, matched samples would be {0, 1, 2} -> cov 1.0;
    # the quirk remaps ref2's match (sample 2) to sample 0 -> cov 2/3.
    np.testing.assert_allclose(r["lgan_cov"], 2.0 / 3.0)
    np.testing.assert_allclose(r["lgan_mmd"], (0.1 + 0.2 + 2000.0) / 3.0)
    np.testing.assert_allclose(r["lgan_mmd_smp"], (0.1 + 0.2 + 6.0) / 3.0)

    # Below threshold: no remap, cov is 1.
    r2 = lgan_mmd_cov(all_dist / 10.0, thresh=1000.0)
    np.testing.assert_allclose(r2["lgan_cov"], 1.0)


def test_compute_all_metrics_orientation_golden():
    """Constant point clouds on the x-axis make every pairwise CD exactly
    2*dx^2, so the whole MMD/COV/1-NNA pipeline is hand-checkable.

    samples at x = 5.5, 20; refs at x = 0, 1, 3, 10.
    """
    n_pts = 8

    def cloud(x):
        c = np.zeros((n_pts, 3), np.float32)
        c[:, 0] = x
        return c

    sample = np.stack([cloud(5.5), cloud(20.0)])
    ref = np.stack([cloud(0.0), cloud(1.0), cloud(3.0), cloud(10.0)])
    res = compute_all_metrics(sample, ref, batch_size=4, compute_emd=False)

    # MMD averages per-REF minima over samples: refs match sample0 except
    # ref3 (x=10) which is closer to sample1? no: d(10,5.5)=4.5 < d(10,20)=10
    # -> all four refs match sample 0: mins = 2*[5.5^2, 4.5^2, 2.5^2, 4.5^2].
    mins = 2 * np.array([5.5**2, 4.5**2, 2.5**2, 4.5**2])
    np.testing.assert_allclose(res["lgan_mmd-CD"], mins.mean(), rtol=1e-5)
    # COV normalized by the REF count: only sample 0 is ever matched -> 1/4.
    np.testing.assert_allclose(res["lgan_cov-CD"], 0.25)
    # mmd_smp: per-SAMPLE minima over refs: s0->ref2 (2.5), s1->ref3 (10).
    smp = 2 * np.array([2.5**2, 10.0**2])
    np.testing.assert_allclose(res["lgan_mmd_smp-CD"], smp.mean(), rtol=1e-5)

    # 1-NNA hand trace (label=[1,1,1,1,0,0], nearest neighbor per column):
    # r0->r1(1), r1->r0(1), r2->r1(1), r3->s0(0), s0->r2(1), s1->r3(1)
    # pred=[1,1,1,0,1,1] -> tp=3 fn=1 fp=2 tn=0 -> acc=0.5.
    np.testing.assert_allclose(res["1-NN-CD-acc"], 0.5)
    np.testing.assert_allclose(res["1-NN-CD-acc_t"], 0.75, rtol=1e-9)
    assert res["1-NN-CD-acc_f"] < 1e-9
