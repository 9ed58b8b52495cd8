"""Metric-suite and dataset tests on small synthetic data."""

import numpy as np
import jax.numpy as jnp
import pytest

from difffacto_tpu.data import (
    DataLoader,
    SyntheticPartDataset,
    pc_norm,
    sample_part_presence,
)
from difffacto_tpu.metrics import (
    compute_all_metrics,
    compute_snapping_metric,
    emd_cd_paired,
    evaluate_batches,
    jsd_between_point_cloud_sets,
    knn,
    lgan_mmd_cov,
    pairwise_cd_emd,
    pairwise_self_cd_emd,
)


def make_clouds(n, npts=64, seed=0, shift=0.0):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, npts, 3).astype(np.float32) - 0.5 + shift)


class TestMetrics:
    def test_pairwise_shapes(self):
        s = make_clouds(3, seed=0)
        r = make_clouds(5, seed=1)
        cd, emd = pairwise_cd_emd(s, r, batch_size=2)
        assert cd.shape == (3, 5) and emd.shape == (3, 5)
        assert np.isfinite(cd).all() and np.isfinite(emd).all()
        # identical clouds -> near-zero distance on the diagonal of self-pairs
        cd_self, _ = pairwise_cd_emd(s, s, batch_size=2, compute_emd=False)
        assert np.allclose(np.diag(cd_self), 0, atol=1e-4)

    def test_pairwise_self_matches_full_sweep(self, monkeypatch):
        """The triangle+mirror X-vs-X sweep must reproduce the full ordered
        sweep: CD exactly (symmetric by construction), EMD on the computed
        (upper-triangle) orientation exactly and on the mirrored orientation
        within auction approximation noise."""
        from difffacto_tpu.metrics import eval as ev

        monkeypatch.setattr(ev, "PAIRWISE_SELF_CHUNKS", 2)
        pts = make_clouds(5, npts=64, seed=3)
        mask = np.ones((5, 64), np.float32)
        mask[:, 48:] = 0.0
        cd_s, emd_s = ev.pairwise_self_cd_emd(pts, batch_size=2, mask=mask)
        cd_f, emd_f = ev.pairwise_cd_emd(
            pts, pts, batch_size=2, mask_sample=mask, mask_ref=mask
        )
        assert np.allclose(cd_s, cd_s.T) and np.allclose(emd_s, emd_s.T)
        assert np.allclose(np.diag(cd_s), 0) and np.allclose(np.diag(emd_s), 0)
        iu, ju = np.triu_indices(5, k=1)
        np.testing.assert_allclose(cd_s[iu, ju], cd_f[iu, ju], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(emd_s[iu, ju], emd_f[iu, ju], rtol=1e-4, atol=1e-5)
        # mirrored entries: same pair, opposite argument order in the full
        # sweep -> equal up to the auction's approximation band
        np.testing.assert_allclose(emd_s[ju, iu], emd_f[ju, iu], rtol=0.05, atol=1e-3)

    def test_pairwise_ref_block_equivalent(self, monkeypatch):
        """Splitting the ref axis across dispatches (the watchdog escape
        hatch for slow EMD impls) must reproduce the single-dispatch sweep
        exactly, including when the block doesn't divide the chunk count."""
        s = make_clouds(3, npts=64, seed=0)
        r = make_clouds(6, npts=64, seed=1)
        cd_full, emd_full = pairwise_cd_emd(s, r, batch_size=2)
        monkeypatch.setenv("DIFFFACTO_PAIRWISE_REF_BLOCK", "2")
        cd_b, emd_b = pairwise_cd_emd(s, r, batch_size=2)
        np.testing.assert_allclose(cd_b, cd_full, rtol=1e-6)
        np.testing.assert_allclose(emd_b, emd_full, rtol=1e-6)

    def test_compute_all_metrics_symmetric_toggle(self, monkeypatch):
        """1-NNA from the symmetric self-sweep agrees with the reference's
        full sweep on well-separated sets (and the kill-switch works)."""
        s = make_clouds(4, seed=0)
        r = make_clouds(4, seed=1, shift=3.0)
        m_sym = compute_all_metrics(s, r, batch_size=2)
        monkeypatch.setenv("DIFFFACTO_EVAL_SYMMETRIC", "0")
        m_full = compute_all_metrics(s, r, batch_size=2)
        for k in ("1-NN-CD-acc", "1-NN-EMD-acc", "lgan_mmd-CD", "lgan_cov-CD"):
            assert np.isclose(m_sym[k], m_full[k]), (k, m_sym[k], m_full[k])

    def test_knn_separable(self):
        """Disjoint sets -> 1-NNA accuracy 1.0; identical -> ~0.5."""
        a = make_clouds(6, seed=0, shift=0.0)
        b = make_clouds(6, seed=1, shift=5.0)
        Maa, _ = pairwise_cd_emd(a, a, 4, compute_emd=False)
        Mbb, _ = pairwise_cd_emd(b, b, 4, compute_emd=False)
        Mab, _ = pairwise_cd_emd(a, b, 4, compute_emd=False)
        res = knn(Maa, Mab, Mbb, 1)
        assert res["acc"] == 1.0

    def test_lgan_mmd_cov(self):
        d = np.array([[0.1, 0.9], [0.8, 0.2]])
        res = lgan_mmd_cov(d)
        assert np.isclose(res["lgan_mmd"], (0.1 + 0.2) / 2)
        assert res["lgan_cov"] == 1.0

    def test_compute_all_metrics_ref_self_cache(self, monkeypatch):
        """The ref-vs-ref memo returns identical metrics on a hit, actually
        skips recomputation, and misses when a value-changing knob flips."""
        import difffacto_tpu.metrics.eval as ev

        s, s2 = make_clouds(4, seed=0), make_clouds(4, seed=2)
        r = make_clouds(4, seed=1)
        cache = {}
        m0 = compute_all_metrics(s, r, batch_size=2, ref_self_cache=cache)
        assert len(cache) == 1
        # poison the self-sweep: a second call must not invoke it for refs
        # (it still runs for the NEW sample set, so count the calls).
        calls = []
        orig = ev.pairwise_self_cd_emd
        monkeypatch.setattr(
            ev, "pairwise_self_cd_emd",
            lambda pts, *a, **k: calls.append(pts.shape) or orig(pts, *a, **k),
        )
        m1 = compute_all_metrics(s2, r, batch_size=2, ref_self_cache=cache)
        assert len(calls) == 1  # sample self-sweep only; ref block was cached
        m0b = compute_all_metrics(s, r, batch_size=2, ref_self_cache=cache)
        for k in m0:
            assert np.isclose(m0[k], m0b[k]), k
        assert "1-NN-CD-acc" in m1
        # knob changes the key: EMD iters is folded into the fingerprint
        monkeypatch.setenv("DIFFFACTO_EMD_ITERS", "123")
        compute_all_metrics(s, r, batch_size=2, ref_self_cache=cache)
        assert len(cache) == 2

    def test_compute_all_metrics_smoke(self):
        s = make_clouds(4, seed=0)
        r = make_clouds(4, seed=1)
        m = compute_all_metrics(s, r, batch_size=2)
        for k in ("lgan_mmd-CD", "lgan_cov-CD", "1-NN-CD-acc", "1-NN-EMD-acc"):
            assert k in m, m.keys()

    def test_emd_cd_paired(self):
        s = make_clouds(4, seed=0)
        m = emd_cd_paired(s, s, batch_size=2)
        assert m["MMD-CD"] < 1e-4 and m["MMD-EMD"] < 1e-2

    def test_jsd(self):
        s = make_clouds(4, seed=0) * 0.5
        assert jsd_between_point_cloud_sets(s, s) < 1e-9
        r = make_clouds(4, seed=5) * 0.5 + 0.2
        assert jsd_between_point_cloud_sets(s, r) > 0.01


class TestDataset:
    def test_synthetic_item_contract(self):
        ds = SyntheticPartDataset(npoints=128, size=8)
        item = ds[0]
        assert item["input"].shape == (128, 3)
        assert item["ref"].shape == (128, 3)
        assert item["ref_seg_mask"].shape == (128,)
        assert item["ref_attn_map"].shape == (128, 4)
        assert item["part_shift"].shape == (4, 3)
        assert item["part_scale"].shape == (4, 3)
        assert item["present"].shape == (4,)
        # part-normalized input has ~zero per-part mean
        for i in range(4):
            idx = item["ref_seg_mask"] == i
            if item["present"][i]:
                assert np.abs(item["input"][idx].mean(0)).max() < 0.2

    def test_loader_batches(self):
        ds = SyntheticPartDataset(npoints=128, size=10)
        dl = DataLoader(ds, batch_size=4, shuffle=True)
        batches = list(dl)
        assert len(batches) == 3
        assert batches[0]["input"].shape == (4, 128, 3)
        assert isinstance(batches[0]["token"], list)

    def test_prefetch_loader_matches_sync(self):
        """num_workers>0 prefetches in a background thread but must yield the
        exact same batch stream as the synchronous path (single producer
        preserves the dataset's sequential RNG order)."""
        sync = DataLoader(
            SyntheticPartDataset(npoints=64, size=10), batch_size=4, shuffle=True
        )
        pre = DataLoader(
            SyntheticPartDataset(npoints=64, size=10),
            batch_size=4, shuffle=True, num_workers=2,
        )
        sync.set_epoch(3)
        pre.set_epoch(3)
        for bs, bp in zip(list(sync), list(pre)):
            assert set(bs) == set(bp)
            for k in bs:
                if isinstance(bs[k], list):
                    assert bs[k] == bp[k]
                else:
                    np.testing.assert_array_equal(bs[k], bp[k])

    def test_prefetch_loader_early_break(self):
        """Breaking out mid-epoch must not wedge the producer thread, and the
        loader must be iterable again afterward."""
        dl = DataLoader(
            SyntheticPartDataset(npoints=64, size=20),
            batch_size=2, shuffle=False, num_workers=1, prefetch=1,
        )
        for i, _ in enumerate(dl):
            if i == 1:
                break
        assert len(list(dl)) == 10

    def test_prefetch_loader_propagates_errors(self):
        class Boom:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                if i >= 2:
                    raise RuntimeError("boom")
                return {"x": np.zeros(3, np.float32)}

        dl = DataLoader(Boom(), batch_size=2, shuffle=False, num_workers=1)
        import pytest

        with pytest.raises(RuntimeError, match="boom"):
            list(dl)

    def test_pc_norm_modes(self):
        pc = np.random.RandomState(0).randn(100, 3).astype(np.float32)
        for mode in ("shape_unit", "shape_canonical", "shape_bbox", "shape_canonical_bbox"):
            out, shift, scale = pc_norm(pc, mode)
            assert np.isfinite(out).all()
            np.testing.assert_allclose(out * scale + shift, pc, atol=1e-4)

    def test_part_presence_sampler(self):
        p = sample_part_presence(np.random.RandomState(0), 100)
        assert p.shape == (100, 4)
        assert (p[:, 0] == 1).mean() > 0.9  # seat almost always present

    def test_evaluate_gen_mode(self):
        """Full evaluate_batches dispatch in 'gen' mode on synthetic preds."""
        rng = np.random.RandomState(0)
        results = []
        for b in range(2):
            B, N = 3, 64
            results.append(
                {
                    "pred": rng.rand(B, N, 3).astype(np.float32),
                    "pred_seg_mask": rng.randint(0, 4, (B, N)),
                    "input_ref": rng.rand(B, N, 3).astype(np.float32),
                    "ref_seg_mask": rng.randint(0, 4, (B, N)),
                    "shift": np.zeros((B, 1, 3), np.float32),
                    "scale": np.ones((B, 1, 1), np.float32),
                }
            )
        save, metrics = evaluate_batches(
            results, save_num_batch=1, eval_mode="gen", batch_size=4
        )
        assert "1-NN-CD-acc" in metrics
        assert save["pred"].shape[0] == 3

    @pytest.mark.slow
    def test_evaluate_gen_part_mode(self, monkeypatch):
        """Whole-path dispatch of eval_mode='gen_part' (metrics/eval.py:
        799-815; reference shapenet_seg.py:375-388): compute_all_metrics +
        snapping + oracle snapping + presence-weighted part metrics + bbox
        chamfer metrics, all finite and sane on synthetic preds+masks."""
        monkeypatch.setenv("DIFFFACTO_EMD_ITERS", "16")  # sanity, not accuracy
        rng = np.random.RandomState(5)
        results = []
        # parts sized so part 0 passes the >100-point per-part threshold and
        # parts 1-3 are dropped by compute_part_metric (both branches run);
        # part clouds are always padded to 512 points, so every qualifying
        # part costs 512-pt EMD pairs — keep exactly one on the 1-core CPU
        part_sizes = [128, 96, 64, 32]
        N = sum(part_sizes)
        mask_row = np.concatenate(
            [np.full(s, i, np.int64) for i, s in enumerate(part_sizes)]
        )
        for b in range(2):
            B = 2
            base = rng.rand(B, N, 3).astype(np.float32)
            # separate the parts spatially so snapping/bbox stats are non-trivial
            offsets = np.array(
                [[0, 0, 0], [0, 1, 0], [1, 0, 0], [0, 0, 1]], np.float32
            )
            pred = base + offsets[mask_row][None]
            ref = rng.rand(B, N, 3).astype(np.float32) + offsets[mask_row][None]
            results.append(
                {
                    "pred": pred,
                    "pred_seg_mask": mask_row[None].repeat(B, 0),
                    "input_ref": ref,
                    "ref_seg_mask": mask_row[None].repeat(B, 0),
                    "present": np.ones((B, 4), np.float32),
                    "shift": np.zeros((B, 1, 3), np.float32),
                    "scale": np.ones((B, 1, 1), np.float32),
                }
            )
        save, metrics = evaluate_batches(
            results, save_num_batch=1, eval_mode="gen_part", batch_size=4
        )
        # full key families of the reference's part-aware eval
        for key in (
            "1-NN-CD-acc",
            "1-NN-EMD-acc",
            "lgan_mmd-CD",
            "lgan_cov-CD",
            "snapping_Chair_0",
            "oracle_snapping_Chair_0",
            "part_weighted_1-NN-CD-acc",
            "part_weighted_lgan_mmd-CD",
            "bbox_lgan_mmd-bbox_chamfer",
            "bbox_1-NN-bbox_chamfer-acc",
        ):
            assert key in metrics, f"missing {key}: {sorted(metrics)}"
            assert np.isfinite(metrics[key]), f"non-finite {key}"
        # accuracies are probabilities
        for k, v in metrics.items():
            if k.endswith("acc"):
                assert 0.0 <= v <= 1.0, (k, v)
        assert save["pred"].shape[0] == 2

    def test_snapping_metric(self):
        rng = np.random.RandomState(0)
        preds = rng.rand(2, 128, 3).astype(np.float32)
        masks = np.repeat(np.arange(4), 32)[None].repeat(2, 0)
        m = compute_snapping_metric(preds, masks, cls="Chair")
        assert all(np.isfinite(v) for v in m.values())


class TestSeparatePointCloud:
    def test_partition(self):
        import jax
        from difffacto_tpu.data import separate_point_cloud

        rng = np.random.RandomState(7)
        xyz = jnp.asarray(rng.randn(3, 64, 3), jnp.float32)
        inp, crop = separate_point_cloud(xyz, 64, 16, rng=jax.random.PRNGKey(1))
        assert inp.shape == (3, 48, 3) and crop.shape == (3, 16, 3)
        # the two halves partition the original point set exactly
        for b in range(3):
            got = np.concatenate([np.asarray(inp[b]), np.asarray(crop[b])])
            want = np.asarray(xyz[b])
            got = got[np.lexsort(got.T)]
            want = want[np.lexsort(want.T)]
            np.testing.assert_allclose(got, want, atol=1e-6)

    def test_crop_is_a_neighborhood(self):
        """Every cropped point is nearer the chosen direction than every
        kept point (the reference crops the nearest num_crop points)."""
        import jax
        from difffacto_tpu.data import separate_point_cloud

        rng = np.random.RandomState(8)
        xyz = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
        center = np.array([1.0, 0.0, 0.0], np.float32)
        inp, crop = separate_point_cloud(
            xyz, 64, 16, fixed_points=center, rng=jax.random.PRNGKey(2)
        )
        for b in range(2):
            d_crop = np.linalg.norm(np.asarray(crop[b]) - center, axis=-1)
            d_keep = np.linalg.norm(np.asarray(inp[b]) - center, axis=-1)
            assert d_crop.max() <= d_keep.min() + 1e-5

    def test_padding_zeros(self):
        import jax
        from difffacto_tpu.data import separate_point_cloud

        rng = np.random.RandomState(9)
        xyz = jnp.asarray(rng.randn(2, 64, 3) + 5.0, jnp.float32)
        inp, crop = separate_point_cloud(
            xyz, 64, 16, padding_zeros=True, rng=jax.random.PRNGKey(3)
        )
        assert inp.shape == (2, 64, 3)
        zeroed = (np.asarray(inp) == 0).all(-1).sum(-1)
        np.testing.assert_array_equal(zeroed, [16, 16])

    def test_cropping_loader(self):
        import jax
        from difffacto_tpu.data import CroppingDataLoader, DataLoader
        from difffacto_tpu.data.synthetic import SyntheticPartDataset

        ds = SyntheticPartDataset(size=4, npoints=64)
        loader = CroppingDataLoader(DataLoader(ds, batch_size=2), crop=16)
        batch = next(iter(loader))
        assert batch["partial"].shape == (2, 48, 3)
        assert batch["missing"].shape == (2, 16, 3)


def test_partglot_triplet_roundtrip(tmp_path):
    """pack_partglot.py output loads through the PartglotTriplet dataset."""
    import os
    import pickle
    import subprocess
    import sys as _sys

    h5py = pytest.importorskip("h5py")
    rng = np.random.RandomState(0)
    S, n_seg, npt = 6, 5, 16
    with h5py.File(tmp_path / "segs.h5", "w") as f:
        f["data"] = rng.randn(S, n_seg, npt, 3).astype(np.float32)
        f["mask"] = np.ones((S, n_seg), np.float32)
    game = {
        "text": [["a", "chair", "with", "thick", "legs"], ["tall", "back"]],
        "target_chair": [0, 1],
        "chair_a": [0, 1], "chair_b": [3, 4], "chair_c": [1, 2],
    }
    with open(tmp_path / "game.pkl", "wb") as f:
        pickle.dump((game, {"a": 2, "chair": 3, "legs": 4, "back": 5},
                     None, None, None, None), f)
    out = subprocess.run(
        [_sys.executable, "tools/pack_partglot.py",
         "--game-data", str(tmp_path / "game.pkl"),
         "--h5", str(tmp_path / "segs.h5"),
         "--output", str(tmp_path / "packed.npz"), "--part-only"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    from difffacto_tpu.utils.registry import DATASETS, build_from_cfg

    loader, _ = build_from_cfg(
        dict(type="PartglotTriplet", batch_size=2, path=str(tmp_path / "packed.npz")),
        DATASETS,
    )
    batch = next(iter(loader))
    assert batch["gt_geos"].shape == (2, n_seg, npt, 3)
    assert batch["text"].shape[0] == 2 and batch["part_indicator"].shape == (2, 4)


def test_metrics_registry_objects():
    """METRICS-registry components (reference metrics/common.py,
    chamfer_dist/__init__.py, emd_module.py) build from config and compute."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from difffacto_tpu.utils.registry import METRICS, build_from_cfg

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
    b = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)

    cd2 = build_from_cfg(dict(type="ChamferDistanceL2"), METRICS)
    cd1 = build_from_cfg(dict(type="ChamferDistanceL1"), METRICS)
    cds = build_from_cfg(dict(type="ChamferDistanceL2_split"), METRICS)
    assert float(cd2(a, b)) > 0 and float(cd1(a, b)) > 0
    d1, d2 = cds(a, b)
    np.testing.assert_allclose(float(d1) + float(d2), float(cd2(a, b)), rtol=1e-5)

    emd = build_from_cfg(dict(type="EMD", eps=0.01, iters=50, dist_only=True), METRICS)
    assert emd(a, b).shape == (2,)

    sce = build_from_cfg(dict(type="SmoothCrossEntropy"), METRICS)
    logits = jnp.asarray(rng.randn(8, 5), jnp.float32)
    targets = jnp.asarray(rng.randint(0, 5, 8))
    assert float(sce(logits, targets)) > 0

    l2 = build_from_cfg(dict(type="L2Loss"), METRICS)
    np.testing.assert_allclose(float(l2(a, b)), float(((a - b) ** 2).mean()), rtol=1e-6)

    ngl = build_from_cfg(dict(type="NegativeGaussianLogLikelihood"), METRICS)
    assert np.isfinite(float(ngl(a, b, 1.0)))

    scl = build_from_cfg(dict(type="SpectralContrastiveLoss"), METRICS)
    trip = jnp.asarray(rng.randn(4, 3, 16), jnp.float32)
    assert np.isfinite(float(scl(trip)))


def test_shapenet55_completion_loader(tmp_path):
    """ShapeNet completion loader (shapenet55.py:12-40): list file + npy
    clouds -> cropped partial/missing batches."""
    import numpy as np

    from difffacto_tpu.utils.registry import DATASETS, build_from_cfg

    root = tmp_path / "ShapeNet55"
    pc_dir = tmp_path / "shapenet_pc"
    root.mkdir(); pc_dir.mkdir()
    rng = np.random.RandomState(0)
    names = []
    for i in range(4):
        nm = f"02691156-model{i}.npy"
        np.save(pc_dir / nm, rng.randn(300, 3).astype(np.float32))
        names.append(nm)
    (root / "train.txt").write_text("\n".join(names))

    loader, _ = build_from_cfg(
        dict(type="ShapeNet", batch_size=2, root=str(root), npoints=128,
             split="train", mode="median"),
        DATASETS,
    )
    batch = next(iter(loader))
    assert batch["input"].shape == (2, 128, 3)
    assert "partial" in batch and "missing" in batch


def test_shapenet55_category_filter(tmp_path):
    """cats= filters the file list by taxonomy id (shapenet55.py:64-73);
    unknown category names assert."""
    import numpy as np
    import pytest

    from difffacto_tpu.data.custom import _ShapeNet55

    root = tmp_path / "ShapeNet55"
    pc_dir = tmp_path / "shapenet_pc"
    root.mkdir(); pc_dir.mkdir()
    rng = np.random.RandomState(0)
    names = []
    for tax, n in (("02691156", 3), ("03001627", 2)):  # airplane, chair
        for i in range(n):
            nm = f"{tax}-model{i}.npy"
            np.save(pc_dir / nm, rng.randn(300, 3).astype(np.float32))
            names.append(nm)
    (root / "train.txt").write_text("\n".join(names))

    assert len(_ShapeNet55(str(root), 128, "train").files) == 5
    assert len(_ShapeNet55(str(root), 128, "train", cats=("chair",)).files) == 2
    assert (
        len(_ShapeNet55(str(root), 128, "train", cats=("airplane", "chair")).files)
        == 5
    )
    with pytest.raises(AssertionError, match="Unknown category"):
        _ShapeNet55(str(root), 128, "train", cats=("spaceship",))
