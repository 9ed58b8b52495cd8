"""Golden parity of the DATA layer against the reference's OWN dataset code.

tests/test_shapenet_format.py proves our loader reads the real on-disk
ShapeNet-Part format; this file goes further and drives the REFERENCE'S
``_ShapeNetSegParts`` / ``_ShapeNetSeg`` classes
(/root/reference/python/difffacto/datasets/shapenet_seg.py:72-543) over the
same synthetic tree, with both sides fed an identical per-item RandomState,
and asserts item-level equality of every returned tensor — resampling,
pc_norm modes, per-part canonical normalization, straggler relabeling,
presence flags, and the channel layout deltas.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_reference_parity import _install_reference  # noqa: E402
from test_shapenet_format import STRAGGLER_TOKEN, build_shapenet_tree  # noqa: E402

REF_ROOT = "/root/reference/python"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not present"
)

NPOINTS = 200


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return build_shapenet_tree(tmp_path_factory.mktemp("ref_parity_shapenet"))


class _SharedDraws:
    """Route the reference's module-level ``np.random.choice``/``rand`` calls
    through the same RandomState our dataset consumes, one fresh state per
    item (the reference draws an extra rand(K) for part dropout that ours
    gates on dropout_part>0, so streams are only prefix-aligned)."""

    def __init__(self, seed):
        self.ref = np.random.RandomState(seed)
        self.ours = np.random.RandomState(seed)

    def __enter__(self):
        self._saved = (np.random.choice, np.random.rand)
        np.random.choice = self.ref.choice
        np.random.rand = self.ref.rand
        return self

    def __exit__(self, *exc):
        np.random.choice, np.random.rand = self._saved


def _compare_items(ritem, jitem, part_cf=True):
    np.testing.assert_array_equal(
        np.asarray(ritem["seg_mask"]), jitem["seg_mask"], err_msg="seg_mask"
    )
    np.testing.assert_array_equal(
        np.asarray(ritem["ref_seg_mask"]), jitem["ref_seg_mask"]
    )
    np.testing.assert_array_equal(
        ritem["attn_map"].numpy(), jitem["attn_map"], err_msg="attn_map"
    )
    np.testing.assert_array_equal(
        np.asarray(ritem["present"]), jitem["present"], err_msg="present"
    )
    if "dp_present" in ritem:
        np.testing.assert_array_equal(
            np.asarray(ritem["dp_present"]), jitem["dp_present"]
        )
    for key in ("input", "ref", "shift", "scale"):
        np.testing.assert_allclose(
            np.asarray(torch.as_tensor(ritem[key])),
            np.asarray(jitem[key], np.float32).reshape(
                np.asarray(ritem[key]).shape
            ),
            atol=2e-6,
            err_msg=key,
        )
    for key in ("part_shift", "part_scale"):
        rv = np.asarray(torch.as_tensor(ritem[key]), np.float32)
        jv = np.asarray(jitem[key], np.float32)
        np.testing.assert_allclose(
            rv, jv.T if part_cf else jv, atol=2e-6, err_msg=key
        )
    assert ritem["token"] == jitem["token"]


@pytest.mark.parametrize(
    "scale_mode,part_scale_mode,clip",
    [
        ("shape_unit", "shape_canonical", False),  # every shipped config
        ("shape_bbox", "shape_canonical_bbox", True),
    ],
)
def test_shapenet_seg_part_getitem_parity(tree, scale_mode, part_scale_mode, clip):
    """Reference ``_ShapeNetSegParts.__getitem__`` (shapenet_seg.py:436-543)
    vs our ``ShapeNetSegPartDataset``: identical resample indices -> equal
    seg relabeling (the straggler shape's 5-point part), presence flags,
    per-part canonical normalization, and shift/scale bookkeeping."""
    _install_reference()
    from difffacto.datasets.shapenet_seg import _ShapeNetSegParts

    from difffacto_tpu.data.shapenet_seg import ShapeNetSegPartDataset

    ref_ds = _ShapeNetSegParts(
        root=tree, npoints=NPOINTS, split="train", class_choice="Chair",
        scale_mode=scale_mode, part_scale_mode=part_scale_mode, clip=clip,
    )
    our_ds = ShapeNetSegPartDataset(
        tree, NPOINTS, "train", class_choice="Chair", scale_mode=scale_mode,
        part_scale_mode=part_scale_mode, clip=clip,
    )
    assert len(ref_ds) == len(our_ds) == 3
    # identical file enumeration order (sorted dir listing ∩ split tokens)
    assert [os.path.splitext(os.path.basename(fn))[0] for _, fn in ref_ds.datapath] \
        == list(our_ds.tokens)

    relabeled = 0
    for i in range(len(ref_ds)):
        draws = _SharedDraws(100 + i)
        with draws:
            ritem = ref_ds[i]
        our_ds._rng = draws.ours
        jitem = our_ds[i]
        _compare_items(ritem, jitem, part_cf=True)
        if our_ds.tokens[i] == STRAGGLER_TOKEN:
            # the 5-point part must have been relabeled away on BOTH sides
            assert not (np.asarray(jitem["seg_mask"]) == 3).any()
            assert float(jitem["present"][3]) == 0.0
            relabeled += 1
    assert relabeled == 1


def test_shapenet_seg_getitem_parity(tree):
    """Reference whole-shape ``_ShapeNetSeg.__getitem__``
    (shapenet_seg.py:207-286) vs our ShapeNetSeg dataset: input == ref,
    part stats are raw mean/std (torch unbiased std), ANY-point presence,
    no straggler relabeling."""
    _install_reference()
    from difffacto.datasets.shapenet_seg import _ShapeNetSeg

    from difffacto_tpu.data.shapenet_seg import ShapeNetSegDataset

    ref_ds = _ShapeNetSeg(
        root=tree, npoints=NPOINTS, split="train", class_choice="Chair",
        scale_mode="shape_unit",
    )
    our_ds = ShapeNetSegDataset(
        tree, NPOINTS, "train", class_choice="Chair", scale_mode="shape_unit"
    )
    assert len(ref_ds) == len(our_ds) == 3
    for i in range(len(ref_ds)):
        draws = _SharedDraws(200 + i)
        with draws:
            ritem = ref_ds[i]
        our_ds._rng = draws.ours
        jitem = our_ds[i]
        np.testing.assert_allclose(
            np.asarray(jitem["input"]), jitem["ref"], atol=0
        )  # whole-shape: input IS ref
        _compare_items(ritem, jitem, part_cf=True)
        if our_ds.tokens[i] == STRAGGLER_TOKEN:
            # NO relabel in the whole-shape variant: label 3 survives and
            # its 5 points still count as present
            assert (np.asarray(jitem["seg_mask"]) == 3).sum() > 0 or float(
                jitem["present"][3]
            ) in (0.0, 1.0)
            np.testing.assert_array_equal(
                np.asarray(ritem["present"]), jitem["present"]
            )


def test_custom_dataset_getitem_parity(tmp_path):
    """Reference ``CustomDataset.__getitem__`` (datasets/custom.py:40-92)
    vs ours over the same synthesized-dump pickle with shared RNG: the
    per-part canonical normalization, >=10 threshold, std==0 presence, and
    straggler relabeling all reproduce index-exactly."""
    import pickle

    _install_reference()
    from difffacto.datasets.custom import CustomDataset as RefCustom

    from difffacto_tpu.data.custom import CustomDatasetImpl

    rng = np.random.RandomState(40)
    S, NRAW = 3, 400
    seg = rng.randint(0, 4, (S, NRAW))
    seg[1, :12] = 3  # one part hovering near the 10-point threshold
    data = {
        "pred": rng.randn(S, NRAW, 3).astype(np.float32) * 0.3,
        "pred_seg_mask": seg,
    }
    p = str(tmp_path / "dump.pkl")
    with open(p, "wb") as f:
        pickle.dump(data, f)

    ref_ds = RefCustom(data_dir=p, npoints=NPOINTS, scale_mode="shape_unit",
                       part_scale_mode="shape_canonical", clip=True)
    our_ds = CustomDatasetImpl(p, npoints=NPOINTS, scale_mode="shape_unit",
                               part_scale_mode="shape_canonical", clip=True)
    assert len(ref_ds) == len(our_ds) == S
    for i in range(S):
        draws = _SharedDraws(300 + i)
        with draws:
            ritem = ref_ds[i]
        our_ds._rng = draws.ours
        jitem = our_ds[i]
        np.testing.assert_array_equal(
            np.asarray(ritem["seg_mask"]), jitem["seg_mask"], err_msg="seg_mask"
        )
        np.testing.assert_allclose(
            np.asarray(ritem["input"]), jitem["input"], atol=2e-6, err_msg="input"
        )
        for key in ("shift", "scale"):
            np.testing.assert_allclose(
                np.asarray(ritem[key]), jitem[key], atol=2e-6, err_msg=key
            )


def _supseg_tree(root, S=6, N=64, K=4, seed=50):
    """Write the reference two-pickle super-segment layout."""
    import pickle

    rng = np.random.RandomState(seed)
    pts = rng.randn(S, N, 3).astype(np.float32) * 0.4
    attn = rng.rand(S, N, K).astype(np.float32)
    with open(root / "shapenet_pointcloud_pn_aware.pkl", "wb") as f:
        pickle.dump(pts, f)
    with open(root / "shapenet_label_pn_aware.pkl", "wb") as f:
        pickle.dump(attn, f)
    return str(root)


@pytest.mark.parametrize("split,normalize_attn", [("train", False), ("test", True)])
def test_supseg_getitem_parity(tmp_path, split, normalize_attn):
    """Reference ``_ShapeNetSegSuperSegment`` deterministic path
    (shapenet_sup_seg.py:26-143) vs ours: stats-fed pc_norm, 80/20 split,
    attn softmax, seg argmax, part stats and the global_anchor_mean key."""
    _install_reference()
    from difffacto.datasets.shapenet_sup_seg import _ShapeNetSegSuperSegment

    from difffacto_tpu.data.custom import SupSegDataset

    root = _supseg_tree(tmp_path)
    kw = dict(split=split, part="pn_aware", scale_mode="shape_unit", n_class=4,
              normalize_attn=normalize_attn)
    ref_ds = _ShapeNetSegSuperSegment(root, **kw)
    our_ds = SupSegDataset(root, **kw)
    assert len(ref_ds) == len(our_ds)
    np.testing.assert_allclose(
        ref_ds.stats["part_means"], our_ds.stats["part_means"], atol=1e-6
    )
    for i in range(len(ref_ds)):
        ritem = ref_ds[i]
        jitem = our_ds[i]
        for key in ("input", "ref", "attn_map", "shift", "scale",
                    "part_scale", "part_shift", "global_anchor_mean"):
            np.testing.assert_allclose(
                np.asarray(torch.as_tensor(ritem[key])), np.asarray(jitem[key]),
                atol=3e-6, err_msg=key,
            )
        np.testing.assert_array_equal(
            np.asarray(ritem["seg_mask"]), jitem["seg_mask"]
        )


def test_reference_supseg_contrastive_branch_broken_pinned(tmp_path):
    """Pin shapenet_sup_seg.py:113-118: the contrastive branch assigns
    ``pos_input = augment(...)`` — the TUPLE, which torch.stack rejects —
    and leaves pos_input undefined when the augment_prob draw fails. Ours
    implements the evident intent (augmented positive, plain fallback)."""
    import random

    _install_reference()
    from difffacto.datasets.shapenet_sup_seg import _ShapeNetSegSuperSegment

    root = _supseg_tree(tmp_path)
    ref_ds = _ShapeNetSegSuperSegment(
        root, split="train", contrastive_learning=True, augment_prob=1.0
    )
    random.seed(0)
    with pytest.raises(TypeError):
        ref_ds[0]  # torch.stack over [tensor, tuple, tensor]
    ref_ds.augment_prob = -1.0  # force the no-augment path: pos_input unbound
    with pytest.raises(UnboundLocalError):
        ref_ds[0]


def _partglot_tree(root, S=5, NSEG=6, NPT=16, K=4, seed=60):
    import pickle

    rng = np.random.RandomState(seed)
    data = {
        "geos": rng.randn(S, NSEG, NPT, 3).astype(np.float32) * 0.4,
        "geos_masks": (rng.rand(S, NSEG) > 0.3).astype(np.float32),
        "attn_maps": rng.rand(S, K, NSEG).astype(np.float32),
    }
    with open(root / "partglot_shapenet_seg_out_pn_aware_raw.pkl", "wb") as f:
        pickle.dump(data, f)
    return str(root)


def test_supseg_partglot_getitem_parity_and_defects(tmp_path):
    """Reference ``_ShapeNetSegSuperSegmentPartglot`` (first access per
    index) vs ours, plus two pinned reference defects: in-place cache
    mutation makes a SECOND access re-normalize already-normalized data
    (shapenet_sup_seg_partglot.py:55-56), and the 80/20 split forgets to
    slice geo_mask (:37-42)."""
    _install_reference()
    from difffacto.datasets.shapenet_sup_seg_partglot import (
        _ShapeNetSegSuperSegmentPartglot,
    )

    from difffacto_tpu.data.custom import SupSegPartglotDataset

    root = _partglot_tree(tmp_path)
    ref_ds = _ShapeNetSegSuperSegmentPartglot(root, split="all")
    our_ds = SupSegPartglotDataset(root, split="all")
    assert len(ref_ds) == len(our_ds)
    first = {}
    for i in range(len(ref_ds)):
        ritem = ref_ds[i]
        jitem = our_ds[i]
        for key in ("input", "ref", "geo_mask", "attn_map", "shift", "scale"):
            np.testing.assert_allclose(
                np.asarray(torch.as_tensor(ritem[key])), np.asarray(jitem[key]),
                atol=3e-6, err_msg=key,
            )
        np.testing.assert_array_equal(np.asarray(ritem["seg_mask"]), jitem["seg_mask"])
        first[i] = np.asarray(torch.as_tensor(ritem["input"])).copy()

    # defect 1: the reference's second access re-normalizes the cache; ours
    # is idempotent
    again = np.asarray(torch.as_tensor(ref_ds[0]["input"]))
    assert not np.allclose(again, first[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(our_ds[0]["input"]), first[0], atol=3e-6)

    # defect 2: the reference test split keeps the FULL-length geo_mask
    ref_test = _ShapeNetSegSuperSegmentPartglot(root, split="test")
    assert len(ref_test.geo_mask) != len(ref_test.segs_data)
    our_test = SupSegPartglotDataset(root, split="test")
    assert len(our_test.geo_mask) == len(our_test.segs_data)


def test_shapenet_parts_getitem_parity(tmp_path):
    """Reference ``ShapeNetParts.__getitem__`` (shapenet_parts.py:34-66) vs
    ours over the same torch-saved tensor with shared RNG — incl. the
    identity normalization of the default scale_mode=None."""
    _install_reference()
    from difffacto.datasets.shapenet_parts import ShapeNetParts as RefParts

    from difffacto_tpu.data.custom import ShapeNetPartsDataset

    rng = np.random.RandomState(70)
    pts = rng.randn(4, 300, 3).astype(np.float32)
    p = str(tmp_path / "parts.pt")
    torch.save(torch.from_numpy(pts), p)

    for scale_mode in (None, "shape_unit"):
        ref_ds = RefParts(root=p, npoints=NPOINTS, scale_mode=scale_mode)
        our_ds = ShapeNetPartsDataset(p, npoints=NPOINTS, scale_mode=scale_mode)
        assert len(ref_ds) == len(our_ds) == 4
        for i in range(4):
            draws = _SharedDraws(400 + i)
            with draws:
                ritem = ref_ds[i]
            our_ds._rng = draws.ours
            jitem = our_ds[i]
            np.testing.assert_allclose(
                np.asarray(ritem["input"]), jitem["input"], atol=2e-6
            )
            for key in ("shift", "scale"):
                np.testing.assert_allclose(
                    np.asarray(ritem[key]), jitem[key], atol=2e-6, err_msg=key
                )
            if scale_mode is None:  # identity norm: input IS the raw sample
                assert np.abs(jitem["shift"]).max() == 0.0
                assert (jitem["scale"] == 1.0).all()


def test_shapenet55_getitem_parity(tmp_path):
    """Reference ``_ShapeNet``'s item (shapenet55.py:42-93) vs ours over the
    same on-disk tree — incl. the DETERMINISTIC fixed-RandomState(2020)
    subsample (misc.py:137-143 filter_points)."""
    _install_reference()
    from difffacto.datasets.shapenet55 import _ShapeNet

    from difffacto_tpu.data.custom import _ShapeNet55

    root = tmp_path / "ShapeNet55"
    (root).mkdir()
    (tmp_path / "shapenet_pc").mkdir()
    rng = np.random.RandomState(80)
    names = ["03001627-chairA.npy", "03001627-chairB.npy", "02691156-planeA.npy"]
    for i, n in enumerate(names):
        np.save(tmp_path / "shapenet_pc" / n,
                rng.randn(500 + 100 * i, 3).astype(np.float32))
    with open(root / "train.txt", "w") as f:
        f.write("\n".join(names) + "\n")

    ref_ds = _ShapeNet(str(root), NPOINTS, "train", scale_mode="shape_unit",
                       cats=["chair"])
    our_ds = _ShapeNet55(str(root), NPOINTS, "train", scale_mode="shape_unit",
                         cats=("chair",))
    assert len(ref_ds) == len(our_ds) == 2  # the airplane is filtered out
    for i in range(2):
        ritem = ref_ds[i]
        jitem = our_ds[i]
        np.testing.assert_allclose(
            np.asarray(ritem["pointcloud"]), jitem["input"], atol=2e-6
        )
        for key in ("shift", "scale"):
            np.testing.assert_allclose(
                np.asarray(ritem[key]), jitem[key], atol=2e-6, err_msg=key
            )


def _write_partnet_tree(root, S=2, NRAW=200, K=4, seed=90):
    """Minimal coalace-format tree: <cat_id>/<token>.ply + .labels +
    train_test_split jsons (partnet_dataset.py:78-117)."""
    import json

    rng = np.random.RandomState(seed)
    cat = root / "03001627"
    cat.mkdir(parents=True)
    (root / "train_test_split").mkdir()
    tokens = [f"partnet{i:04d}tok" for i in range(S)]
    for tok in tokens:
        pts = rng.randn(NRAW, 3).astype(np.float32) * 0.4
        with open(cat / f"{tok}.ply", "w") as f:
            f.write(
                "ply\nformat ascii 1.0\n"
                f"element vertex {NRAW}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n"
            )
            for p in pts:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")
        # the loader enumerates *ori.ply / *ori.labels pairs
        (cat / f"{tok}.ply").rename(cat / f"{tok}_ori.ply")
        labels = rng.randint(1, K + 1, NRAW)
        np.savetxt(cat / f"{tok}_ori.labels", labels, fmt="%d")
    for name, toks in (
        ("shuffled_train_file_list.json", [f"shape_data/03001627/{t}" for t in tokens]),
        ("shuffled_val_file_list.json", []),
        ("shuffled_test_file_list.json", []),
    ):
        with open(root / "train_test_split" / name, "w") as f:
            json.dump(toks, f)
    return str(root)


def _install_mini_plydata():
    """The environment lacks plyfile (stubbed to None by _install_reference);
    give the already-imported reference module a WORKING ascii reader so
    _Partnet can execute."""
    import difffacto.datasets.dataset_utils as rdu

    class _MiniPly:
        def __init__(self, pts):
            self._v = {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]}

        def __getitem__(self, key):
            assert key == "vertex"
            return self._v

        @staticmethod
        def read(path):
            with open(path) as f:
                lines = f.read().splitlines()
            n = int(next(l for l in lines if l.startswith("element vertex")).split()[-1])
            start = lines.index("end_header") + 1
            pts = np.asarray(
                [list(map(float, l.split())) for l in lines[start : start + n]],
                np.float32,
            )
            return _MiniPly(pts)

    rdu.PlyData = _MiniPly


def test_reference_partnet_defects_pinned(tmp_path):
    """Execute the reference ``_Partnet`` (partnet_dataset.py:39-220) over a
    format-faithful miniature tree (ascii .ply via a mini reader — the real
    plyfile is absent) and pin three defects: (1) ``mask_chosen =
    valid_seg[choice]`` indexes the WHOLE cloud's labels with part-local
    indices, so the returned per-part seg_mask rows carry labels from other
    parts; (2) a part smaller than part_npoints leaves mask_chosen unbound /
    mis-shaped (UnboundLocalError or broadcast ValueError); (3) the
    ``augment`` branch references an undefined ``ori_out`` (NameError)."""
    _install_reference()
    _install_mini_plydata()
    from difffacto.datasets.partnet_dataset import _Partnet

    root = _write_partnet_tree(tmp_path / "partnet")
    ds = _Partnet(root=root, npoints=64, part_npoints=16, split="train",
                  n_part=4, class_choice="Chair", scale_mode="shape_bbox",
                  part_scale_mode="shape_canonical")
    assert len(ds) == 2

    np.random.seed(0)
    item = ds[0]
    # defect 1: out_mask row i should be all-i; the bug mixes in other labels
    out_mask = np.asarray(item["seg_mask"])  # (K, part_npoints)
    assert any(
        (out_mask[i] != i).any() and np.asarray(item["present"])[i] == 1
        for i in range(4)
    )

    # defect 2: a sub-part_npoints part crashes
    small = _Partnet(root=root, npoints=64, part_npoints=190, split="train",
                     n_part=4, class_choice="Chair", scale_mode="shape_bbox",
                     part_scale_mode="shape_canonical")
    with pytest.raises((UnboundLocalError, ValueError)):
        small[0]

    # defect 3: augment path references undefined ori_out
    ds.augment = True
    with pytest.raises(NameError):
        ds[1]


def test_reference_shapenet_seg_cache_unpack_defect_pinned(tree):
    """Pin a reference defect: ``_ShapeNetSeg.__getitem__`` caches a 4-tuple
    (shapenet_seg.py:230) but unpacks only 3 names on a cache hit
    (shapenet_seg.py:209), so any SECOND access to the same index raises
    ValueError. Our loader has no such cache trap. If a fixed reference
    lands, this fails and repeat-access behavior should be cross-checked."""
    _install_reference()
    from difffacto.datasets.shapenet_seg import _ShapeNetSeg

    ref_ds = _ShapeNetSeg(
        root=tree, npoints=NPOINTS, split="train", class_choice="Chair",
        scale_mode="shape_unit",
    )
    _ = ref_ds[0]
    with pytest.raises(ValueError):
        ref_ds[0]
