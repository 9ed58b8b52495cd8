"""Real ShapeNet-Part on-disk format, end to end.

A format-faithful miniature of the real directory tree — ``<synset>/<id>.txt``
files with (N, 7) whitespace rows (xyz, normal, float seg label) plus
``train_test_split/shuffled_*_file_list.json`` with ``shape_data/<synset>/<id>``
entries — is generated into tmp and driven through the REAL loading path:
``_load_split_tokens`` -> ``fast_loadtxt`` -> npz pack -> straggler relabel ->
one train step.  (reference: datasets/shapenet_seg.py:120-160 split parsing,
:441-456 loadtxt layout, :487-494 straggler relabel)
"""

import json
import os

import numpy as np
import jax
import pytest

from difffacto_tpu.data.shapenet_seg import (
    ShapeNetSegPart,
    ShapeNetSegPartDataset,
    _load_split_tokens,
)

SYNSET = "03001627"  # Chair
DECOY_SYNSET = "02691156"  # Airplane — must be ignored for class_choice=Chair
N_RAW = 320  # raw points per shape (real files carry ~2.5k; format-identical)
STRAGGLER_TOKEN = "b2c1straggler"
STRAGGLER_PART = 3  # label 15 in the file; only 5 raw points


def _shape_rows(rng, counts):
    """(N, 7) rows: 4 part clusters at distinct centers + unit normals +
    the raw ShapeNet-Part labels 12..15 stored as floats."""
    rows = []
    centers = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float64)
    for part, cnt in enumerate(counts):
        xyz = rng.randn(cnt, 3) * 0.15 + centers[part]
        nrm = rng.randn(cnt, 3)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        lab = np.full((cnt, 1), 12.0 + part)
        rows.append(np.concatenate([xyz, nrm, lab], axis=1))
    out = np.concatenate(rows)
    rng.shuffle(out)
    return out


def build_shapenet_tree(root):
    """Write the format-faithful miniature tree under ``root`` (a pathlib
    dir). Shared with tests/test_reference_parity_data.py, which drives the
    REFERENCE dataset class over the same files."""
    rng = np.random.RandomState(7)
    per_part = N_RAW // 4
    shapes = {
        "a1f2deadbeef00": [per_part] * 4,
        STRAGGLER_TOKEN: [105, 105, 105, 5],  # part 15: <10 pts -> relabel
        "c3e4cafe1234aa": [per_part] * 4,
        "d5a6val9876bb": [per_part] * 4,
        "e7b8testccdd": [per_part] * 4,
    }
    cat = root / SYNSET
    cat.mkdir()
    for tok, counts in shapes.items():
        rows = _shape_rows(rng, counts)
        with open(cat / f"{tok}.txt", "w") as f:
            for r in rows:
                f.write(" ".join(f"{v:.6f}" for v in r) + "\n")
    # decoy category: same format, different synset — must not leak into Chair
    decoy = root / DECOY_SYNSET
    decoy.mkdir()
    with open(decoy / "f9c0decoy.txt", "w") as f:
        for r in _shape_rows(np.random.RandomState(8), [per_part] * 4):
            f.write(" ".join(f"{v:.6f}" for v in r) + "\n")

    split_dir = root / "train_test_split"
    split_dir.mkdir()
    entries = {
        "train": ["a1f2deadbeef00", STRAGGLER_TOKEN, "c3e4cafe1234aa", "f9c0decoy"],
        "val": ["d5a6val9876bb"],
        "test": ["e7b8testccdd"],
    }
    for split, toks in entries.items():
        syn = {"f9c0decoy": DECOY_SYNSET}
        with open(split_dir / f"shuffled_{split}_file_list.json", "w") as f:
            json.dump([f"shape_data/{syn.get(t, SYNSET)}/{t}" for t in toks], f)
    return str(root)


@pytest.fixture(scope="module")
def shapenet_tree(tmp_path_factory):
    return build_shapenet_tree(tmp_path_factory.mktemp("shapenet_part"))


def test_split_tokens(shapenet_tree):
    assert _load_split_tokens(shapenet_tree, "val") == {"d5a6val9876bb"}
    trainval = _load_split_tokens(shapenet_tree, "trainval")
    assert "e7b8testccdd" not in trainval and STRAGGLER_TOKEN in trainval


def test_load_filter_and_pack_roundtrip(shapenet_tree):
    ds = ShapeNetSegPartDataset(shapenet_tree, npoints=64, split="train")
    # decoy synset and val/test tokens excluded; sorted token order
    assert ds.tokens == sorted(["a1f2deadbeef00", STRAGGLER_TOKEN, "c3e4cafe1234aa"])
    assert all(len(p) >= N_RAW for p in ds._points)
    # labels rebased 12..15 -> 0..3
    assert set(np.unique(np.concatenate(ds._segs))) <= {0, 1, 2, 3}

    # the one-time pack was written and reloads bit-identically
    pack = ds._pack_path()
    assert os.path.exists(pack)
    ds2 = ShapeNetSegPartDataset(shapenet_tree, npoints=64, split="train")
    assert ds2.tokens == ds.tokens
    for p1, p2 in zip(ds._points, ds2._points):
        np.testing.assert_array_equal(p1, p2)
    for s1, s2 in zip(ds._segs, ds2._segs):
        np.testing.assert_array_equal(s1, s2)


def test_matches_numpy_loadtxt(shapenet_tree):
    """The native txt parser agrees with np.loadtxt on a real-format file."""
    from difffacto_tpu.native import fast_loadtxt

    path = os.path.join(shapenet_tree, SYNSET, f"{STRAGGLER_TOKEN}.txt")
    np.testing.assert_allclose(
        fast_loadtxt(path), np.loadtxt(path).astype(np.float32), rtol=1e-6
    )


def test_straggler_relabel(shapenet_tree):
    """A <10-point sampled part must be relabeled to nearest neighbors:
    no output label may have a count in [1, 10) (shapenet_seg.py:487-494)."""
    ds = ShapeNetSegPartDataset(shapenet_tree, npoints=N_RAW, split="train", seed=3)
    idx = ds.tokens.index(STRAGGLER_TOKEN)
    item = ds[idx]
    counts = np.bincount(item["seg_mask"], minlength=4)
    for c in counts:
        assert c == 0 or c >= 10, counts
    # with 5/320 raw points the sampled straggler count lands in [1, 10)
    # and is relabeled AWAY (>=10 draws of 5 fixed indices is ~impossible)
    assert counts[STRAGGLER_PART] == 0, counts
    # relabeling was not vacuous: the raw file does carry part-15 points
    assert int((ds._segs[idx] == STRAGGLER_PART).sum()) == 5
    # present mask agrees with the relabeled segmentation
    assert item["present"][STRAGGLER_PART] == 0.0
    assert item["present"][:3].sum() == 3.0


def test_item_semantics(shapenet_tree):
    ds = ShapeNetSegPartDataset(shapenet_tree, npoints=64, split="train")
    item = ds[0]
    assert item["input"].shape == (64, 3) and item["ref"].shape == (64, 3)
    assert item["part_shift"].shape == (4, 3) and item["part_scale"].shape == (4, 3)
    # per-part canonical normalization: input differs from ref
    assert np.abs(item["input"] - item["ref"]).max() > 1e-3
    np.testing.assert_array_equal(
        item["attn_map"], np.eye(4, dtype=np.float32)[item["seg_mask"]]
    )


def test_one_train_step_on_real_format(shapenet_tree):
    """Loader batch -> device_batch -> one jitted train step, loss finite."""
    from difffacto_tpu.parallel import build_optimizer_from_cfg, make_train_step
    from difffacto_tpu.parallel.train import TrainState
    from difffacto_tpu.runner.runner import device_batch
    from test_model import init_model, NPOINTS

    loader, _ = ShapeNetSegPart(
        batch_size=2, root=shapenet_tree, npoints=NPOINTS, split="train",
        shuffle=False, drop_last=True,
    )
    batch = device_batch(next(iter(loader)))
    model, variables, _ = init_model()
    tx = build_optimizer_from_cfg(dict(type="Adam", lr=1e-3), max_norm=10.0)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, donate=False)
    state1, metrics = step(state, batch, jax.random.PRNGKey(0), 0)
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state1.step) == 1
