"""Datasets over previously generated results + auxiliary dataset families.

* ``CustomDataset`` re-implements the mixing input dataset (reference:
  python/difffacto/datasets/custom.py:16): a pickle/npz of generated
  predictions (pred, pred_seg_mask, ...) re-served as model inputs for the
  part-mixing pipeline.
* ``ShapeNetParts`` (shapenet_parts.py:34): pre-packed per-part tensors.
* ``Partnet`` (partnet_dataset.py:14): dense clouds with per-point labels
  stored as (points, labels) npz — the reference's .ply loader becomes an
  npz loader (same contract, no plyfile dependency).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import numpy as np

from ..utils.registry import DATASETS
from .dataset_utils import CroppingDataLoader, DataLoader, pc_norm


class CustomDatasetImpl:
    def __init__(self, path: str, npoints: int = 2048, n_class: int = 4,
                 eval_mode: str = "gen", save_only: bool = True):
        if path.endswith(".pkl") or path.endswith(".pickle"):
            with open(path, "rb") as f:
                data = pickle.load(f)
        else:
            data = dict(np.load(path, allow_pickle=True))
        self.pred = np.asarray(data["pred"], np.float32)
        self.seg = np.asarray(data["pred_seg_mask"], np.int64)
        self.n_class = n_class
        self.num_class = n_class
        self.npoints = npoints
        self.eval_mode = eval_mode
        self.save_only = save_only
        self.class_choice = "Chair"
        self.using_whole_chair_only = False
        self.noises: Dict[int, np.ndarray] = {}

    def __len__(self):
        return self.pred.shape[0]

    def store_noise(self, all_noises, all_ids):
        self.noises = {}
        for noises, ids in zip(all_noises, all_ids):
            for i, idx in enumerate(np.asarray(ids)):
                self.noises[int(idx)] = np.asarray(noises[i])

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        pts = self.pred[index]
        seg = self.seg[index].astype(np.int64)
        K = self.n_class
        if pts.shape[0] != self.npoints:
            choice = np.random.RandomState(index).choice(
                pts.shape[0], self.npoints, replace=True
            )
            pts, seg = pts[choice], seg[choice]
        present = np.zeros(K, np.float32)
        for i in range(K):
            if (seg == i).sum() > 0:
                present[i] = 1
        onehot = np.eye(K, dtype=np.float32)[seg]
        return {
            "present": present,
            "dp_present": present.copy(),
            "part_scale": np.ones((K, 3), np.float32),
            "part_shift": np.zeros((K, 3), np.float32),
            "input": pts.astype(np.float32),
            "ref": pts.astype(np.float32),
            "ref_attn_map": onehot,
            "attn_map": onehot,
            "ref_seg_mask": seg.astype(np.int32),
            "seg_mask": seg.astype(np.int32),
            "shift": np.zeros((1, 3), np.float32),
            "scale": np.ones((1, 1), np.float32),
            "id": np.int32(index),
            "token": f"custom_{index}",
            "noise": self.noises.get(index, np.zeros(1, np.float32)),
        }

    def evaluate(self, results, save_num_batch, device=None):
        from ..metrics.eval import evaluate_batches

        return evaluate_batches(
            results, save_num_batch, eval_mode=self.eval_mode,
            save_only=self.save_only, num_class=self.num_class,
            class_choice=self.class_choice,
        )


@DATASETS.register_module()
def CustomDataset(batch_size, path, npoints=2048, n_class=4, shuffle=False,
                  drop_last=False, eval_mode="gen", save_only=True, distributed=False, **_):
    ds = CustomDatasetImpl(path, npoints, n_class, eval_mode, save_only)
    return DataLoader(ds, batch_size=batch_size, shuffle=shuffle, drop_last=drop_last), None


class _ArrayPartDataset:
    """Shared base: (num_shapes, N, 3) points + (num_shapes, N) labels."""

    def __init__(self, points, labels, npoints, n_class, scale_mode="shape_unit",
                 part_scale_mode="shape_canonical", eval_mode="ae", save_only=False,
                 clip=True, class_choice="Chair"):
        self.points = points
        self.labels = labels
        self.npoints = npoints
        self.n_class = n_class
        self.num_class = n_class
        self.scale_mode = scale_mode
        self.part_scale_mode = part_scale_mode
        self.eval_mode = eval_mode
        self.save_only = save_only
        self.clip = clip
        self.class_choice = class_choice
        self.using_whole_chair_only = False
        self.noises: Dict[int, np.ndarray] = {}
        self._rng = np.random.RandomState(0)

    def __len__(self):
        return self.points.shape[0]

    def store_noise(self, all_noises, all_ids):
        self.noises = {}
        for noises, ids in zip(all_noises, all_ids):
            for i, idx in enumerate(np.asarray(ids)):
                self.noises[int(idx)] = np.asarray(noises[i])

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        pts_full = self.points[index]
        seg_full = self.labels[index].astype(np.int64)
        choice = self._rng.choice(pts_full.shape[0], self.npoints, replace=True)
        ori, seg = pts_full[choice].astype(np.float32), seg_full[choice]
        K = self.n_class
        ori, shift, scale = pc_norm(ori, self.scale_mode)
        out = np.zeros_like(ori)
        present = np.zeros(K, np.float32)
        shifts = np.zeros((K, 3), np.float32)
        scales = np.ones((K, 3), np.float32)
        for i in range(K):
            idx = seg == i
            if idx.sum() >= 10:
                present[i] = 1
                npart, ps, pc_ = pc_norm(ori[idx], self.part_scale_mode, clip=self.clip)
                shifts[i] = ps[0]
                scales[i] = pc_[0] if pc_.shape[-1] == 3 else pc_[0].repeat(3)
                out[idx] = npart
        onehot = np.eye(K, dtype=np.float32)[seg]
        return {
            "present": present,
            "dp_present": present.copy(),
            "part_scale": scales,
            "part_shift": shifts,
            "input": out,
            "ref_attn_map": onehot,
            "attn_map": onehot,
            "ref": ori,
            "ref_seg_mask": seg.astype(np.int32),
            "seg_mask": seg.astype(np.int32),
            "shift": shift,
            "scale": scale,
            "id": np.int32(index),
            "token": f"shape_{index}",
            "noise": self.noises.get(index, np.zeros(1, np.float32)),
        }

    def evaluate(self, results, save_num_batch, device=None):
        from ..metrics.eval import evaluate_batches

        return evaluate_batches(
            results, save_num_batch, eval_mode=self.eval_mode,
            save_only=self.save_only, num_class=self.num_class,
            class_choice=self.class_choice,
        )


@DATASETS.register_module()
def ShapeNetParts(batch_size, path, npoints=2048, n_class=4, shuffle=True,
                  drop_last=False, split="train", eval_mode="ae", save_only=False,
                  distributed=False, **kwargs):
    """Pre-packed tensor file dataset (shapenet_parts.py:34): npz with
    'points' (S, N, 3) and 'labels' (S, N)."""
    z = np.load(path, allow_pickle=True)
    ds = _ArrayPartDataset(
        np.asarray(z["points"]), np.asarray(z["labels"]), npoints, n_class,
        eval_mode=eval_mode, save_only=save_only,
        **{k: v for k, v in kwargs.items() if k in (
            "scale_mode", "part_scale_mode", "clip", "class_choice")},
    )
    return DataLoader(ds, batch_size=batch_size, shuffle=shuffle, drop_last=drop_last,
                      num_workers=int(kwargs.get("num_workers", 0))), None


@DATASETS.register_module()
def ShapeNetSupSeg(batch_size, path, npoints=2048, n_class=25, shuffle=True,
                   split="train", drop_last=False, eval_mode="ae", save_only=False,
                   distributed=False, **kwargs):
    """PartGlot super-segment data (shapenet_sup_seg.py): same contract with
    n_class = number of super-segments (finer slots than semantic parts)."""
    z = np.load(path, allow_pickle=True)
    ds = _ArrayPartDataset(
        np.asarray(z["points"]), np.asarray(z["labels"]), npoints, n_class,
        eval_mode=eval_mode, save_only=save_only,
        **{k: v for k, v in kwargs.items() if k in (
            "scale_mode", "part_scale_mode", "clip", "class_choice")},
    )
    return DataLoader(ds, batch_size=batch_size, shuffle=shuffle, drop_last=drop_last,
                      num_workers=int(kwargs.get("num_workers", 0))), None


@DATASETS.register_module()
def ShapeNetSupSegPartglot(*args, **kwargs):
    """PartGlot game variant over super-segments (shapenet_sup_seg_partglot)."""
    return ShapeNetSupSeg(*args, **kwargs)


@DATASETS.register_module()
def Partnet(batch_size, root, npoints=2048, n_class=4, shuffle=True, split="train",
            drop_last=False, eval_mode="ae", save_only=False, distributed=False, **kwargs):
    """PartNet dense clouds (partnet_dataset.py:14), stored as one npz per
    split: points (S, N, 3), labels (S, N)."""
    z = np.load(os.path.join(root, f"partnet_{split}.npz"), allow_pickle=True)
    ds = _ArrayPartDataset(
        np.asarray(z["points"]), np.asarray(z["labels"]), npoints, n_class,
        eval_mode=eval_mode, save_only=save_only,
        **{k: v for k, v in kwargs.items() if k in (
            "scale_mode", "part_scale_mode", "clip", "class_choice")},
    )
    return DataLoader(ds, batch_size=batch_size, shuffle=shuffle, drop_last=drop_last,
                      num_workers=int(kwargs.get("num_workers", 0))), None


class _PartglotTripletDataset:
    """Packed PartGlot language-game triplets (written by
    tools/pack_partglot.py; reference tools/process_data.py:99-170): each item
    is a target/distractor pair of super-segment clouds with the utterance's
    token ids and part indicator."""

    def __init__(self, path: str):
        z = np.load(path, allow_pickle=True)
        self.gt = np.asarray(z["gt_geos"], np.float32)
        self.dis = np.asarray(z["distractor_geos"], np.float32)
        self.gt_mask = np.asarray(z["gt_mask"], np.float32)
        self.dis_mask = np.asarray(z["distractor_mask"], np.float32)
        self.texts = np.asarray(z["texts"], np.int32)
        self.part_indicator = np.asarray(z["part_indicator"], np.float32)

    def __len__(self):
        return len(self.gt)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        return {
            "gt_geos": self.gt[index],
            "distractor_geos": self.dis[index],
            "gt_mask": self.gt_mask[index],
            "distractor_mask": self.dis_mask[index],
            "text": self.texts[index],
            "part_indicator": self.part_indicator[index],
            "id": np.int32(index),
            "token": f"partglot_{index}",
        }

    def evaluate(self, results, save_num_batch, device=None):
        return {}, {}


@DATASETS.register_module()
def PartglotTriplet(batch_size, path, shuffle=True, drop_last=False,
                    distributed=False, **_):
    ds = _PartglotTripletDataset(path)
    return DataLoader(ds, batch_size=batch_size, shuffle=shuffle, drop_last=drop_last), None


@DATASETS.register_module()
def ShapeNetPart(batch_size, root, npoints, num_workers=0, scale_mode=None,
                 eval_mode="ae", distributed=False, shuffle=True,
                 drop_last=True, n_class=4, **kwargs):
    """Reference alias (shapenet_parts.py:15-27): builds the pre-packed
    tensor dataset from ``root``. The reference factory quirkily returns the
    bare dataset; here it follows the uniform (loader, sampler) contract."""
    return ShapeNetParts(
        batch_size, root, npoints=npoints, n_class=n_class, shuffle=shuffle,
        drop_last=drop_last, eval_mode=eval_mode, num_workers=num_workers,
        scale_mode=scale_mode or "shape_unit", **kwargs,
    )


class _ShapeNet55(object):
    """ShapeNet-55 whole-cloud completion dataset (shapenet55.py:42-120):
    ``root/{split}.txt`` lists ``taxonomy-model.npy`` files living in
    ``root/../shapenet_pc``; each is an (N, 3) cloud, subsampled to npoints
    and pc_norm'ed."""

    def __init__(self, root, npoints, split, scale_mode="shape_unit", seed=0,
                 cats=("all",)):
        from .dataset_utils import shapenet55_id_to_cat

        if "all" in cats:
            cats = tuple(shapenet55_id_to_cat.values())
        for cat in cats:
            assert cat in shapenet55_id_to_cat.values(), f"Unknown category {cat!r}"
        list_file = os.path.join(root, f"{split}.txt")
        with open(list_file) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        parent = os.path.dirname(os.path.abspath(root))
        # Category filter by taxonomy-id prefix (shapenet55.py:64-73):
        # each line is "<taxonomy_id>-<model_id>.npy". Like the reference,
        # an unknown taxonomy id in the split file raises (KeyError) rather
        # than silently shrinking the dataset.
        lines = [
            ln for ln in lines
            if shapenet55_id_to_cat[ln.split("-")[0]] in cats
        ]
        self.files = [os.path.join(parent, "shapenet_pc", ln) for ln in lines]
        self.npoints = npoints
        self.scale_mode = scale_mode
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.files)

    def set_epoch(self, epoch):
        self._rng = np.random.RandomState(epoch)

    def __getitem__(self, index):
        pts = np.load(self.files[index]).astype(np.float32)
        if pts.shape[0] >= self.npoints:
            sel = self._rng.choice(pts.shape[0], self.npoints, replace=False)
        else:
            sel = self._rng.choice(pts.shape[0], self.npoints, replace=True)
        pts = pts[sel]
        pts, shift, scale = pc_norm(pts, self.scale_mode)
        return {
            "input": pts.astype(np.float32),
            "ref": pts.astype(np.float32),
            "seg_mask": np.zeros((self.npoints,), np.int32),
            "ref_seg_mask": np.zeros((self.npoints,), np.int32),
            "present": np.ones((1,), np.float32),
            "shift": shift.astype(np.float32),
            "scale": np.asarray(scale, np.float32),
            "id": np.int64(index),
        }

    def evaluate(self, results, save_num_batch, device=None):
        from ..metrics.eval import evaluate_batches

        return evaluate_batches(results, save_num_batch, eval_mode="ae")


@DATASETS.register_module()
def ShapeNet(batch_size, root, npoints, split, crop=(0.25, 0.75),
             num_workers=0, scale_mode="shape_unit", mode="median", loss=None,
             distributed=False, shuffle=True, cats=("all",), drop_last=None,
             **kwargs):
    """ShapeNet-55 completion loader (shapenet55.py:12-40): whole clouds plus
    device-side partial/missing cropping via CroppingDataLoader."""
    frac = {"easy": 0.25, "median": 0.5, "hard": 0.75, "complete": 1.0}[mode]
    if split == "test":
        crop_range = int(frac * npoints)
    elif isinstance(crop, (list, tuple)):
        crop_range = [int(crop[0] * npoints), int(crop[1] * npoints)]
    else:
        crop_range = int(float(crop) * npoints)
    ds = _ShapeNet55(root, npoints, split, scale_mode=scale_mode, cats=tuple(cats))
    if drop_last is None:
        drop_last = split != "test"  # never drop eval shapes
    base = DataLoader(ds, batch_size=batch_size, shuffle=shuffle,
                      drop_last=drop_last, num_workers=num_workers)
    return CroppingDataLoader(base, crop_range), None


# Reference type-string aliases for the super-segment datasets
# (shapenet_sup_seg.py / shapenet_sup_seg_partglot.py registered names).
DATASETS.register_module(name="ShapeNetSegSuperSegment", module=ShapeNetSupSeg)
DATASETS.register_module(
    name="ShapeNetSegSuperSegmentParglot", module=ShapeNetSupSegPartglot
)
