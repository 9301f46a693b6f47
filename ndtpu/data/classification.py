"""Classification datasets (the BASELINE.md parity target is
classification accuracy at n_desired_nds=1000 on ModelNet-style splits).

The reference never ships a classification dataset (its trainer raises
NotImplementedError for the task, tools/train.py:122-123). Provided here:
- `ModelNetCls`: ModelNet-style directory tree of OFF/PLY meshes
  (`<root>/<class>/<split>/<file>`), vertices sampled to n_points;
- `SyntheticCls`: procedural shapes (sphere/cube/cylinder/plane/torus...)
  so the classification path trains out of the box.

Both yield (points [n_points, 3] f32, label int).
"""
from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np


def read_off(path: str) -> np.ndarray:
    """Vertices of an OFF mesh (ModelNet format)."""
    with open(path, "r") as f:
        first = f.readline().strip()
        if first.startswith("OFF") and len(first) > 3:
            counts = first[3:].split()  # header glued: "OFF123 456 0"
        else:
            if first != "OFF":
                raise ValueError(f"not an OFF file: {path}")
            counts = f.readline().split()
        n_vertices = int(counts[0])
        verts = np.loadtxt(f, max_rows=n_vertices, dtype=np.float64)
    return verts[:, :3]


class ModelNetCls:
    """ModelNet-style classification dataset.

    Splits: "train", "test", "val", "train+holdout". ModelNet trees ship
    only train/ and test/ directories, so "val" resolves to a real val/
    directory when one exists, otherwise to a deterministic 10% holdout
    (every 10th file per class, sorted order) of the train split;
    "train+holdout" is the complementary 90% — train/val stay disjoint and
    the test split is never used for model selection (the reference's
    trainer offers no val handling at all, tools/train.py:125-137)."""

    VAL_EVERY = 10  # 1-in-10 train files become the carved val holdout

    def __init__(self, root: str, split: str = "train", n_points: int = 2048,
                 seed: int = 0):
        self.root = root
        self.split = split
        self.n_points = int(n_points)
        self.classes = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )
        have_val_dir = any(
            os.path.isdir(os.path.join(root, c, "val")) for c in self.classes
        )
        carve = None  # None = keep all, True = holdout only, False = rest
        if split == "val" and not have_val_dir:
            split, carve = "train", True
        elif split == "train+holdout":
            split, carve = "train", False
        self.items: List[Tuple[str, int]] = []
        for label, cls in enumerate(self.classes):
            d = os.path.join(root, cls, split)
            if not os.path.isdir(d):
                d = os.path.join(root, cls)
            names = [n for n in sorted(os.listdir(d))
                     if n.endswith((".off", ".ply"))]
            if carve is not None:
                names = [n for i, n in enumerate(names)
                         if (i % self.VAL_EVERY == 0) == carve]
            for name in names:
                self.items.append((os.path.join(d, name), label))
        self._rng = np.random.default_rng(seed)

    @property
    def n_classes(self) -> int:
        return len(self.classes)

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int):
        path, label = self.items[idx]
        if path.endswith(".off"):
            verts = read_off(path)
        else:
            from ndtpu.data.ply import read_ply

            verts, _ = read_ply(path)
        sel = self._rng.choice(
            verts.shape[0], self.n_points, replace=verts.shape[0] < self.n_points
        )
        pts = verts[sel].astype(np.float32)
        # center + unit-sphere normalize (standard ModelNet preprocessing)
        pts -= pts.mean(0)
        pts /= max(np.linalg.norm(pts, axis=1).max(), 1e-9)
        return pts, label


# canonical implementation lives with the other synthetic generators;
# re-exported here because classification users look for it alongside
# ModelNetCls
from ndtpu.data.synthetic import SyntheticCls  # noqa: E402,F401
