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
    """ModelNet-style classification dataset."""

    def __init__(self, root: str, split: str = "train", n_points: int = 2048,
                 seed: int = 0):
        self.root = root
        self.split = split
        self.n_points = int(n_points)
        self.classes = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )
        self.items: List[Tuple[str, int]] = []
        for label, cls in enumerate(self.classes):
            d = os.path.join(root, cls, split)
            if not os.path.isdir(d):
                d = os.path.join(root, cls)
            for name in sorted(os.listdir(d)):
                if name.endswith((".off", ".ply")):
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


class SyntheticCls:
    """Procedural shape classification: 8 classes of parametric surfaces
    with noise — enough structure for end-to-end training tests."""

    N_CLASSES = 8

    def __init__(self, n_points: int = 2048, length: int = 64, seed: int = 0):
        self.n_points = int(n_points)
        self.length = int(length)
        self.seed = seed

    @property
    def n_classes(self) -> int:
        return self.N_CLASSES

    def __len__(self) -> int:
        return self.length

    def _shape(self, label: int, rng) -> np.ndarray:
        n = self.n_points
        u = rng.uniform(0, 2 * np.pi, n)
        v = rng.uniform(-1, 1, n)
        if label == 0:  # sphere
            phi = np.arccos(v)
            pts = np.stack([np.sin(phi) * np.cos(u), np.sin(phi) * np.sin(u),
                            np.cos(phi)], 1)
        elif label == 1:  # cube surface
            pts = rng.uniform(-1, 1, (n, 3))
            ax = rng.integers(0, 3, n)
            pts[np.arange(n), ax] = np.sign(pts[np.arange(n), ax])
        elif label == 2:  # cylinder
            pts = np.stack([np.cos(u), np.sin(u), v], 1)
        elif label == 3:  # plane
            pts = np.stack([np.cos(u) * 0 + rng.uniform(-1, 1, n),
                            rng.uniform(-1, 1, n), np.zeros(n)], 1)
        elif label == 4:  # torus
            r, R = 0.3, 1.0
            w = rng.uniform(0, 2 * np.pi, n)
            pts = np.stack([(R + r * np.cos(w)) * np.cos(u),
                            (R + r * np.cos(w)) * np.sin(u),
                            r * np.sin(w)], 1)
        elif label == 5:  # cone
            h = rng.uniform(0, 1, n)
            pts = np.stack([(1 - h) * np.cos(u), (1 - h) * np.sin(u), h], 1)
        elif label == 6:  # two parallel planes
            pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                            np.sign(v) * 0.5], 1)
        else:  # line/rod
            pts = np.stack([v, 0.05 * np.cos(u), 0.05 * np.sin(u)], 1)
        return pts + rng.normal(scale=0.02, size=(n, 3))

    def __getitem__(self, idx: int):
        if idx < 0 or idx >= self.length:
            raise IndexError(idx)
        rng = np.random.default_rng(self.seed * 100003 + idx)
        label = idx % self.N_CLASSES
        return self._shape(label, rng).astype(np.float32), label
