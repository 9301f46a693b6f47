"""Synthetic cloud generators for tests, demos and benchmarks.

`random_cloud` reproduces the reference's C stress workload shape
(`core_legacy/tests/ndt_downsample.c:5-13,21`: uniform random points,
seeded); `clustered_cloud` produces voxel-friendly Gaussian clusters;
`SyntheticSeg` is a labeled segmentation dataset with learnable structure
(class = spatial octant) so trainers can be exercised end-to-end without
the CARLA data the reference never ships.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def random_cloud(n_points: int = 90000, extent: float = 100.0, seed: int = 0):
    """Uniform random cloud (the 90k-point stress shape)."""
    rng = np.random.default_rng(seed)
    return (rng.random((n_points, 3)) * extent).astype(np.float32)


def clustered_cloud(n_points: int, n_clusters: int = 64, extent: float = 20.0,
                    scale: float = 0.4, seed: int = 0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-extent, extent, size=(n_clusters, 3))
    per = n_points // n_clusters + 1
    pts = centers[:, None, :] + rng.normal(scale=scale, size=(n_clusters, per, 3))
    return pts.reshape(-1, 3)[:n_points].astype(np.float32)


def _rotation(rng) -> np.ndarray:
    """Uniform random rotation via QR of a Gaussian matrix."""
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    return (q * np.sign(np.diag(r))).astype(np.float32)


def _shape_cloud(cls: int, n: int, rng) -> np.ndarray:
    """One cloud of shape-class `cls` (8 primitives whose local NDT
    covariance structure differs: shells, planes, rods, tori, ...)."""
    u = rng.uniform(0.0, 2 * np.pi, n).astype(np.float32)
    if cls == 0:  # sphere shell
        v = rng.normal(size=(n, 3))
        pts = 4.0 * v / np.linalg.norm(v, axis=1, keepdims=True)
    elif cls == 1:  # solid ball
        v = rng.normal(size=(n, 3))
        r = 4.0 * rng.uniform(0.0, 1.0, n) ** (1 / 3)
        pts = v / np.linalg.norm(v, axis=1, keepdims=True) * r[:, None]
    elif cls == 2:  # plane patch
        pts = np.stack(
            [rng.uniform(-4, 4, n), rng.uniform(-4, 4, n),
             rng.normal(0, 0.05, n)], axis=1)
    elif cls == 3:  # two parallel planes
        z = np.where(rng.random(n) < 0.5, -2.0, 2.0) + rng.normal(0, 0.05, n)
        pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-4, 4, n), z],
                       axis=1)
    elif cls == 4:  # cylinder shell
        pts = np.stack(
            [3.0 * np.cos(u), 3.0 * np.sin(u), rng.uniform(-4, 4, n)], axis=1)
    elif cls == 5:  # thin rod
        pts = np.stack(
            [rng.normal(0, 0.08, n), rng.normal(0, 0.08, n),
             rng.uniform(-5, 5, n)], axis=1)
    elif cls == 6:  # cube surface
        face = rng.integers(0, 6, n)
        a, b = rng.uniform(-3, 3, n), rng.uniform(-3, 3, n)
        s = np.where(face % 2 == 0, -3.0, 3.0)
        ax = face // 2
        pts = np.stack([np.where(ax == 0, s, a),
                        np.where(ax == 1, s, np.where(ax == 0, a, b)),
                        np.where(ax == 2, s, b)], axis=1)
    else:  # torus
        v = rng.uniform(0.0, 2 * np.pi, n).astype(np.float32)
        r0, r1 = 3.0, 1.0
        pts = np.stack([(r0 + r1 * np.cos(v)) * np.cos(u),
                        (r0 + r1 * np.cos(v)) * np.sin(u),
                        r1 * np.sin(v)], axis=1)
    pts = pts.astype(np.float32) @ _rotation(rng).T
    pts += rng.normal(0, 0.02, size=pts.shape).astype(np.float32)
    pts += rng.uniform(-1, 1, size=(1, 3)).astype(np.float32)
    return pts.astype(np.float32)


class SyntheticCls:
    """Shape-classification dataset (the BASELINE.md parity target is
    classification accuracy; the image ships no ModelNet40 data, so this is
    the controlled stand-in): __getitem__ -> (points [n_points, 3] f32,
    label int). 8 shape classes whose per-voxel NDT covariances differ
    (shells, planes, rods, tori, ...), random rotation/translation per
    sample, ~4-8 m metric scale so the voxel-size search has headroom."""

    NUM_CLASSES = 8

    def __init__(self, n_points: int = 2048, length: int = 64, seed: int = 0):
        self.n_points = int(n_points)
        self.length = int(length)
        self.seed = seed

    @property
    def n_classes(self) -> int:
        return self.NUM_CLASSES

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        if idx < 0 or idx >= self.length:
            raise IndexError(idx)
        rng = np.random.default_rng(self.seed * 100003 + idx)
        label = idx % self.NUM_CLASSES
        return _shape_cloud(label, self.n_points, rng), label


class SyntheticSeg:
    """Labeled synthetic segmentation dataset, API-compatible with CarlaSeg:
    __getitem__ -> (points [n_samples, 3] f32, gt [n_samples, n_classes+1])."""

    def __init__(self, n_classes: int, n_samples: int, length: int = 32,
                 seed: int = 0):
        self.n_classes = int(n_classes)
        self.n_samples = int(n_samples)
        self.length = int(length)
        self.seed = seed

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        if idx < 0 or idx >= self.length:
            raise IndexError(idx)
        pts = clustered_cloud(self.n_samples, seed=self.seed + idx)
        # class = octant index (1..8) mod available classes, 0 = unlabeled
        octant = (
            (pts[:, 0] > 0).astype(np.int64) * 4
            + (pts[:, 1] > 0).astype(np.int64) * 2
            + (pts[:, 2] > 0).astype(np.int64)
        )
        labels = octant % self.n_classes + 1
        gt = np.zeros((self.n_samples, self.n_classes + 1), np.float32)
        gt[np.arange(self.n_samples), labels] = 1.0
        return pts, gt
