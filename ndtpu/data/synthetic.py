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
