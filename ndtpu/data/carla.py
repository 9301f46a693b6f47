"""CARLA semantic-segmentation datasets.

Framework-free equivalents of the torch Datasets:
- `CarlaSeg` (`ndnet/datasets/CARLA_Seg.py:9-57`): PLY parse, random
  subsample to n_samples, one-hot GT [n_samples, n_classes+1].
- `CarlaNDTSeg` (`ndnet/datasets/CARLA_NDT_Seg.py:9-55`): PLY parse, FPS to
  n_samples (JAX FPS instead of Open3D), then NDT downsample for
  class-consistent labels. As in the reference, the returned points are the
  FPS points while the GT is the NDT-downsampled one-hot
  (CARLA_NDT_Seg.py:157-164 — shapes intentionally differ).

Both expose __len__/__getitem__, so they also plug into
torch.utils.data.DataLoader unchanged if desired.
"""
from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from ndtpu.data.ply import read_ply


def color_to_class(color) -> int:
    """RGB [0,1] floats -> packed int tag (CARLA_Seg.py:59-76)."""
    c = (np.asarray(color) * 255).astype(np.uint8)
    return int(c[0]) << 16 | int(c[1]) << 8 | int(c[2])


def class_to_color(class_tag: int) -> np.ndarray:
    """Packed int tag -> RGB [0,1] floats (CARLA_Seg.py:78-95)."""
    r = (class_tag >> 16) & 0xFF
    g = (class_tag >> 8) & 0xFF
    b = class_tag & 0xFF
    return np.array([r, g, b], dtype=np.float32) / 255.0


class _PlyFolder:
    def __init__(self, n_classes: int, n_samples: int, path: str):
        self.n_classes = int(n_classes)
        self.n_samples = int(n_samples)
        self.path = path
        if not os.path.exists(path):
            raise FileNotFoundError(f"Dataset not found at {path}")
        self.filenames: List[str] = sorted(os.listdir(path))

    def __len__(self) -> int:
        return len(self.filenames)

    def _load(self, idx: int):
        if idx < 0 or idx >= len(self.filenames):
            raise IndexError(f"Index {idx} out of bounds")
        points, classes = read_ply(os.path.join(self.path, self.filenames[idx]))
        if classes.max(initial=0) > self.n_classes:
            raise ValueError(
                f"Class tag {int(classes.max())} out of bounds"
            )  # CARLA_Seg.py:128-129
        return points, classes

    def _one_hot(self, classes) -> np.ndarray:
        gt = np.zeros((classes.shape[0], self.n_classes + 1), np.float32)
        gt[np.arange(classes.shape[0]), classes.astype(np.int64)] = 1.0
        return gt


class CarlaSeg(_PlyFolder):
    """Random-subsample variant. __getitem__ -> (points [n_samples, 3] f32,
    gt [n_samples, n_classes+1] f32)."""

    def __init__(self, n_classes: int, n_samples: int, path: str, seed: int = 0):
        super().__init__(n_classes, n_samples, path)
        self._rng = np.random.default_rng(seed)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        points, classes = self._load(idx)
        sel = self._rng.choice(
            points.shape[0], self.n_samples, replace=False
        )  # CARLA_Seg.py:142-148
        return (
            points[sel].astype(np.float32),
            self._one_hot(classes[sel]),
        )


class CarlaNDTSeg(_PlyFolder):
    """FPS + NDT variant. __getitem__ -> (points [n_samples, 3] f32,
    gt [num_desired_nds, n_classes+1] f32)."""

    def __init__(self, n_classes: int, n_samples: int, num_desired_nds: int,
                 path: str):
        super().__init__(n_classes, n_samples, path)
        self.num_desired_nds = int(num_desired_nds)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp

        from ndtpu.core.ndt import ndt_downsample
        from ndtpu.ops.fps import farthest_point_sampling

        points, classes = self._load(idx)
        fps_idx = np.asarray(
            farthest_point_sampling(
                jnp.asarray(points, jnp.float32), self.n_samples
            )
        )  # CARLA_NDT_Seg.py:146 (Open3D -> JAX)
        fps_points = points[fps_idx].astype(np.float32)

        # NDT downsample for class-consistent labels (CARLA_NDT_Seg.py:150-154)
        _, _, labels, mask, _ = ndt_downsample(
            jnp.asarray(fps_points),
            self.num_desired_nds,
            None,
            jnp.asarray(classes[fps_idx].astype(np.int32)),
            num_class_slots=self.n_classes + 1,
        )
        return fps_points, self._one_hot(np.asarray(labels))
