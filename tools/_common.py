"""Shared CLI helpers for the tools (repo-rootless imports, datasets)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# NDTPU_PLATFORM=cpu pins the backend (this image's sitecustomize
# force-registers a remote TPU and ignores JAX_PLATFORMS)
if os.environ.get("NDTPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["NDTPU_PLATFORM"])


def make_dataset(n_classes, n_samples, path, synthetic_length=32, seed=0):
    """CarlaSeg when a path is given, SyntheticSeg otherwise (the reference
    assumes CARLA data on disk; the synthetic fallback keeps every tool
    runnable out of the box)."""
    from ndtpu.data import CarlaSeg, SyntheticSeg

    if path:
        return CarlaSeg(n_classes, n_samples, path)
    return SyntheticSeg(n_classes, n_samples, length=synthetic_length, seed=seed)


# 29-class palette from the reference (tools/seg_viz.py:17-46)
CLASS_COLORS = [
    [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 0, 1], [0, 1, 1],
    [1, 0.5, 0], [1, 0, 0.5], [0.5, 1, 0], [0, 1, 0.5], [0.5, 0, 1],
    [0, 0.5, 1], [0.5, 1, 1], [1, 0.5, 1], [1, 1, 0.5], [0.5, 0, 0],
    [0, 0.5, 0], [0, 0, 0.5], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
    [0.5, 0.5, 1], [0.5, 1, 0.5], [1, 0.5, 0.5], [0.5, 0, 0.5],
    [0.5, 0.5, 0.5], [0.25, 0.25, 0], [0, 0.25, 0.25], [0.25, 0, 0.25],
]


def paint_classes(classes):
    """class tags [N] -> RGB [N, 3] floats using the reference palette."""
    import numpy as np

    pal = np.asarray(CLASS_COLORS, np.float32)
    return pal[np.asarray(classes, np.int64) % len(pal)]
