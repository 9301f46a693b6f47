"""Shared CLI helpers for the tools (repo-rootless imports, datasets)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# NDTPU_PLATFORM=cpu pins the backend (this image's sitecustomize
# force-registers a remote TPU and ignores JAX_PLATFORMS)
if os.environ.get("NDTPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["NDTPU_PLATFORM"])


class IntLabels:
    """Adapter: (points, gt_onehot [N, C+1]) -> (points, tags [N] i32).

    The production GT input path: int tags are C+1 times smaller through
    stacking and the host->device pipe, and the train steps accept them
    directly (argmax(one_hot(l)) == l — bit-equivalent, tests/test_golden
    .py). `--no-int_labels` restores the literal reference contract."""

    def __init__(self, ds):
        self.ds = ds

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        import numpy as np

        pts, gt = self.ds[i]
        return pts, np.argmax(gt, axis=-1).astype(np.int32)


def make_dataset(n_classes, n_samples, path, synthetic_length=32, seed=0,
                 int_labels=False):
    """CarlaSeg when a path is given, SyntheticSeg otherwise (the reference
    assumes CARLA data on disk; the synthetic fallback keeps every tool
    runnable out of the box)."""
    from ndtpu.data import CarlaSeg, SyntheticSeg

    ds = (CarlaSeg(n_classes, n_samples, path) if path else
          SyntheticSeg(n_classes, n_samples, length=synthetic_length,
                       seed=seed))
    return IntLabels(ds) if int_labels else ds


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
