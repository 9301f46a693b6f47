"""Data pipeline tests: PLY round-trip (python + native readers), datasets,
FPS, loader prefetch."""
import dataclasses
import os

import numpy as np
import pytest

from ndtpu.data.carla import CarlaSeg, CarlaNDTSeg, class_to_color, color_to_class
from ndtpu.data.loader import batch_iterator, prefetch_to_device
from ndtpu.data.ply import count_ply_points, read_ply, write_ply
from ndtpu.data.synthetic import SyntheticSeg, clustered_cloud, random_cloud


def make_ply_dir(tmp_path, n_files=3, n_points=200, n_classes=5):
    rng = np.random.default_rng(0)
    d = tmp_path / "plys"
    d.mkdir()
    for i in range(n_files):
        pts = rng.normal(size=(n_points, 3)) * 5
        classes = rng.integers(0, n_classes + 1, n_points)
        write_ply(str(d / f"{i:03d}.ply"), pts, classes=classes)
    return str(d)


def test_ply_roundtrip_python_reader(tmp_path):
    pts = np.array([[1.25, -2.5, 3.0], [0.0, 0.125, -9.75]])
    classes = np.array([3, 0], np.uint16)
    path = write_ply(str(tmp_path / "a.ply"), pts, classes=classes)
    rpts, rcls = read_ply(path, use_native=False)
    np.testing.assert_allclose(rpts, pts)
    np.testing.assert_array_equal(rcls, classes)
    assert count_ply_points(path) == 2


def test_ply_native_reader_matches(tmp_path):
    from ndtpu.native.io import build_native, native_read_ply

    if not build_native():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(5000, 3)) * 100
    classes = rng.integers(0, 28, 5000).astype(np.uint16)
    path = write_ply(str(tmp_path / "big.ply"), pts, classes=classes)
    out = native_read_ply(path)
    assert out is not None
    npts, ncls = out
    np.testing.assert_allclose(npts, np.round(pts, 8), rtol=1e-6)
    np.testing.assert_array_equal(ncls, classes)


def test_color_class_packing():
    tag = color_to_class(np.array([1.0, 0.5, 0.0]))
    back = class_to_color(tag)
    np.testing.assert_allclose(back, [1.0, 127 / 255.0, 0.0], atol=1e-6)


def test_carla_seg_dataset(tmp_path):
    path = make_ply_dir(tmp_path, n_points=200)
    ds = CarlaSeg(n_classes=5, n_samples=64, path=path)
    assert len(ds) == 3
    pts, gt = ds[0]
    assert pts.shape == (64, 3) and pts.dtype == np.float32
    assert gt.shape == (64, 6)
    np.testing.assert_allclose(gt.sum(-1), 1.0)


def test_carla_ndt_seg_dataset(tmp_path):
    path = make_ply_dir(tmp_path, n_points=300)
    ds = CarlaNDTSeg(n_classes=5, n_samples=128, num_desired_nds=16, path=path)
    pts, gt = ds[0]
    assert pts.shape == (128, 3)
    assert gt.shape == (16, 6)  # NDT-downsampled GT (reference quirk kept)


def test_fps_spreads_points():
    import jax.numpy as jnp

    from ndtpu.ops.fps import farthest_point_sampling

    # two tight clusters far apart: FPS must pick from both immediately
    a = np.random.default_rng(0).normal(scale=0.01, size=(50, 3))
    b = a + np.array([100.0, 0, 0])
    pts = np.concatenate([a, b]).astype(np.float32)
    idx = np.asarray(farthest_point_sampling(jnp.asarray(pts), 4))
    assert len(set(idx.tolist())) == 4
    sides = {int(i >= 50) for i in idx[:2]}
    assert sides == {0, 1}


def test_synthetic_dataset_and_loader():
    ds = SyntheticSeg(n_classes=8, n_samples=128, length=7)
    batches = list(batch_iterator(ds, batch_size=2, shuffle=True, seed=1))
    assert len(batches) == 3  # drop_last
    pts, gt = batches[0]
    assert pts.shape == (2, 128, 3) and gt.shape == (2, 128, 9)

    dev_batches = list(prefetch_to_device(batches))
    assert len(dev_batches) == 3
    np.testing.assert_allclose(
        np.asarray(dev_batches[0][0]), batches[0][0], atol=0
    )


def test_random_cloud_stress_shape():
    pts = random_cloud(90000, seed=0)  # ndt_downsample.c:5-13 workload
    assert pts.shape == (90000, 3)
    pts2 = random_cloud(90000, seed=0)
    np.testing.assert_array_equal(pts, pts2)


def _write_off(path, verts, glued_header=False):
    faces = "3 0 1 2\n"
    with open(path, "w") as f:
        if glued_header:
            f.write(f"OFF{len(verts)} 1 0\n")  # ModelNet40's glued variant
        else:
            f.write(f"OFF\n{len(verts)} 1 0\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        f.write(faces)


def test_read_off_plain_and_glued_header(tmp_path):
    from ndtpu.data.classification import read_off

    rng = np.random.default_rng(5)
    verts = rng.normal(size=(10, 3))
    _write_off(tmp_path / "a.off", verts)
    _write_off(tmp_path / "b.off", verts, glued_header=True)
    np.testing.assert_allclose(read_off(str(tmp_path / "a.off")), verts)
    np.testing.assert_allclose(read_off(str(tmp_path / "b.off")), verts)

    import pytest

    (tmp_path / "bad.off").write_text("PLY\n3 1 0\n")
    with pytest.raises(ValueError):
        read_off(str(tmp_path / "bad.off"))


def test_modelnet_cls_dataset(tmp_path):
    """ModelNet directory layout <root>/<class>/<split>/<file>.off
    (ndtpu/data/classification.py:36-80): class discovery, split layout,
    sampling to n_points, unit-sphere normalization, stable label order."""
    from ndtpu.data.classification import ModelNetCls

    rng = np.random.default_rng(7)
    for label, cls in enumerate(["airplane", "chair"]):
        for split in ["train", "test"]:
            d = tmp_path / cls / split
            d.mkdir(parents=True)
            for i in range(2):
                # vary vertex counts to hit both subsample and re-sample
                n = 40 if i == 0 else 8
                verts = rng.normal(size=(n, 3)) * (label + 1) * 3.0
                _write_off(d / f"{cls}_{i:04d}.off", verts,
                           glued_header=(i == 1))

    ds = ModelNetCls(str(tmp_path), split="train", n_points=16, seed=0)
    assert ds.n_classes == 2
    assert ds.classes == ["airplane", "chair"]
    assert len(ds) == 4
    pts, label = ds[0]
    assert pts.shape == (16, 3) and pts.dtype == np.float32
    assert label in (0, 1)
    # unit-sphere normalization: centered, max radius 1
    np.testing.assert_allclose(pts.mean(0), 0.0, atol=1e-5)
    assert np.linalg.norm(pts, axis=1).max() <= 1.0 + 1e-5
    # both classes appear; labels follow sorted class order
    labels = sorted({ds[i][1] for i in range(len(ds))})
    assert labels == [0, 1]

    test_ds = ModelNetCls(str(tmp_path), split="test", n_points=8, seed=0)
    assert len(test_ds) == 4
    # n_points > available vertices: sampled with replacement, full shape
    pts8, _ = ModelNetCls(str(tmp_path), split="test", n_points=64, seed=0)[1]
    assert pts8.shape == (64, 3)


def test_modelnet_val_holdout_split(tmp_path):
    """Carved val split (VERDICT r2 weak #7): with no val/ directory,
    split="val" is a deterministic 10% holdout of train and
    split="train+holdout" the complementary 90% — disjoint, covering, and
    never touching the test split."""
    from ndtpu.data.classification import ModelNetCls

    rng = np.random.default_rng(11)
    for cls in ["airplane", "chair"]:
        for split in ["train", "test"]:
            d = tmp_path / cls / split
            d.mkdir(parents=True)
            n_files = 12 if split == "train" else 3
            for i in range(n_files):
                _write_off(d / f"{cls}_{i:04d}.off", rng.normal(size=(8, 3)))

    full = ModelNetCls(str(tmp_path), split="train")
    val = ModelNetCls(str(tmp_path), split="val")
    rest = ModelNetCls(str(tmp_path), split="train+holdout")
    val_files = {p for p, _ in val.items}
    rest_files = {p for p, _ in rest.items}
    assert len(val) == 4  # ceil(12/10) per class x 2 classes
    assert val_files.isdisjoint(rest_files)
    assert val_files | rest_files == {p for p, _ in full.items}
    assert all("/test/" not in p for p in val_files)
    # determinism: same carve on re-construction
    assert {p for p, _ in ModelNetCls(str(tmp_path), split="val").items} == val_files

    # a real val/ directory takes precedence over carving
    for cls in ["airplane", "chair"]:
        d = tmp_path / cls / "val"
        d.mkdir()
        _write_off(d / f"{cls}_v.off", rng.normal(size=(8, 3)))
    real_val = ModelNetCls(str(tmp_path), split="val")
    assert len(real_val) == 2
    assert all("/val/" in p for p, _ in real_val.items)


def test_train_cls_dataset_class_count_guard(tmp_path):
    """tools/train.py fail-fast (VERDICT r2 weak #4): a dataset with more
    classes than --n_classes errors early instead of silently truncating,
    and the val split maps to the carved holdout, not the test split."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.train import make_cls_dataset
    from ndtpu.train.config import TrainConfig

    rng = np.random.default_rng(13)
    for cls in ["a", "b", "c"]:
        for split in ["train", "test"]:
            d = tmp_path / cls / split
            d.mkdir(parents=True)
            for i in range(3):
                _write_off(d / f"{cls}_{i}.off", rng.normal(size=(8, 3)))

    cfg = TrainConfig(task="classification", n_classes=2, n_samples=16,
                      train_path=str(tmp_path), val_path=str(tmp_path),
                      test_path=str(tmp_path))
    import pytest

    with pytest.raises(ValueError, match="3 classes"):
        make_cls_dataset(cfg, "train", 0)

    cfg2 = dataclasses.replace(cfg, n_classes=4)
    train = make_cls_dataset(cfg2, "train", 0)
    val = make_cls_dataset(cfg2, "val", 1)
    assert train.num_classes == val.num_classes == 4
    train_files = {p for p, _ in train.ds.items}
    val_files = {p for p, _ in val.ds.items}
    assert val_files and val_files.isdisjoint(train_files)
    assert all("/test/" not in p for p in val_files)
    # one-hot width follows cfg.n_classes
    _, oh = val[0]
    assert oh.shape == (4,)


def test_synthetic_cls_shapes_and_determinism():
    from ndtpu.data.synthetic import SyntheticCls

    ds = SyntheticCls(n_points=128, length=16, seed=3)
    assert ds.n_classes == 8
    pts, label = ds[9]
    assert pts.shape == (128, 3) and label == 1
    pts2, label2 = SyntheticCls(n_points=128, length=16, seed=3)[9]
    np.testing.assert_array_equal(pts, pts2)
    # all 8 classes cycle through
    assert sorted({ds[i][1] for i in range(16)}) == list(range(8))


def test_batch_iterator_multi_process_slicing():
    """Per-host slicing: same seeded global schedule on every 'host', each
    yields its strided slice; partial global batches are always dropped
    under multiple processes (unequal shards would break assembly)."""
    ds = SyntheticSeg(n_classes=4, n_samples=32, length=9)

    def collect(pid, nproc, batch_size, drop_last=True):
        out = []
        for pts, gt in batch_iterator(ds, batch_size, shuffle=True, seed=3,
                                      drop_last=drop_last, process_id=pid,
                                      num_processes=nproc):
            out.append(pts)
        return out

    single = collect(0, 1, 4)
    p0 = collect(0, 2, 4)
    p1 = collect(1, 2, 4)
    assert len(single) == len(p0) == len(p1) == 2  # 9 // 4, last dropped
    for b, (a0, a1) in enumerate(zip(p0, p1)):
        assert a0.shape[0] == a1.shape[0] == 2
        # interleaving the two hosts' rows reconstructs the global batch
        merged = np.empty_like(single[b])
        merged[0::2] = a0
        merged[1::2] = a1
        np.testing.assert_array_equal(merged, single[b])

    # drop_last=False keeps the partial batch single-process but still
    # drops it multi-process
    assert len(collect(0, 1, 4, drop_last=False)) == 3
    assert len(collect(0, 2, 4, drop_last=False)) == 2
    assert len(collect(1, 2, 4, drop_last=False)) == 2

    import pytest

    with pytest.raises(ValueError):
        list(batch_iterator(ds, 5, process_id=0, num_processes=2))
