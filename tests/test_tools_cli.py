"""CLI smoke tests: the tools must run end-to-end on the synthetic
fallback datasets (the reference's tools all require CARLA data on disk)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "NDTPU_PLATFORM": "cpu"}


def run_tool(args, timeout=420):
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=ENV,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_train_cli(tmp_path):
    r = run_tool([
        "tools/train.py", "--epochs", "1", "--batch_size", "2",
        "--n_samples", "256", "--n_desired_nds", "24", "--n_classes", "6",
        "--feature_dim", "32", "--save_every", "1",
        "--out_path", str(tmp_path),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Done." in r.stdout


@pytest.mark.slow
def test_viz_cli(tmp_path):
    r = run_tool([
        "tools/viz.py", "--n_points", "2000", "--target", "32",
        "--target1", "16", "--out_dir", str(tmp_path),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Hz" in r.stdout  # the reference's timing protocol (viz.py:106)
    assert (tmp_path / "downsampled.ply").exists()
    assert (tmp_path / "pruned.ply").exists()


@pytest.mark.slow
def test_seg_viz_cli(tmp_path):
    out = tmp_path / "seg.ply"
    r = run_tool([
        "tools/seg_viz.py", "--n_samples", "256", "--n_desired_nds", "24",
        "--n_classes", "6", "--feature_dim", "32", "--out", str(out),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()


@pytest.mark.slow
def test_point_histogram_cli(tmp_path):
    from ndtpu.data.ply import write_ply
    import numpy as np

    d = tmp_path / "plys"
    d.mkdir()
    for i in range(3):
        write_ply(str(d / f"{i}.ply"), np.random.default_rng(i).normal(size=(50 + i, 3)))
    out = tmp_path / "hist.png"
    r = run_tool([
        "tools/point_histogram.py", "--path", str(d), "--out", str(out),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
    assert "3 files" in r.stdout
