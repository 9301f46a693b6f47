"""Live multi-host data parallelism (VERDICT r1 item 2).

Launches tools/train.py as TWO real processes with
`jax.distributed.initialize` on localhost (2 CPU devices each → a 4-device
global mesh) and compares the epoch metrics against a single-process run
with the same 4-device global batch. The global batch schedule is seeded
identically, so the runs see the same data (rows permuted across hosts —
loss/grad/BN are permutation-invariant) and must produce matching losses.

Reference plan rows: SURVEY.md §2.3 "Data parallelism" / §7 step 8.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN = os.path.join(REPO, "tools", "train.py")

FLAGS = [
    "--epochs", "1", "--batch_size", "4", "--n_samples", "256",
    "--n_desired_nds", "32", "--n_classes", "4", "--feature_dim", "32",
    "--save_every", "1000", "--no-wandb",
    # lr 0 pins the COMPARABLE surface exactly: the full step still runs
    # (preprocessing, forward, loss, grads, BN batch-stat updates — all the
    # multi-host machinery), only the applied update is zero. Any per-host
    # data bug (wrong rows, dropped/duplicated samples, mis-assembled
    # global arrays, wrong BN stats) breaks the equality below; with lr>0
    # the tiny-config trajectory is chaotic and f32 reduction-order noise
    # amplifies past any honest tolerance (measured: matches at lr=0 to
    # ~2e-7, diverges to ~40% after 8 Adam steps at lr=1e-3).
    "--learning_rate", "0.0",
]


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(n_devices):
    env = dict(os.environ)
    env["NDTPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}"
    )
    return env


def _epoch_metrics(stdout):
    """Parse the host-0 JSON metric lines; merge into one {key: value}."""
    merged = {}
    for line in stdout.splitlines():
        if line.startswith("{"):
            try:
                merged.update(json.loads(line))
            except json.JSONDecodeError:
                pass
    assert "val_mean_loss" in merged, f"no val metrics in output:\n{stdout}"
    return merged


def run_single(tmp_path):
    proc = subprocess.run(
        [sys.executable, TRAIN, *FLAGS, "--out_path", str(tmp_path / "s")],
        env=_env(4), capture_output=True, text=True, timeout=900,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return _epoch_metrics(proc.stdout)


def run_two_process(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, TRAIN, *FLAGS,
             "--out_path", str(tmp_path / f"d{pid}"),
             "--coordinator", f"localhost:{port}",
             "--num_processes", "2", "--process_id", str(pid)],
            env=_env(2), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-3000:]
    # host 0 prints the metrics; host 1 must print none
    assert "val_mean_loss" not in outs[1][1]
    return _epoch_metrics(outs[0][1])


X64_FLAGS = [
    "--epochs", "2", "--batch_size", "4", "--n_samples", "256",
    "--n_desired_nds", "32", "--n_classes", "4", "--feature_dim", "32",
    "--save_every", "1000", "--no-wandb",
    # REAL Adam steps this time (VERDICT r2 item 6): with f64 params +
    # compute, cross-device reduction-order noise is ~1e-16 relative, so
    # after 8 genuine gradient-allreduce + optimizer updates the
    # two-process and single-process trajectories must still agree to
    # ~1e-9 — this pins the *update* path (gradient psum + Adam under
    # replicated sharding), which the lr=0 test above cannot see.
    "--learning_rate", "1e-3",
    "--param_dtype", "float64", "--compute_dtype", "float64",
]


def _run_x64(args, env):
    env = dict(env)
    env["JAX_ENABLE_X64"] = "1"
    return env


def test_two_process_dp_update_path_lr_nonzero_x64(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, TRAIN, *X64_FLAGS,
             "--out_path", str(tmp_path / f"x{pid}"),
             "--coordinator", f"localhost:{port}",
             "--num_processes", "2", "--process_id", str(pid)],
            env=_run_x64(None, _env(2)), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True, cwd=REPO,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-3000:]
    m2 = _epoch_metrics(outs[0][1])

    proc = subprocess.run(
        [sys.executable, TRAIN, *X64_FLAGS,
         "--out_path", str(tmp_path / "xs")],
        env=_run_x64(None, _env(4)), capture_output=True, text=True,
        timeout=900, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    m1 = _epoch_metrics(proc.stdout)

    # After 8 real f64 Adam steps the trajectories agree to ~1e-7
    # (measured cross-layout noise over repeated runs: 5e-9..7e-8 relative
    # — f64 reduction-order differences, which vary with CPU thread
    # scheduling, amplified by the chaotic tiny-config dynamics; a broken
    # update path shows up at f32-chaos scale, ~40% after 8 steps, five+
    # orders of magnitude away): gradient allreduce + the replicated
    # optimizer update are verified, not just the lr=0 surface.
    np.testing.assert_allclose(
        m2["train_mean_loss"], m1["train_mean_loss"], rtol=1e-6
    )
    np.testing.assert_allclose(
        m2["val_mean_loss"], m1["val_mean_loss"], rtol=1e-6
    )
    np.testing.assert_allclose(
        m2["val_mean_accuracy"], m1["val_mean_accuracy"], atol=1e-6
    )
    # and learning actually happened (not the lr=0 degenerate surface)
    assert m1["train_mean_loss"] != m1["val_mean_loss"]


def test_two_process_pointnet_smoke(tmp_path):
    """tools/train_pointnet.py honors the multi-host flags it used to
    silently ignore (VERDICT r2 missing #4): 2 real processes train, only
    host 0 logs, and the epoch metrics match a single-process run at lr=0."""
    pn = os.path.join(REPO, "tools", "train_pointnet.py")
    flags = ["--epochs", "1", "--batch_size", "4", "--n_samples", "128",
             "--n_classes", "4", "--feature_dim", "32",
             "--save_every", "1000", "--no-wandb", "--learning_rate", "0.0"]
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, pn, *flags, "--out_path", str(tmp_path / f"p{pid}"),
         "--coordinator", f"localhost:{port}",
         "--num_processes", "2", "--process_id", str(pid)],
        env=_env(2), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, cwd=REPO,
    ) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-3000:]
    assert "val_mean_loss" not in outs[1][1]  # host-1 silent
    m2 = _epoch_metrics(outs[0][1])

    proc = subprocess.run(
        [sys.executable, pn, *flags, "--out_path", str(tmp_path / "ps")],
        env=_env(4), capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    m1 = _epoch_metrics(proc.stdout)
    np.testing.assert_allclose(
        m2["val_mean_loss"], m1["val_mean_loss"], rtol=1e-5
    )


def test_two_process_dp_matches_single_process(tmp_path):
    m2 = run_two_process(tmp_path)
    m1 = run_single(tmp_path)
    # same global batches (rows interleaved across hosts): metrics agree
    # up to f32 reduction-order noise
    np.testing.assert_allclose(
        m2["val_mean_loss"], m1["val_mean_loss"], rtol=1e-5
    )
    np.testing.assert_allclose(
        m2["val_mean_accuracy"], m1["val_mean_accuracy"], atol=1e-6
    )
    np.testing.assert_allclose(
        m2["train_mean_loss"], m1["train_mean_loss"], rtol=1e-5
    )


def run_two_process_flags(tmp_path, tag, extra_flags):
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, TRAIN, *FLAGS, *extra_flags,
             "--out_path", str(tmp_path / f"{tag}{pid}"),
             "--coordinator", f"localhost:{port}",
             "--num_processes", "2", "--process_id", str(pid)],
            env=_env(2), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-3000:]
    return _epoch_metrics(outs[0][1])


def test_two_process_device_cache_epoch_scan_matches_per_step(tmp_path):
    """Multi-host epoch-scan story (VERDICT r4 item 7): with the dataset
    block-sharded across hosts' devices (multi-process DeviceCachedDataset)
    and the whole epoch compiled as one lax.scan, the 2-process trainer
    must reproduce the 2-process per-step loader's metrics. The global
    batch composition is identical (shared shuffle seed; global dataset
    row i == dataset index i), rows merely permuted — and lr=0 pins the
    comparable surface exactly (see FLAGS)."""
    m_scan = run_two_process_flags(
        tmp_path, "sc", ["--device_cache"])  # epoch_scan defaults on
    m_step = run_two_process(tmp_path)
    np.testing.assert_allclose(
        m_scan["val_mean_loss"], m_step["val_mean_loss"], rtol=1e-5
    )
    np.testing.assert_allclose(
        m_scan["train_mean_loss"], m_step["train_mean_loss"], rtol=1e-5
    )
    np.testing.assert_allclose(
        m_scan["test_mean_accuracy"], m_step["test_mean_accuracy"],
        atol=1e-6
    )
