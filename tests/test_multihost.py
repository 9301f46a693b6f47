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
