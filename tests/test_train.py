"""Train-step tests: loss decreases, checkpoint round-trips, schedule."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ndtpu.models import NDTNetSegmentation, PointNetSegmentation
from ndtpu.train.loop import (
    accuracy,
    cross_entropy_loss,
    make_lr_schedule,
    make_ndt_seg_step,
    make_pointnet_seg_step,
)
from ndtpu.train.state import (
    create_train_state,
    restore_checkpoint,
    save_checkpoint,
)

B, N, C = 2, 128, 4
M = 16  # n_desired_nds


def make_batch(seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-3, 3, size=(24, 3))
    pts = (
        centers[:, None, :] + rng.normal(scale=0.2, size=(24, 16, 3))
    ).reshape(-1, 3)[:N]
    pts = np.stack([pts, pts * 1.3]).astype(np.float32)
    # labels correlated with x-coordinate sign so learning is possible
    labels = (pts[..., 0] > 0).astype(np.int64) + 1
    onehot = np.eye(C + 1, dtype=np.float32)[labels]
    return jnp.asarray(pts), jnp.asarray(onehot)


def test_lr_schedule_staircase():
    import pytest

    sched = make_lr_schedule(0.1, steps_per_epoch=10, decay_epochs=20)
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(199)) == pytest.approx(0.1)
    assert float(sched(200)) == pytest.approx(0.05)
    assert float(sched(400)) == pytest.approx(0.025)


def test_cross_entropy_and_accuracy_masked():
    logits = jnp.array([[[5.0, 0.0], [0.0, 5.0], [5.0, 0.0]]])
    onehot = jnp.array([[[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]]])
    mask = jnp.array([[True, True, False]])
    acc = accuracy(logits, onehot, mask)
    assert float(acc) == 1.0  # the wrong row is masked out
    loss_m = cross_entropy_loss(logits, onehot, mask)
    loss_u = cross_entropy_loss(logits, onehot)
    assert float(loss_m) < float(loss_u)


def test_ndt_seg_train_step_decreases_loss():
    pts, gt = make_batch()
    model = NDTNetSegmentation(num_classes=C, feature_dim=32)
    tx = optax.adam(1e-2)
    # template inputs at post-preprocessing shapes
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        jnp.zeros((B, M, 3)), jnp.zeros((B, M, 9)),
        init_kwargs={"train": False},
    )
    step, eval_step = make_ndt_seg_step(M, C)
    metrics0 = None
    for i in range(8):
        state, metrics = step(state, pts, gt)
        if metrics0 is None:
            metrics0 = metrics
    assert float(metrics["loss"]) < float(metrics0["loss"])
    ev = eval_step(state, pts, gt)
    assert np.isfinite(float(ev["loss"]))


def test_pointnet_seg_train_step():
    pts, gt = make_batch()
    model = PointNetSegmentation(num_classes=C, feature_dim=32)
    tx = optax.adam(1e-2)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((B, N, 3)),
        init_kwargs={"train": False},
    )
    step, eval_step = make_pointnet_seg_step()
    l0 = None
    for _ in range(5):
        state, metrics = step(state, pts, gt)
        if l0 is None:
            l0 = float(metrics["loss"])
    assert float(metrics["loss"]) < l0


def test_checkpoint_roundtrip(tmp_path):
    pts, gt = make_batch()
    model = PointNetSegmentation(num_classes=C, feature_dim=32)
    tx = optax.adam(1e-3)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((B, N, 3)),
        init_kwargs={"train": False},
    )
    step, _ = make_pointnet_seg_step()
    state, _ = step(state, pts, gt)
    state, _ = step(state, pts, gt)

    path = save_checkpoint(state, os.path.join(str(tmp_path), "ckpt"))

    fresh = create_train_state(
        model, tx, jax.random.PRNGKey(1), jnp.zeros((B, N, 3)),
        init_kwargs={"train": False},
    )
    restored = restore_checkpoint(fresh, path)
    assert int(restored.step) == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (strict superset of reference save-only)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state),
        jax.tree_util.tree_leaves(restored.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_streaming_step_matches_search_step():
    """The streaming train/eval steps (fixed per-cloud voxel sizes) are
    bit-identical to the searching steps when the sizes come from the
    search itself — the tools/train.py --streaming contract."""
    from ndtpu.preprocessing.batch import ndt_preprocessing_with_state

    pts, gt = make_batch()
    model = NDTNetSegmentation(num_classes=C, feature_dim=32)
    tx = optax.adam(1e-2)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((B, M, 3)),
        jnp.zeros((B, M, 9)), init_kwargs={"train": False},
    )
    step, eval_step = make_ndt_seg_step(M, C, False, "fast")

    _, _, _, _, st = ndt_preprocessing_with_state(
        M, pts, None, C, False, "fast"
    )
    sizes = st.voxel_size

    s_search, m_search = step(state, pts, gt)
    s_stream, m_stream = step(state, pts, gt, sizes)
    assert float(m_search["loss"]) == float(m_stream["loss"])
    assert float(m_search["accuracy"]) == float(m_stream["accuracy"])
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(s_search.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(s_stream.params)[0]),
    )
    e_search = eval_step(s_search, pts, gt)
    e_stream = eval_step(s_search, pts, gt, sizes)
    assert float(e_search["loss"]) == float(e_stream["loss"])


def test_epoch_scan_matches_per_step_loop():
    """One compiled lax.scan epoch (make_epoch_scan over a device-resident
    dataset) must reproduce the per-step loop's state and metrics: the
    batch schedule is shared, so only the loop mechanics differ."""
    from ndtpu.train.loop import make_epoch_scan, run_epoch_scan

    class _DS:
        def __init__(self, pts, gt):
            self.samples = [(np.asarray(pts[i]), np.asarray(gt[i]))
                            for i in range(pts.shape[0])]

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, i):
            return self.samples[i]

    pts0, gt0 = make_batch(0)
    pts1, gt1 = make_batch(1)
    pts = jnp.concatenate([pts0, pts1])
    gt = jnp.concatenate([gt0, gt1])

    model = NDTNetSegmentation(num_classes=C, feature_dim=32)
    tx = optax.adam(1e-3)

    def fresh_state():
        return create_train_state(
            model, tx, jax.random.PRNGKey(0),
            jnp.zeros((B, M, 3)), jnp.zeros((B, M, 9)),
            init_kwargs={"train": False},
        )

    step, eval_step = make_ndt_seg_step(M, C)

    # per-step loop over the same 2-batch schedule
    st_loop = fresh_state()
    losses = []
    for s in range(2):
        st_loop, m = step(st_loop, pts[s * B:(s + 1) * B],
                          gt[s * B:(s + 1) * B])
        losses.append(float(m["loss"]))

    from ndtpu.data.loader import DeviceCachedDataset

    ds = DeviceCachedDataset(_DS(pts, gt))
    epoch_fn = make_epoch_scan(step, train=True)
    st_scan, metrics = run_epoch_scan(epoch_fn, fresh_state(), ds, B,
                                      shuffle=False)
    assert abs(metrics["mean_loss"] - float(np.mean(losses))) < 1e-5
    assert abs(metrics["last_loss"] - losses[-1]) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(st_loop.params),
                    jax.tree_util.tree_leaves(st_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
