"""Multi-device tests on the virtual 8-device CPU mesh.

What the reference cannot do at all (SURVEY.md §2.3: no distributed
anything): batch-sharded train steps with XLA-inserted collectives, and
the exact point-sharded moment reduction.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ndtpu.core import voxel as vx
from ndtpu.core.moments import segment_moments
from ndtpu.core.ndt import ndt_downsample
from ndtpu.models import NDTNetSegmentation
from ndtpu.parallel.mesh import batch_sharding, make_mesh, replicate, shard_batch
from ndtpu.parallel.point_sharded import (
    sharded_count_occupied,
    sharded_segment_moments,
)
from ndtpu.preprocessing.batch import ndt_preprocessing_with_state
from ndtpu.train.loop import make_ndt_seg_step
from ndtpu.train.state import create_train_state


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_batch_sharded_preprocessing_matches_single_device():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(8, 256, 3)).astype(np.float32) * 2.0
    mesh = make_mesh(("data",))
    sharded = shard_batch(mesh, jnp.asarray(pts))
    out_sh = ndt_preprocessing_with_state(16, sharded, None, 0)
    out_rep = ndt_preprocessing_with_state(16, jnp.asarray(pts), None, 0)
    np.testing.assert_allclose(
        np.asarray(out_sh[0]), np.asarray(out_rep[0]), atol=1e-5
    )


@pytest.mark.slow
def test_batch_sharded_train_step():
    """Full DP train step: batch sharded on the mesh, params replicated;
    grads/BN stats reduced by XLA collectives. Loss must match the
    unsharded step bit-for-bit-ish."""
    rng = np.random.default_rng(1)
    B, N, C, M = 8, 128, 4, 12
    centers = rng.uniform(-3, 3, size=(16, 3))
    pts = np.stack(
        [
            (centers[:, None, :] + rng.normal(scale=0.2, size=(16, 8, 3)))
            .reshape(-1, 3)[:N]
            * (1 + 0.1 * b)
            for b in range(B)
        ]
    ).astype(np.float32)
    labels = (pts[..., 0] > 0).astype(np.int64) + 1
    gt = np.eye(C + 1, dtype=np.float32)[labels]

    model = NDTNetSegmentation(num_classes=C, feature_dim=32)
    tx = optax.adam(1e-3)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        jnp.zeros((B, M, 3)), jnp.zeros((B, M, 9)),
        init_kwargs={"train": False},
    )
    step, _ = make_ndt_seg_step(M, C)

    # unsharded
    _, m_ref = step(state, jnp.asarray(pts), jnp.asarray(gt))

    mesh = make_mesh(("data",))
    state_sh = replicate(mesh, state)
    pts_sh, gt_sh = shard_batch(mesh, (jnp.asarray(pts), jnp.asarray(gt)))
    new_state, m_sh = step(state_sh, pts_sh, gt_sh)
    np.testing.assert_allclose(
        float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_sh["accuracy"]), float(m_ref["accuracy"]), rtol=1e-5
    )

    # the production configuration: preprocessing pinned with shard_map
    # (zero preprocessing collectives — tests/test_collectives.py); the
    # numbers must match the GSPMD and unsharded steps
    step_sm, _ = make_ndt_seg_step(M, C, mesh=mesh)
    _, m_sm = step_sm(state_sh, pts_sh, gt_sh)
    np.testing.assert_allclose(
        float(m_sm["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_sm["accuracy"]), float(m_ref["accuracy"]), rtol=1e-5
    )


def test_point_sharded_moments_exact():
    """psum of per-shard partial moments == single-device moments."""
    rng = np.random.default_rng(2)
    n, k_max = 1024, 32
    centers = rng.uniform(-4, 4, size=(20, 3))
    pts = (
        (centers[:, None, :] + rng.normal(scale=0.3, size=(20, 52, 3)))
        .reshape(-1, 3)[:n]
        .astype(np.float32)
    )
    mask = np.ones((n,), bool)
    voxel_size = jnp.float32(1.0)
    mins = jnp.asarray(pts.min(0))
    maxs = jnp.asarray(pts.max(0))
    lens, offsets = vx.estimate_voxel_grid(mins, maxs, voxel_size)

    mesh = make_mesh(("points",))
    out = sharded_segment_moments(
        mesh, jnp.asarray(pts), jnp.asarray(mask), voxel_size, lens, offsets,
        k_max,
    )

    # single-device oracle via the core path
    coords, _ = vx.metric_to_voxel_space(jnp.asarray(pts), voxel_size, lens, offsets)
    key = coords[:, ::-1]
    z, y, x, px, py, pz = jax.lax.sort(
        (key[:, 0], key[:, 1], key[:, 2],
         jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), jnp.asarray(pts[:, 2])),
        num_keys=3,
    )
    new_seg = jnp.ones((n,), bool).at[1:].set(
        (z[1:] != z[:-1]) | (y[1:] != y[:-1]) | (x[1:] != x[:-1])
    )
    seg = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
    pts_s = jnp.stack([px, py, pz], axis=1)
    centers_s = vx.voxel_to_metric_space(
        jnp.stack([x, y, z], axis=1), voxel_size, offsets
    )
    ref = segment_moments(pts_s, centers_s, jnp.minimum(seg, k_max), k_max)

    np.testing.assert_array_equal(
        np.asarray(out["counts"]), np.asarray(ref["counts"])
    )
    np.testing.assert_allclose(
        np.asarray(out["sum_shift"]), np.asarray(ref["sum_shift"]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["sum_outer"]), np.asarray(ref["sum_outer"]), atol=2e-4
    )

    cnt = sharded_count_occupied(
        mesh, jnp.asarray(pts), jnp.asarray(mask), voxel_size, lens, offsets,
        k_max,
    )
    assert int(cnt) == int((np.asarray(ref["counts"]) > 0).sum())


@pytest.mark.slow
def test_point_sharded_full_downsample_matches_single_device():
    """The whole giant-cloud pipeline (search + moments + KL + prune) on a
    point-sharded mesh must agree with single-device ndt_downsample."""
    from ndtpu.parallel.point_sharded import make_point_sharded_downsample

    rng = np.random.default_rng(5)
    centers = rng.uniform(-6, 6, size=(40, 3))
    pts = (
        (centers[:, None, :] + rng.normal(scale=0.3, size=(40, 26, 3)))
        .reshape(-1, 3)[:1024]
        .astype(np.float32)
    )
    n_desired = 24

    mesh = make_mesh(("points",))
    fn = make_point_sharded_downsample(mesh, n_desired)
    pcl_sh, covs_sh, labels_sh, mask_sh, state_sh = fn(jnp.asarray(pts))

    pcl, covs, labels, mask, state = ndt_downsample(jnp.asarray(pts), n_desired)
    assert int(mask_sh.sum()) == int(mask.sum()) == n_desired
    assert float(jnp.abs(state_sh.voxel_size - state.voxel_size)) < 1e-6
    np.testing.assert_allclose(
        np.asarray(pcl_sh), np.asarray(pcl), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(covs_sh), np.asarray(covs), atol=2e-4
    )


def test_point_sharded_outlier_cloud_reports_unconverged():
    """ADVICE r1 semantics must hold on the point-sharded path too: when
    the packed-envelope clamp coarsens the accepted size (dense cluster +
    km-scale outlier), converged flips to False instead of silently
    collapsing the output."""
    from ndtpu.parallel.point_sharded import make_point_sharded_downsample

    rng = np.random.default_rng(23)
    pts = rng.uniform(0.0, 1.0, size=(4096, 3)).astype(np.float32)
    pts[-1] = [4000.0, 4000.0, 4000.0]

    mesh = make_mesh(("points",))
    fn = make_point_sharded_downsample(mesh, 64)
    pcl, covs, labels, mask, state = fn(jnp.asarray(pts))
    assert not bool(state.converged)
    assert int(mask.sum()) < 64  # honest coarse output, flagged


def test_point_sharded_fast_search_matches_core_fast():
    """search="fast" on the point-sharded pipeline reuses the core secant
    state machine with the collective count — on a cloud where no packing
    envelope binds it must accept exactly the single-device fast search's
    voxel size and land in band (the r5 giant-pipeline search upgrade:
    1-2 collective counts instead of the blind midpoint bisection's ~5+).
    """
    from ndtpu.parallel.point_sharded import make_point_sharded_downsample

    rng = np.random.default_rng(9)
    centers = rng.uniform(-6, 6, size=(40, 3))
    pts = (
        (centers[:, None, :] + rng.normal(scale=0.3, size=(40, 26, 3)))
        .reshape(-1, 3)[:1024]
        .astype(np.float32)
    )
    n_desired = 24

    mesh = make_mesh(("points",))
    fn = make_point_sharded_downsample(mesh, n_desired, search="fast")
    pcl_sh, covs_sh, labels_sh, mask_sh, state_sh = fn(jnp.asarray(pts))

    _, _, _, mask_1, state_1 = ndt_downsample(
        jnp.asarray(pts), n_desired, search="fast"
    )
    assert bool(state_sh.converged)
    assert int(mask_sh.sum()) == n_desired
    assert float(jnp.abs(state_sh.voxel_size - state_1.voxel_size)) < 1e-6
    band_lo, band_hi = n_desired, int(n_desired * 1.2)
    assert band_lo <= int(state_sh.num_valid) <= band_hi
