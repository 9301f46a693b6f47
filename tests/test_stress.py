"""Stress/robustness tests mirroring the reference's C harness
(`core_legacy/tests/ndt_downsample.c:14-68`: 90k random points → 24 NDs,
repeated) plus classification datasets."""
import jax.numpy as jnp
import numpy as np
import pytest

from ndtpu.core.ndt import ndt_downsample, ndt_prune
from ndtpu.data.classification import SyntheticCls
from ndtpu.data.synthetic import random_cloud


@pytest.mark.slow
def test_stress_90k_to_24():
    """The reference's stress workload, exact shape (ndt_downsample.c:5-13):
    90,000 uniform random points, 24 desired NDs, repeated runs; bit-wise
    deterministic where the threaded reference is not."""
    pts = jnp.asarray(random_cloud(90000, seed=0))
    outs = []
    for _ in range(3):  # reference loops 10x; 3 is enough to catch drift
        pcl, covs, labels, mask, state = ndt_downsample(pts, 24)
        outs.append(np.asarray(pcl))
        assert int(mask.sum()) == 24
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_prune_order_variants():
    # dense uniform cloud -> occupied voxels are grid-adjacent with several
    # neighbors each, so min- and max-KL rankings genuinely differ
    pts = random_cloud(8000, extent=10.0, seed=3)
    a = ndt_downsample(jnp.asarray(pts), 24, prune_order="ascending")
    c = ndt_downsample(jnp.asarray(pts), 24, prune_order="legacy_c")
    assert int(a[3].sum()) == 24 and int(c[3].sum()) == 24
    # the two orders must disagree on which NDs survive (different sets)
    sa = {tuple(np.round(r, 4)) for r in np.asarray(a[0], np.float64)}
    sc = {tuple(np.round(r, 4)) for r in np.asarray(c[0], np.float64)}
    assert sa != sc

    # prefix property holds for the legacy order too
    _, _, _, m2 = ndt_prune(c[4], 12, prune_order="legacy_c")
    assert int(m2.sum()) == 12


def test_fast_search_lands_in_band():
    """search='fast' must satisfy the same acceptance criterion as the
    reference bisection: num_valid in [n, 1.2n] when feasible."""
    for seed, n_desired in [(0, 24), (1, 100), (2, 50)]:
        pts = random_cloud(6000, extent=15.0, seed=seed)
        out = ndt_downsample(jnp.asarray(pts), n_desired, search="fast")
        state = out[4]
        assert bool(state.converged), f"seed {seed} did not converge"
        nv = int(state.num_valid)
        assert n_desired <= nv <= int(n_desired * 1.2) + 1
        assert int(out[3].sum()) == n_desired


def test_fixed_voxel_size_skips_search():
    pts = random_cloud(4000, extent=12.0, seed=4)
    ref = ndt_downsample(jnp.asarray(pts), 32)
    vs = ref[4].voxel_size
    out = ndt_downsample(jnp.asarray(pts), 32, fixed_voxel_size=vs)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]), atol=1e-5)
    assert int(out[3].sum()) == 32


def test_degenerate_clouds():
    # all points identical -> 1 occupied voxel, zero covariance
    pts = jnp.broadcast_to(jnp.array([1.0, 2.0, 3.0]), (128, 3))
    pcl, covs, labels, mask, state = ndt_downsample(pts, 4)
    assert int(mask.sum()) == 1
    np.testing.assert_allclose(np.asarray(pcl)[0], [1.0, 2.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(covs)[0], 0.0, atol=1e-6)

    # coplanar cloud (z = 0): degenerate z-extent must not crash
    rng = np.random.default_rng(1)
    flat = np.concatenate(
        [rng.normal(size=(256, 2)), np.zeros((256, 1))], axis=1
    ).astype(np.float32)
    pcl, covs, labels, mask, state = ndt_downsample(jnp.asarray(flat), 16)
    assert int(mask.sum()) >= 1


def test_synthetic_classification_dataset():
    ds = SyntheticCls(n_points=256, length=16, seed=0)
    pts, label = ds[3]
    assert pts.shape == (256, 3) and 0 <= label < ds.n_classes
    # deterministic
    pts2, label2 = ds[3]
    np.testing.assert_array_equal(pts, pts2)
    assert label == label2
    # all classes appear
    labels = {ds[i][1] for i in range(16)}
    assert len(labels) == 8
