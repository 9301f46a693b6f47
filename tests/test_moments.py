"""Gaussian moment kernel vs. a float64 NumPy oracle.

The oracle computes the exact biased per-voxel mean and covariance — the
documented intent of the reference's Welford scatter
(normal_distributions.c:82-103; the diagonal matches it exactly, the
off-diagonal fixes its running-update approximation). Also checks
determinism: the threaded reference cannot guarantee bit-identical reruns,
the reduction formulation must.
"""
import jax.numpy as jnp
import numpy as np

from ndtpu.core.moments import finalize_moments, segment_moments


def oracle(points, seg_ids, k):
    means = np.zeros((k, 3))
    covs = np.zeros((k, 3, 3))
    counts = np.zeros((k,), np.int64)
    for s in range(k):
        sel = points[seg_ids == s]
        counts[s] = len(sel)
        if len(sel) == 0:
            continue
        mu = sel.mean(axis=0)
        means[s] = mu
        d = sel - mu
        covs[s] = (d.T @ d) / len(sel)  # biased /n, normal_distributions.c:86
    return means, covs, counts


def run_kernel(points, seg_ids, k):
    pts = jnp.asarray(points, jnp.float32)
    mom = segment_moments(
        pts, jnp.zeros_like(pts), jnp.asarray(seg_ids, jnp.int32), k
    )
    means, covs = finalize_moments(
        mom["counts"], mom["sum_shift"], mom["sum_outer"], jnp.zeros((k, 3))
    )
    return mom, np.asarray(means), np.asarray(covs)


def test_moments_match_oracle():
    rng = np.random.default_rng(0)
    n, k = 500, 17
    seg = np.sort(rng.integers(0, k, n))
    pts = rng.normal(size=(n, 3))
    mom, means, covs = run_kernel(pts, seg, k)
    o_means, o_covs, o_counts = oracle(pts, seg, k)
    np.testing.assert_array_equal(np.asarray(mom["counts"]), o_counts)
    np.testing.assert_allclose(means, o_means, atol=1e-5)
    np.testing.assert_allclose(covs, o_covs, atol=1e-5)


def test_center_shift_preserves_moments_far_from_origin():
    """fp32 moments of a far-from-origin cloud only survive via the
    voxel-center shift (SURVEY.md §7 'fp64→fp32' hard part)."""
    rng = np.random.default_rng(1)
    n, k = 256, 4
    seg = np.sort(rng.integers(0, k, n))
    base = np.array([1000.0, -2000.0, 500.0])
    pts = base + rng.normal(scale=0.1, size=(n, 3))
    centers = np.broadcast_to(base, (n, 3)).copy()

    mom = segment_moments(
        jnp.asarray(pts, jnp.float32), jnp.asarray(centers, jnp.float32),
        jnp.asarray(seg, jnp.int32), k,
    )
    means, covs = finalize_moments(
        mom["counts"], mom["sum_shift"], mom["sum_outer"],
        jnp.asarray(centers[:1].repeat(k, 0), jnp.float32),
    )
    o_means, o_covs, _ = oracle(pts, seg, k)
    np.testing.assert_allclose(np.asarray(means), o_means, rtol=1e-6)
    # covariance entries are ~1e-2; unshifted fp32 would be garbage here
    np.testing.assert_allclose(np.asarray(covs), o_covs, rtol=1e-3, atol=1e-6)


def test_invalid_rows_and_overflow_segments_dropped():
    pts = np.ones((8, 3))
    seg = np.array([0, 0, 1, 1, 2, 2, 2, 2], np.int32)
    valid = jnp.array([True] * 6 + [False] * 2)
    # k=2: segment 2 must be dropped entirely, invalid rows zero-weighted
    mom = segment_moments(
        jnp.asarray(pts, jnp.float32), jnp.zeros((8, 3), jnp.float32),
        jnp.where(jnp.asarray(seg) >= 2, 2, jnp.asarray(seg)), 2, valid=valid,
    )
    np.testing.assert_array_equal(np.asarray(mom["counts"]), [2, 2])


def test_class_histogram_majority():
    """Majority-vote class per voxel (normal_distributions.c:107-121);
    ties resolve to the lowest tag, like the reference's argmax scan."""
    pts = np.zeros((6, 3))
    seg = np.array([0, 0, 0, 1, 1, 1], np.int32)
    classes = np.array([2, 2, 1, 0, 3, 3], np.int32)
    mom = segment_moments(
        jnp.asarray(pts, jnp.float32), jnp.zeros((6, 3), jnp.float32),
        jnp.asarray(seg), 2, classes=jnp.asarray(classes), num_class_slots=4,
    )
    hist = np.asarray(mom["class_hist"])
    np.testing.assert_array_equal(hist[0], [0, 1, 2, 0])
    np.testing.assert_array_equal(hist[1], [1, 0, 0, 2])
    assert hist[0].argmax() == 2 and hist[1].argmax() == 3


def test_determinism():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    seg = np.sort(rng.integers(0, 31, 1000)).astype(np.int32)
    a = segment_moments(jnp.asarray(pts), jnp.zeros_like(jnp.asarray(pts)), jnp.asarray(seg), 31)
    b = segment_moments(jnp.asarray(pts), jnp.zeros_like(jnp.asarray(pts)), jnp.asarray(seg), 31)
    np.testing.assert_array_equal(np.asarray(a["sum_outer"]), np.asarray(b["sum_outer"]))
