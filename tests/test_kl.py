"""KL divergence vs. a float64 NumPy oracle implementing the reference
formula (kullback_leibler.c:115 / core/kullback_leibler.py:55-62), including
its +ln(det p / det q) sign quirk."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from ndtpu.core.kl import det3, adjugate3, gaussian_kl, neighbor_min_kl


def lex_less(a, b):
    """Lexicographic a < b for int keys [..., 3] (most→least significant)."""
    return (
        (a[..., 0] < b[..., 0])
        | ((a[..., 0] == b[..., 0]) & (a[..., 1] < b[..., 1]))
        | (
            (a[..., 0] == b[..., 0])
            & (a[..., 1] == b[..., 1])
            & (a[..., 2] < b[..., 2])
        )
    )


def lex_search(sorted_keys, queries):
    """Vectorized lexicographic binary search (test oracle for locating
    voxel keys in the sorted occupied table; the production pipeline moved
    to adjacency sorts / searchsorted, so this lives with its test)."""
    k = sorted_keys.shape[0]
    m = queries.shape[0]
    lo = jnp.zeros((m,), jnp.int32)
    hi = jnp.full((m,), k, jnp.int32)
    steps = max(1, math.ceil(math.log2(max(k, 2))) + 1)
    for _ in range(steps):
        mid = (lo + hi) // 2
        kmid = sorted_keys[jnp.clip(mid, 0, k - 1)]
        less = lex_less(kmid, queries)
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    idx = jnp.clip(lo, 0, k - 1)
    found = (lo < k) & jnp.all(sorted_keys[idx] == queries, axis=-1)
    return idx, found


def reference_kl(mu_p, cov_p, mu_q, cov_q):
    diff = mu_q - mu_p
    q_inv = np.linalg.inv(cov_q)
    a = diff @ q_inv @ diff
    b = np.trace(q_inv @ cov_p)
    c = np.log(np.linalg.det(cov_p) / np.linalg.det(cov_q))
    return 0.5 * (a + b + c - 3.0)


def random_spd(rng):
    a = rng.normal(size=(3, 3))
    return a @ a.T + 0.5 * np.eye(3)


def test_det_and_adjugate():
    rng = np.random.default_rng(0)
    ms = rng.normal(size=(32, 3, 3))
    d = np.asarray(det3(jnp.asarray(ms, jnp.float32)))
    np.testing.assert_allclose(d, np.linalg.det(ms), rtol=1e-4, atol=1e-5)
    inv = np.asarray(adjugate3(jnp.asarray(ms, jnp.float32))) / d[:, None, None]
    np.testing.assert_allclose(inv, np.linalg.inv(ms), rtol=1e-3, atol=1e-3)


def test_gaussian_kl_matches_reference_formula():
    rng = np.random.default_rng(1)
    for _ in range(20):
        mu_p, mu_q = rng.normal(size=3), rng.normal(size=3)
        cov_p, cov_q = random_spd(rng), random_spd(rng)
        kl, ok = gaussian_kl(
            jnp.asarray(mu_p, jnp.float32), jnp.asarray(cov_p, jnp.float32),
            jnp.asarray(mu_q, jnp.float32), jnp.asarray(cov_q, jnp.float32),
        )
        assert bool(ok)
        np.testing.assert_allclose(
            float(kl), reference_kl(mu_p, cov_p, mu_q, cov_q), rtol=1e-4, atol=1e-4
        )


def test_identical_distributions_zero():
    mu = jnp.array([1.0, 2.0, 3.0])
    cov = jnp.asarray(random_spd(np.random.default_rng(2)), jnp.float32)
    kl, ok = gaussian_kl(mu, cov, mu, cov)
    assert bool(ok)
    assert abs(float(kl)) < 1e-4


def test_singular_masked():
    mu = jnp.zeros(3)
    sing = jnp.zeros((3, 3))
    good = jnp.eye(3)
    kl, ok = gaussian_kl(mu, sing, mu, good)
    assert not bool(ok) and np.isinf(float(kl))
    kl, ok = gaussian_kl(mu, good, mu, sing)
    assert not bool(ok)


def test_lex_search():
    keys = jnp.array(
        [[0, 0, 1], [0, 2, 0], [1, 0, 0], [1, 0, 5], [2, 1, 1]], jnp.int32
    )
    queries = jnp.array(
        [[0, 0, 1], [1, 0, 5], [2, 1, 1], [0, 0, 0], [3, 0, 0], [1, 0, 1]],
        jnp.int32,
    )
    idx, found = lex_search(keys, queries)
    idx, found = np.asarray(idx), np.asarray(found)
    assert found[0] and idx[0] == 0
    assert found[1] and idx[1] == 3
    assert found[2] and idx[2] == 4
    assert not found[3] and not found[4] and not found[5]


def test_neighbor_min_kl_two_voxels():
    """Two adjacent occupied voxels: each side's min KL is the pair KL."""
    rng = np.random.default_rng(3)
    cov_a, cov_b = random_spd(rng) * 0.01, random_spd(rng) * 0.01
    mu_a, mu_b = np.array([0.5, 0.5, 0.5]), np.array([1.5, 0.5, 0.5])
    k = 4
    means = jnp.zeros((k, 3), jnp.float32).at[0].set(jnp.asarray(mu_a, jnp.float32)).at[1].set(jnp.asarray(mu_b, jnp.float32))
    covs = jnp.zeros((k, 3, 3), jnp.float32).at[0].set(jnp.asarray(cov_a, jnp.float32)).at[1].set(jnp.asarray(cov_b, jnp.float32))
    counts = jnp.array([10, 10, 0, 0], jnp.int32)
    big = jnp.iinfo(jnp.int32).max
    # voxels (x,y,z)=(0,0,0) and (1,0,0) -> zyx keys (0,0,0),(0,0,1)
    zyx = jnp.array([[0, 0, 0], [0, 0, 1], [big, big, big], [big, big, big]], jnp.int32)
    lens = jnp.array([2, 1, 1], jnp.int32)

    min_kl, max_kl = neighbor_min_kl(means, covs, counts, zyx, lens)
    min_kl, max_kl = np.asarray(min_kl), np.asarray(max_kl)
    # single neighbor pair: min == max
    np.testing.assert_allclose(min_kl[:2], max_kl[:2], rtol=1e-6)
    np.testing.assert_allclose(
        min_kl[0], reference_kl(mu_a, cov_a, mu_b, cov_b), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        min_kl[1], reference_kl(mu_b, cov_b, mu_a, cov_a), rtol=1e-3, atol=1e-4
    )
    assert np.isinf(min_kl[2]) and np.isinf(min_kl[3])


def test_neighbor_min_kl_sample_gating():
    """Pairs with <=1 sample on either side are skipped
    (kullback_leibler.c:42-45)."""
    k = 2
    means = jnp.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5]], jnp.float32)
    covs = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * 0.01, (k, 3, 3))
    counts = jnp.array([10, 1], jnp.int32)
    zyx = jnp.array([[0, 0, 0], [0, 0, 1]], jnp.int32)
    lens = jnp.array([2, 1, 1], jnp.int32)
    min_kl, max_kl = neighbor_min_kl(means, covs, counts, zyx, lens)
    assert np.isinf(np.asarray(min_kl)).all()
    assert np.isinf(np.asarray(max_kl)).all()


def test_neighbor_min_kl_random_grid_vs_bruteforce():
    """Randomized occupied grids: the sorted-adjacency pairing must agree
    with a brute-force 6-neighbor oracle (f64 NumPy) on every segment."""
    rng = np.random.default_rng(7)
    big = np.iinfo(np.int32).max
    for trial in range(4):
        lens_np = rng.integers(2, 5, size=3)  # (len_x, len_y, len_z)
        all_cells = np.array(
            [
                (z, y, x)
                for z in range(lens_np[2])
                for y in range(lens_np[1])
                for x in range(lens_np[0])
            ],
            dtype=np.int32,
        )
        occ = rng.random(len(all_cells)) < 0.5
        occ_zyx = all_cells[occ]
        kk = len(occ_zyx)
        if kk < 2:
            continue
        k = kk + 3  # padding rows
        zyx = np.full((k, 3), big, np.int32)
        zyx[:kk] = occ_zyx  # all_cells is already lexicographic
        means = rng.normal(size=(k, 3)).astype(np.float32)
        covs = np.stack([random_spd(rng) * 0.1 for _ in range(k)]).astype(
            np.float32
        )
        counts = np.zeros(k, np.int32)
        counts[:kk] = rng.integers(2, 20, size=kk)
        counts[0] = 1  # exercise the sample gate

        min_kl, max_kl = neighbor_min_kl(
            jnp.asarray(means), jnp.asarray(covs), jnp.asarray(counts),
            jnp.asarray(zyx), jnp.asarray(lens_np, jnp.int32),
        )
        min_kl, max_kl = np.asarray(min_kl), np.asarray(max_kl)

        index = {tuple(c): i for i, c in enumerate(occ_zyx)}
        for i, (z, y, x) in enumerate(occ_zyx):
            vals = []
            for dz, dy, dx in [(0, 0, 1), (0, 0, -1), (0, 1, 0),
                               (0, -1, 0), (1, 0, 0), (-1, 0, 0)]:
                j = index.get((z + dz, y + dy, x + dx))
                if j is None or counts[i] <= 1 or counts[j] <= 1:
                    continue
                vals.append(
                    reference_kl(
                        means[i].astype(np.float64), covs[i].astype(np.float64),
                        means[j].astype(np.float64), covs[j].astype(np.float64),
                    )
                )
            if vals:
                np.testing.assert_allclose(
                    min_kl[i], min(vals), rtol=2e-3, atol=1e-4,
                    err_msg=f"trial {trial} seg {i} min",
                )
                np.testing.assert_allclose(
                    max_kl[i], max(vals), rtol=2e-3, atol=1e-4,
                    err_msg=f"trial {trial} seg {i} max",
                )
            else:
                assert np.isposinf(min_kl[i]) and np.isneginf(max_kl[i])
        assert np.isposinf(min_kl[kk:]).all()


def test_kl_inverse_permutation_modes_agree(monkeypatch):
    """NDTPU_KL_INV=scatter (r4 default: unique-index scatter-set) and
    =argsort (r3 path: K-row argsort + gather) are two routings of the same
    inverse permutation and must agree bitwise on every segment."""
    rng = np.random.default_rng(11)
    big = np.iinfo(np.int32).max
    lens_np = np.array([4, 3, 3], np.int64)
    all_cells = np.array(
        [
            (z, y, x)
            for z in range(lens_np[2])
            for y in range(lens_np[1])
            for x in range(lens_np[0])
        ],
        dtype=np.int32,
    )
    occ_zyx = all_cells[rng.random(len(all_cells)) < 0.6]
    kk = len(occ_zyx)
    k = kk + 2
    zyx = np.full((k, 3), big, np.int32)
    zyx[:kk] = occ_zyx
    means = rng.normal(size=(k, 3)).astype(np.float32)
    covs = np.stack([random_spd(rng) * 0.1 for _ in range(k)]).astype(
        np.float32
    )
    counts = np.zeros(k, np.int32)
    counts[:kk] = rng.integers(2, 20, size=kk)
    args = (jnp.asarray(means), jnp.asarray(covs), jnp.asarray(counts),
            jnp.asarray(zyx), jnp.asarray(lens_np, jnp.int32))
    monkeypatch.setenv("NDTPU_KL_INV", "scatter")
    mn_s, mx_s = neighbor_min_kl(*args)
    monkeypatch.setenv("NDTPU_KL_INV", "argsort")
    mn_a, mx_a = neighbor_min_kl(*args)
    np.testing.assert_array_equal(np.asarray(mn_s), np.asarray(mn_a))
    np.testing.assert_array_equal(np.asarray(mx_s), np.asarray(mx_a))


def test_singularity_mask_rel_eps_vs_reference_zero_compare():
    """The one deliberate semantic deviation from the reference
    (kullback_leibler.c:66-78 compares det == 0 exactly): a rank-deficient
    covariance — e.g. a voxel whose points lie on a plane — has true det 0,
    but its *floating-point* det is a tiny nonzero rounding residue, so the
    reference's exact-zero check essentially never fires and the resulting
    KL is unstable garbage. ndtpu's scale-aware |det| > rel_eps*(tr/3)^3
    mask must (a) catch such matrices where ==0 does not, (b) be identical
    under f32 and f64, (c) keep well-conditioned tiny covariances defined
    (scale-invariance)."""
    from ndtpu.core.kl import gaussian_kl

    rng = np.random.default_rng(17)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    # rank-2: points on a plane through the voxel
    deficient64 = q @ np.diag([3e-2, 1e-2, 0.0]) @ q.T
    deficient32 = deficient64.astype(np.float32)

    # (a) floating-point det is NOT exactly zero -> the reference's ==0
    # compare would pass the matrix through to an unstable inverse
    from ndtpu.core.kl import det3

    d32 = float(det3(jnp.asarray(deficient32)))
    assert d32 != 0.0
    assert abs(d32) < 1e-9  # pure rounding residue

    mu = jnp.zeros((3,))
    good = jnp.asarray(random_spd(np.random.default_rng(1)) * 1e-2,
                       jnp.float32)

    kl32, ok32 = gaussian_kl(mu, jnp.asarray(deficient32), mu, good)
    assert not bool(ok32) and np.isinf(float(kl32))
    kl32q, ok32q = gaussian_kl(mu, good, mu, jnp.asarray(deficient32))
    assert not bool(ok32q)

    # (b) dtype stability: identical verdict under f64
    with jax.enable_x64(True):
        kl64, ok64 = gaussian_kl(
            jnp.zeros((3,), jnp.float64), jnp.asarray(deficient64),
            jnp.zeros((3,), jnp.float64), jnp.asarray(np.asarray(good),
                                                      jnp.float64),
        )
        assert bool(ok64) == bool(ok32)

    # (c) scale-awareness: a tiny but full-rank anisotropic covariance
    # stays defined (an absolute epsilon would mask it)
    tiny = q @ np.diag([4e-4, 1e-4, 0.5e-4]) @ q.T
    klt, okt = gaussian_kl(mu, jnp.asarray(tiny, jnp.float32), mu, good)
    assert bool(okt) and np.isfinite(float(klt))


def test_prune_ranking_stable_with_planar_voxel():
    """End-to-end: a cloud containing an exactly-planar cluster (rank-2
    voxel covariance) must produce a deterministic prune — the masked pair
    sorts last instead of injecting noise-det KL values into the ranking."""
    from ndtpu.core.ndt import ndt_downsample

    rng = np.random.default_rng(23)
    solid = rng.normal(size=(512, 3)).astype(np.float32)
    planar = np.stack(
        [rng.uniform(-0.4, 0.4, 128), rng.uniform(-0.4, 0.4, 128),
         np.zeros(128)], axis=1,
    ).astype(np.float32) + np.float32(4.0)
    pts = jnp.asarray(np.concatenate([solid, planar]))

    a = ndt_downsample(pts, 16)
    b = ndt_downsample(pts, 16)
    for xa, xb in zip(a[:4], b[:4]):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    # the planar voxel's pair KLs are masked -> inf min_kl never wins prune
    state = a[4]
    assert bool(jnp.any(jnp.isinf(state.min_kl[state.counts > 0])))


def test_kl_payload_mode_matches_gather_mode(monkeypatch):
    """NDTPU_KL_MODE=payload (r5 default: moments ride the two K-row
    re-sorts as payload; zero segment gathers) must agree BITWISE with
    =gather (the r3/r4 composition) on every segment: the sort keys are
    unique for valid rows, stable-sort padding ties reproduce the explicit
    idx tie-break, and the mirrored covariance entries are bit-equal, so
    the two modes evaluate identical f32 expressions."""
    rng = np.random.default_rng(29)
    big = np.iinfo(np.int32).max
    lens_np = np.array([5, 4, 3], np.int64)
    all_cells = np.array(
        [
            (z, y, x)
            for z in range(lens_np[2])
            for y in range(lens_np[1])
            for x in range(lens_np[0])
        ],
        dtype=np.int32,
    )
    occ_zyx = all_cells[rng.random(len(all_cells)) < 0.55]
    kk = len(occ_zyx)
    k = kk + 3
    zyx = np.full((k, 3), big, np.int32)
    zyx[:kk] = occ_zyx
    means = rng.normal(size=(k, 3)).astype(np.float32)
    covs = np.stack([random_spd(rng) * 0.1 for _ in range(k)]).astype(
        np.float32
    )
    # exercise the singularity mask too: one rank-deficient covariance
    covs[2] = np.outer([1.0, 2.0, 0.5], [1.0, 2.0, 0.5]).astype(np.float32)
    counts = np.zeros(k, np.int32)
    counts[:kk] = rng.integers(1, 20, size=kk)  # include <=1-sample gating
    args = (jnp.asarray(means), jnp.asarray(covs), jnp.asarray(counts),
            jnp.asarray(zyx), jnp.asarray(lens_np, jnp.int32))
    monkeypatch.setenv("NDTPU_KL_MODE", "payload")
    mn_p, mx_p = neighbor_min_kl(*args)
    monkeypatch.setenv("NDTPU_KL_MODE", "gather")
    mn_g, mx_g = neighbor_min_kl(*args)
    np.testing.assert_array_equal(np.asarray(mn_p), np.asarray(mn_g))
    np.testing.assert_array_equal(np.asarray(mx_p), np.asarray(mx_g))
