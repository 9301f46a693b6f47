"""End-to-end NDT downsample tests.

Ports the semantic cases of `core_legacy/tests/test_ndt.cpp:5-127` (16-point
nested cube → 8/4/3 NDs, including perturbed clouds) and adds what the
reference lacks: a float64 NumPy oracle for the whole pipeline, two-stage
prune (the NDT-Net++ path), masking, and batching via vmap.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndtpu.core.ndt import (
    NDTSampler,
    max_segments,
    ndt_downsample,
    ndt_prune,
)

CUBE16 = np.array(
    [
        [-1.0, 1.0, -1.0], [1.0, -1.0, -1.0], [1.0, 1.0, -1.0], [-1.0, -1.0, -1.0],
        [-1.0, 1.0, 1.0], [1.0, -1.0, 1.0], [1.0, 1.0, 1.0], [-1.0, -1.0, 1.0],
        [-0.5, 0.5, -0.5], [0.5, -0.5, -0.5], [0.5, 0.5, -0.5], [-0.5, -0.5, -0.5],
        [-0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.5, 0.5, 0.5], [-0.5, -0.5, 0.5],
    ],
    dtype=np.float32,
)

CUBE16_PERTURBED = CUBE16.copy()
CUBE16_PERTURBED[3, 0] = -1.01
CUBE16_PERTURBED[8, 2] = -0.51
CUBE16_PERTURBED[12, 1] = 0.48
CUBE16_PERTURBED[14, 1] = 0.52


@pytest.mark.parametrize("cloud,target", [
    (CUBE16, 8),           # test_ndt.cpp:5-34
    (CUBE16, 4),           # test_ndt.cpp:36-65
    (CUBE16_PERTURBED, 4), # test_ndt.cpp:67-96
    (CUBE16, 3),           # test_ndt.cpp:98-127
])
def test_cube_downsample_counts(cloud, target):
    pcl, covs, labels, mask, state = ndt_downsample(jnp.asarray(cloud), target)
    assert int(mask.sum()) == target
    assert pcl.shape == (target, 3) and covs.shape == (target, 9)


def test_cube8_converged_geometry():
    """16→8 converges in-band following the exact C search trajectory
    (ndt.c:136-187 with ndt.h:38-43 constants): guesses 14.995 → 7.5025 →
    3.75625 → 1.883 land on a grid where voxel (0,0,0) holds the
    (-1,-1,-1) corner plus all 8 inner points and the other 7 corners sit
    alone — so the NDs are that 9-point cluster (mean -1/9) and 7 corners.
    """
    pcl, covs, labels, mask, state = ndt_downsample(jnp.asarray(CUBE16), 8)
    assert bool(state.converged)
    assert int(state.num_valid) == 8
    got = {tuple(np.round(r, 4)) for r in np.asarray(pcl, np.float64)}
    third = round(-1.0 / 9.0, 4)
    expected = {(third, third, third)} | {
        (float(sx), float(sy), float(sz))
        for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)
        if (sx, sy, sz) != (-1, -1, -1)
    }
    assert got == expected
    # 9-point voxel: biased variance per axis = 1/3 - 1/81 = 26/81
    c = np.asarray(covs).reshape(8, 3, 3)
    idx = int(np.argmax(np.abs(np.asarray(pcl) - (-1.0 / 9.0)).sum(1) < 1e-4))
    np.testing.assert_allclose(c[idx].diagonal(), 26.0 / 81.0, rtol=1e-4)


def test_unconverged_prune_path():
    """16→4 cannot land in [4, 4.8] (counts jump 8→1); the best guess (8)
    plus KL prune must still deliver exactly 4 valid NDs."""
    pcl, covs, labels, mask, state = ndt_downsample(jnp.asarray(CUBE16), 4)
    assert not bool(state.converged)
    assert int(state.num_valid) == 8
    assert int(mask.sum()) == 4


def oracle_pipeline(points, n_desired):
    """float64 oracle of the full documented pipeline for a FIXED voxel size
    reproduced from the converged binary search."""
    from ndtpu.core import ndt as nd

    # replicate the search on the oracle side
    mins, maxs = points.min(0), points.max(0)
    lo, hi = nd.MIN_VOXEL_GUESS, nd.MAX_VOXEL_GUESS
    guess = (hi - lo) / 2.0
    converged = False
    for _ in range(nd.MAX_GUESS_ITERATIONS):
        lens = np.maximum(np.ceil((maxs - mins) / guess), 1).astype(int)
        coords = np.clip(
            np.floor((points - mins) / guess).astype(int), 0, lens - 1
        )
        occ = {tuple(c) for c in coords}
        if len(occ) > n_desired * 1.2:
            lo = guess
        elif len(occ) < n_desired:
            hi = guess
        else:
            converged = True
            break
        guess = lo + (hi - lo) / 2.0
    assert converged

    groups = {}
    for p, c in zip(points, coords):
        groups.setdefault(tuple(c), []).append(p)
    keys = sorted(groups, key=lambda t: (t[2], t[1], t[0]))
    means = {k: np.mean(groups[k], axis=0) for k in keys}
    covs = {}
    for k in keys:
        d = np.asarray(groups[k]) - means[k]
        covs[k] = d.T @ d / len(groups[k])

    def ref_kl(p, q):
        dp, dq = np.linalg.det(covs[p]), np.linalg.det(covs[q])
        if len(groups[p]) <= 1 or len(groups[q]) <= 1 or dp == 0 or dq == 0:
            return None
        qi = np.linalg.inv(covs[q])
        diff = means[q] - means[p]
        return 0.5 * (diff @ qi @ diff + np.trace(qi @ covs[p]) + np.log(dp / dq) - 3)

    min_kl = {}
    for k in keys:
        best = np.inf
        for d in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)):
            nb = (k[0] + d[0], k[1] + d[1], k[2] + d[2])
            if nb in groups and all(0 <= nb[i] < lens[i] for i in range(3)):
                v = ref_kl(k, nb)
                if v is not None and np.isfinite(v):
                    best = min(best, v)
        min_kl[k] = best

    to_remove = len(keys) - n_desired
    removed = set(
        sorted(keys, key=lambda k: (min_kl[k], keys.index(k)))[:to_remove]
    )
    kept = [k for k in keys if k not in removed]
    return np.array([means[k] for k in kept]), np.array([covs[k] for k in kept])


def test_pipeline_matches_oracle_random_cloud():
    rng = np.random.default_rng(7)
    # clustered cloud so voxels get >1 sample and meaningful covariances
    centers = rng.uniform(-5, 5, size=(40, 3))
    pts = (centers[:, None, :] + rng.normal(scale=0.3, size=(40, 25, 3))).reshape(-1, 3).astype(np.float32)
    n_desired = 24

    pcl, covs, labels, mask, state = ndt_downsample(jnp.asarray(pts), n_desired)
    assert int(mask.sum()) == n_desired
    o_means, o_covs = oracle_pipeline(pts.astype(np.float64), n_desired)
    assert o_means.shape[0] == n_desired
    np.testing.assert_allclose(np.asarray(pcl), o_means, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(covs).reshape(-1, 3, 3), o_covs, rtol=1e-2, atol=1e-4
    )


def test_two_stage_prune_prefix_property():
    """prune(state, k2) after downsample(k1) equals downsampling straight to
    k2 with the same voxel size — removal is a prefix of one ranking
    (the NDT-Net++ mid-forward path, ndtnetpp.py:109)."""
    rng = np.random.default_rng(9)
    centers = rng.uniform(-5, 5, size=(40, 3))
    pts = (centers[:, None, :] + rng.normal(scale=0.3, size=(40, 25, 3))).reshape(-1, 3).astype(np.float32)

    pcl1, covs1, _, mask1, state = ndt_downsample(jnp.asarray(pts), 30)
    pcl2, covs2, _, mask2 = ndt_prune(state, 20)
    assert int(mask2.sum()) == 20
    # every surviving coarse ND is one of the fine NDs
    fine = {tuple(np.round(r, 4)) for r in np.asarray(pcl1)[np.asarray(mask1)]}
    for row in np.asarray(pcl2)[np.asarray(mask2)]:
        assert tuple(np.round(row, 4)) in fine


def test_classes_majority_vote():
    rng = np.random.default_rng(11)
    pts = np.concatenate(
        [
            rng.normal(loc=(0, 0, 0), scale=0.1, size=(30, 3)),
            rng.normal(loc=(5, 5, 5), scale=0.1, size=(30, 3)),
        ]
    ).astype(np.float32)
    classes = np.array([2] * 30 + [7] * 30, dtype=np.int32)
    pcl, covs, labels, mask, state = ndt_downsample(
        jnp.asarray(pts), 2, classes=jnp.asarray(classes), num_class_slots=9
    )
    got = sorted(np.asarray(labels)[np.asarray(mask)].tolist())
    assert got == [2, 7]


def test_mask_excludes_padding_points():
    rng = np.random.default_rng(13)
    real = rng.normal(size=(80, 3)).astype(np.float32)
    pad = np.full((20, 3), 1e6, np.float32)
    pts = np.concatenate([real, pad])
    mask = np.array([True] * 80 + [False] * 20)

    p1, _, _, m1, s1 = ndt_downsample(jnp.asarray(pts), 10, mask=jnp.asarray(mask))
    p2, _, _, m2, s2 = ndt_downsample(jnp.asarray(real), 10)
    assert float(jnp.abs(s1.voxel_size - s2.voxel_size)) < 1e-6
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_vmap_batching():
    rng = np.random.default_rng(17)
    batch = rng.normal(size=(3, 200, 3)).astype(np.float32) * jnp.asarray(
        [1.0, 2.0, 4.0]
    )[:, None, None]

    f = jax.vmap(lambda p: ndt_downsample(p, 12)[0:4])
    pcl, covs, labels, mask = f(jnp.asarray(batch))
    assert pcl.shape == (3, 12, 3)
    for b in range(3):
        single = ndt_downsample(jnp.asarray(batch[b]), 12)[0]
        np.testing.assert_allclose(np.asarray(pcl[b]), np.asarray(single), atol=1e-5)


def test_sampler_wrapper_api():
    rng = np.random.default_rng(19)
    pts = rng.normal(size=(300, 3)) * 3.0
    classes = rng.integers(0, 5, 300).astype(np.uint16)
    s = NDTSampler(pts, classes, num_classes=5)
    pcl, covs, cls = s.downsample(16)
    assert pcl.shape == (16, 3) and covs.shape == (16, 9) and cls.shape == (16,)
    assert pcl.dtype == np.float64 and cls.dtype == np.uint16
    pcl2, covs2, cls2 = s.prune(8)
    assert pcl2.shape == (8, 3)
    s.cleanup()


def test_max_segments_band():
    assert max_segments(1000) >= 1200


def test_n_desired_exceeding_cloud_size():
    # k_max > N: the segment-start extraction must keep its static k_max
    # shape even when the cloud has fewer points than the ND capacity
    pts = jnp.asarray(CUBE16)  # 16 points, n_desired=16 -> k_max=27 > 16
    pcl, covs, labels, mask, state = ndt_downsample(pts, 16)
    assert pcl.shape == (16, 3)
    assert int(mask.sum()) <= 16
    # every emitted ND is one of the occupied voxels (all 16 points distinct)
    kept = np.asarray(pcl)[np.asarray(mask)]
    assert kept.shape[0] == int(state.num_valid) or kept.shape[0] == 16


def _outlier_cloud():
    """Dense 1 m cluster plus one 4 km GPS-glitch outlier: the grid that
    resolves the cluster has > 2^31 cells (unbuildable with one packed int32
    key) while len_z*len_y stays < 2^31 (buildable with the (zy, x) pair)."""
    rng = np.random.default_rng(23)
    pts = rng.uniform(0.0, 1.0, size=(4096, 3)).astype(np.float32)
    return np.concatenate(
        [pts, np.array([[4000.0, 4000.0, 4000.0]], np.float32)]
    )


def test_outlier_cloud_packed_reports_unconverged():
    # ADVICE r1 (high): the packed-key search must clamp its lower bound to
    # the buildable envelope and report converged=False instead of accepting
    # an unbuildable size and silently coarsening post-hoc.
    pts = jnp.asarray(_outlier_cloud())
    pcl, covs, labels, mask, state = ndt_downsample(pts, 64)
    assert not bool(state.converged)
    # the emitted NDs are consistent with the REPORTED voxel size (coarse
    # grid -> only a handful of occupied voxels), not with a phantom finer one
    assert int(state.num_valid) == int(mask.sum()) < 64


def test_outlier_cloud_pair_mode_converges():
    # key_mode="pair" extends the exact envelope to len_z*len_y < 2^31 grids:
    # the same cloud lands in the acceptance band and yields all 64 NDs.
    pts = jnp.asarray(_outlier_cloud())
    pcl, covs, labels, mask, state = ndt_downsample(pts, 64, key_mode="pair")
    assert bool(state.converged)
    assert int(mask.sum()) == 64
    # the outlier voxel contains exactly one point: its ND mean is the point
    kept = np.asarray(pcl)[np.asarray(mask)]
    d = np.linalg.norm(kept - np.array([4000.0, 4000.0, 4000.0]), axis=1)
    assert d.min() < 1e-2


def test_pair_mode_matches_packed_on_ordinary_cloud():
    rng = np.random.default_rng(29)
    pts = jnp.asarray(rng.normal(size=(512, 3)).astype(np.float32) * 2.0)
    a = ndt_downsample(pts, 24)
    b = ndt_downsample(pts, 24, key_mode="pair")
    for xa, xb in zip(a[:4], b[:4]):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_fixed_voxel_size_clamp_flags_unconverged():
    pts = jnp.asarray(_outlier_cloud())
    # requesting a size below the packed envelope gets clamped -> flagged
    out = ndt_downsample(pts, 64, fixed_voxel_size=jnp.float32(0.3))
    assert not bool(out[4].converged)
    # an in-envelope request stays converged
    out2 = ndt_downsample(pts, 64, fixed_voxel_size=jnp.float32(8.0))
    assert bool(out2[4].converged)


def test_empty_state_matches_downsample_shapes():
    """empty_state must stay in lockstep with what ndt_downsample returns
    (it is the flax-init template for the multiscale trainer)."""
    from ndtpu.core.ndt import empty_state

    for slots in (1, 5):
        real = jax.eval_shape(
            lambda p: ndt_downsample(p, 24, classes=jnp.zeros((100,), jnp.int32),
                                     num_class_slots=slots)[4],
            jax.ShapeDtypeStruct((100, 3), jnp.float32),
        )
        tmpl = empty_state(24, slots)
        rt = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), real)
        tt = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), tmpl)
        assert rt == tt
        batched = empty_state(24, slots, batch=3)
        assert batched.means.shape == (3,) + tmpl.means.shape
        assert batched.voxel_size.shape == (3,)


def test_grid_search_lands_in_band():
    """search="grid" must satisfy the same acceptance semantics as the
    reference bisection: converged runs land in [n, 1.2n] occupied voxels
    and the emitted count is exactly n."""
    rng = np.random.default_rng(31)
    for seed in range(3):
        pts = jnp.asarray(
            (rng.normal(size=(800, 3)) * (1.5 + seed)).astype(np.float32)
        )
        pcl, covs, labels, mask, state = ndt_downsample(pts, 40, search="grid")
        assert bool(state.converged)
        assert 40 <= int(state.num_valid) <= 48
        assert int(mask.sum()) == 40


def test_grid_search_outlier_cloud_semantics():
    # packed mode: envelope clamp binds -> honest converged=False
    pts = jnp.asarray(_outlier_cloud())
    out = ndt_downsample(pts, 64, search="grid")
    assert not bool(out[4].converged)
    # pair mode: exact, lands in band
    out2 = ndt_downsample(pts, 64, search="grid", key_mode="pair")
    assert bool(out2[4].converged)
    assert int(out2[3].sum()) == 64


def test_fused_search_matches_unfused_trajectory():
    """_search_and_sort_fast (production) must accept exactly the same
    voxel size as _search_voxel_size_fast (the unfused measurement twin) —
    the payload fusion may not perturb the secant trajectory."""
    from ndtpu.core import voxel as vx
    from ndtpu.core.ndt import (
        _min_packable_voxel_size,
        _search_and_sort_fast,
        _search_voxel_size_fast,
    )

    rng = np.random.default_rng(41)
    for i, (n, scale) in enumerate([(500, 1.0), (1200, 6.0), (900, 0.2)]):
        pts = jnp.asarray((rng.normal(size=(n, 3)) * scale).astype(np.float32))
        px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
        mask = jnp.ones((n,), bool)
        classes = jnp.zeros((n,), jnp.int32)
        mins, maxs = vx.pointcloud_limits(pts, mask)
        env = _min_packable_voxel_size(mins, maxs)
        vs_u, conv_u = _search_voxel_size_fast(
            px, py, pz, mask, 40, mins, maxs, lo_min=env
        )
        vs_f, conv_f, cols = _search_and_sort_fast(
            px, py, pz, mask, classes, 40, mins, maxs,
            lo_min=env, tagged=False, key_mode="packed",
        )
        assert float(vs_u) == float(vs_f), (i, float(vs_u), float(vs_f))
        assert bool(conv_u) == bool(conv_f)
        # the carried sort is at exactly the returned size
        resorted = jax.lax.sort(
            (jnp.asarray(cols[0]),) , num_keys=1
        )[0]
        np.testing.assert_array_equal(np.asarray(cols[0]), np.asarray(resorted))


def test_warm_start_in_band_seed_matches_searched():
    """Seeding the fast search with its own accepted size must reproduce
    the searched output exactly (the first evaluation lands in band and is
    accepted), and a garbage seed must still converge to an in-band size
    — band monitoring makes warm start self-healing (ndt.c:136-187 is the
    per-cloud cost being amortized)."""
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.normal(size=(1024, 3)).astype(np.float32) * 3.0)
    ref = ndt_downsample(pts, 48, search="fast")
    seeded = ndt_downsample(
        pts, 48, search="fast", warm_start_size=ref[4].voxel_size
    )
    assert float(seeded[4].voxel_size) == float(ref[4].voxel_size)
    np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(seeded[3]))
    np.testing.assert_allclose(
        np.asarray(ref[0]), np.asarray(seeded[0]), rtol=0, atol=0
    )
    # stale/garbage seed: band still enforced, output count still in band
    stale = ndt_downsample(pts, 48, search="fast",
                           warm_start_size=jnp.float32(25.0))
    assert bool(stale[4].converged)
    assert 48 <= int(stale[4].num_valid) <= int(48 * 1.2)


def test_probe_search_lands_in_band():
    """search="probe" (Chao1-probe-seeded cold search, the r5 sort-stage
    lever) must satisfy the same acceptance semantics as "fast": converged
    runs land in [n, 1.2n] occupied voxels, emit exactly n, and the run is
    deterministic. The accepted size may differ from "fast" (a different
    in-band point — the contract is the band, ndt.h:38), but a warm seed
    must take precedence over the probe and reproduce the fast path's
    warm behavior exactly."""
    rng = np.random.default_rng(41)
    for seed in range(3):
        pts = jnp.asarray(
            (rng.normal(size=(900, 3)) * (1.0 + seed)).astype(np.float32)
        )
        pcl, covs, labels, mask, state = ndt_downsample(
            pts, 40, search="probe"
        )
        assert bool(state.converged)
        assert 40 <= int(state.num_valid) <= 48
        assert int(mask.sum()) == 40
        again = ndt_downsample(pts, 40, search="probe")
        np.testing.assert_array_equal(np.asarray(pcl), np.asarray(again[0]))
    # warm seed takes precedence over the probe: identical to fast+warm
    pts = jnp.asarray(rng.normal(size=(1024, 3)).astype(np.float32) * 3.0)
    ref = ndt_downsample(pts, 48, search="fast")
    seeded = ndt_downsample(
        pts, 48, search="probe", warm_start_size=ref[4].voxel_size
    )
    assert float(seeded[4].voxel_size) == float(ref[4].voxel_size)
    np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(seeded[3]))


def test_probe_search_batched_clustered():
    """Batched (vmapped) probe search on cluster-structured clouds — the
    distribution whose geometric-mean seed always misses the band (the
    case the probe exists for). Every cloud must converge in band."""
    rng = np.random.default_rng(5)
    clouds = []
    for _ in range(4):
        centers = rng.uniform(-8, 8, size=(24, 3))
        pts = (centers[:, None, :]
               + rng.normal(scale=0.3, size=(24, 48, 3))).reshape(-1, 3)
        clouds.append(pts.astype(np.float32))
    batch = jnp.asarray(np.stack(clouds))
    fn = jax.vmap(lambda p: ndt_downsample(p, 64, search="probe"))
    pcl, covs, labels, mask, state = fn(batch)
    assert bool(state.converged.all())
    assert np.all(np.asarray(state.num_valid) >= 64)
    assert np.all(np.asarray(state.num_valid) <= 76)
    assert np.all(np.asarray(mask.sum(axis=1)) == 64)
