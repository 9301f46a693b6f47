"""Exact point-sharded NDT moment reduction (the giant-cloud config).

SURVEY.md §5: the reference caps cloud size by host-side subsampling before
the model; the TPU analogue of sequence parallelism for this workload is to
shard the *point axis* across devices. Per-voxel moments (n, Σx̃, Σx̃x̃ᵀ) are
associative, so each device reduces its point shard against a shared
occupied-voxel table and a single `psum` over the point-shard axis makes the
result exact — not approximate. The (much smaller) ND set stays replicated
for KL pruning.

Table discovery is also collective: each shard finds its local distinct
voxel keys, all-gathers them, and merges — bounded by the static k_max.

Layout: the per-point work is structure-of-arrays with the packed int32
voxel key (ndt._voxel_keys — voxel sizes are clamped into the int32-packable
envelope by the search), and each shard assigns *local* dense segment ranks
via its own payload sort — the local→global remap then touches only k_max
rows (a per-point lookup against the global table would be a lane-dim
gather, which TPU executes pathologically slowly; see CLAUDE.md and
ndtpu/core/ndt.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ndtpu.core import voxel as vx

_INT_MAX = jnp.iinfo(jnp.int32).max


def _keys_soa(px, py, pz, mask, voxel_size, lens, offsets):
    """Packed int32 voxel sort key per point (see ndt._voxel_keys).
    Requires voxel_size inside the int32-packable envelope (the driver
    clamps the accepted size before the moment pass)."""

    def coord(p, axis):
        return vx.metric_to_voxel_axis(p, voxel_size, lens[axis], offsets[axis])

    x, y, z = coord(px, 0), coord(py, 1), coord(pz, 2)
    return jnp.where(mask, (z * lens[1] + y) * lens[0] + x, _INT_MAX)


def _keys_pair(px, py, pz, mask, voxel_size, lens, offsets):
    """(zy, x) key pair — exact for any len_z*len_y < 2^31 grid, i.e. also
    below the packable envelope. Used by the occupancy count so the
    voxel-size search visits the C core's exact bisection sequence
    unclamped (matches core ndt._count_occupied_pair)."""

    def coord(p, axis):
        return vx.metric_to_voxel_axis(p, voxel_size, lens[axis], offsets[axis])

    x, y, z = coord(px, 0), coord(py, 1), coord(pz, 2)
    zy = jnp.where(mask, z * lens[1] + y, _INT_MAX)
    return zy, jnp.where(mask, x, _INT_MAX)


def _split12(c, new):
    """12-bit hi/lo split of a non-negative int32 column, masked to
    segment-start rows: every chunk is < 2^19 (hi) / 2^12 (lo), far inside
    f32's 2^24 exact-integer range, and each segment receives exactly ONE
    contribution — so a segment reduction returns the value bit-exactly."""
    hi = jnp.where(new, c >> 12, 0).astype(jnp.float32)
    lo = jnp.where(new, c & 0xFFF, 0).astype(jnp.float32)
    return hi, lo


def _join12(hi, lo):
    return (jnp.round(hi).astype(jnp.int32) << 12) | jnp.round(lo).astype(
        jnp.int32
    )


def _distinct_sorted_cols(cols, k_max, use_pallas=False):
    """Distinct-run table of already-sorted key columns (lexicographic,
    first column primary), each padded to k_max with INT32_MAX. Rows whose
    first column is INT32_MAX are padding. Returns (cols', count) — the
    one implementation behind both the packed-key moment table and the
    (zy, x) pair-key occupancy count.

    Extraction is a segment reduction over sparse 12-bit-split tag columns
    (see _split12) instead of a top_k-over-N compaction — same trick as
    core ndt._build_state, one O(N) kernel pass instead of O(N log k)."""
    n = cols[0].shape[0]
    neq = jnp.zeros((n - 1,), bool)
    for c in cols:
        neq |= c[1:] != c[:-1]
    new = jnp.ones((n,), bool).at[1:].set(neq)
    valid = cols[0] != _INT_MAX
    new &= valid
    count = jnp.sum(new.astype(jnp.int32))
    seg = jnp.cumsum(new.astype(jnp.int32)) - 1
    seg = jnp.where(valid & (seg >= 0) & (seg < k_max), seg, k_max)
    tags = []
    for c in cols:
        tags += _split12(c, new)
    if use_pallas:
        from ndtpu.ops.pallas.segment_moments import segment_tags_sorted

        acc = segment_tags_sorted(seg, tuple(tags), k_max + 1)[:k_max]
    else:
        feats = jnp.stack(tags, axis=1)
        acc = jax.ops.segment_sum(
            feats, seg, num_segments=k_max + 1, indices_are_sorted=True
        )[:k_max]
    idx = jax.lax.broadcasted_iota(jnp.int32, (k_max, 1), 0)[:, 0]
    ok = idx < jnp.minimum(count, k_max)
    out = tuple(
        jnp.where(ok, _join12(acc[:, 2 * i], acc[:, 2 * i + 1]), _INT_MAX)
        for i in range(len(cols))
    )
    return out, count


def _distinct_sorted(key, k_max, use_pallas=False):
    """Distinct sorted packed keys, padded to k_max with INT32_MAX.

    Input must already be sorted. Returns (tkey [k_max], count)."""
    (tkey,), count = _distinct_sorted_cols((key,), k_max, use_pallas)
    return tkey, count


def _merge_tables(tkey, k_max):
    """Merge gathered per-shard tables [D, k_max] into one sorted distinct
    table. Returns (tkey [k_max], count). (D*k_max rows — small; the XLA
    segment-sum path is fine at this size.)"""
    return _distinct_sorted(jax.lax.sort(tkey.reshape(-1)), k_max)


def _table_zyx(tkey, lens):
    """Packed-key table back to [k_max, 3] (z, y, x) rows for NDTResult/KL."""
    valid = tkey != _INT_MAX
    lxy = lens[0] * lens[1]
    rem = tkey % lxy
    z = jnp.where(valid, tkey // lxy, _INT_MAX)
    y = jnp.where(valid, rem // lens[0], _INT_MAX)
    x = jnp.where(valid, rem % lens[0], _INT_MAX)
    return jnp.stack([z, y, x], axis=1)


def sharded_segment_moments(mesh: Mesh, points, mask, voxel_size, lens,
                            offsets, k_max: int, num_class_slots: int = 1,
                            classes=None, axis: str = "points",
                            use_pallas: bool = False):
    """Compute global per-voxel moments of a point-sharded cloud.

    Args:
      mesh: Mesh with a `axis` dimension the points are sharded over.
      points [N, 3] (global view, sharded on dim 0), mask [N] bool.
      voxel_size/lens/offsets: fixed grid (from a replicated search).
      k_max: static max occupied voxels.

    Returns dict: table [k_max,3] (z,y,x) sorted; counts [k_max];
    sum_shift [k_max,3]; sum_outer [k_max,3,3]; class_hist; num_valid.
    All outputs replicated.
    """
    if classes is None:
        classes = jnp.zeros(points.shape[:1], jnp.int32)

    def local(pts, msk, cls):
        from ndtpu.core.moments import segment_moments_soa

        n = pts.shape[0]
        px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
        key0 = _keys_soa(px, py, pz, msk, voxel_size, lens, offsets)

        # shard-local payload sort: coordinates/classes ride along (a
        # post-hoc lane gather would dominate the whole pipeline); the
        # stable sort keeps duplicate keys in input order, so no index
        # tie-break column is needed
        key, pxs, pys, pzs, cls_s = jax.lax.sort(
            (key0, px, py, pz, cls.astype(jnp.int32)), num_keys=1
        )
        valid_s = key != _INT_MAX

        # local dense ranks from sorted-run boundaries
        new = jnp.ones((n,), bool)
        new = new.at[1:].set(key[1:] != key[:-1])
        new &= valid_s
        lseg = jnp.cumsum(new.astype(jnp.int32)) - 1
        lseg = jnp.where(valid_s & (lseg >= 0) & (lseg < k_max), lseg, k_max)

        # voxel centers + shifted coordinates, per component
        def center(c, axis_i):
            return vx.voxel_to_metric_axis(c, voxel_size, offsets[axis_i])

        lxy = lens[0] * lens[1]
        rem = key % lxy
        vz = jnp.where(valid_s, key // lxy, 0)
        vy = jnp.where(valid_s, rem // lens[0], 0)
        vx_ = jnp.where(valid_s, rem % lens[0], 0)
        v = valid_s.astype(jnp.float32)
        xt = jnp.where(valid_s, pxs - center(vx_, 0), 0.0)
        yt = jnp.where(valid_s, pys - center(vy, 1), 0.0)
        zt = jnp.where(valid_s, pzs - center(vz, 2), 0.0)

        # the local distinct-key table rides the moment reduction as two
        # sparse 12-bit-split tag columns (one exact contribution per
        # segment) — no separate top_k/compaction pass over N
        thi, tlo = _split12(key, new)
        lmom = segment_moments_soa(
            xt, yt, zt, v, lseg, k_max,
            classes=cls_s, num_class_slots=num_class_slots,
            use_pallas=use_pallas, tags=(thi, tlo),
        )
        ltkey = jnp.where(
            lmom["counts"] > 0,
            _join12(lmom["tag_sums"][:, 0], lmom["tag_sums"][:, 1]),
            _INT_MAX,
        )
        gathered = jax.lax.all_gather(ltkey, axis)  # [D, k_max]
        tkey, num_valid = _merge_tables(gathered, k_max)
        lacc = jnp.concatenate(
            [
                lmom["counts"].astype(jnp.float32)[:, None],
                lmom["sum_shift"],
                lmom["sum_outer"].reshape(k_max, 9),
                lmom["class_hist"].astype(jnp.float32),
            ],
            axis=1,
        )

        # local rank -> global table row: only k_max queries (not N), and
        # with packed 1-D keys the lookup is a plain searchsorted
        gidx = jnp.searchsorted(tkey, ltkey, side="left").astype(jnp.int32)
        found = tkey[jnp.clip(gidx, 0, k_max - 1)] == ltkey
        found &= ltkey != _INT_MAX
        gidx = jnp.where(found, gidx, k_max)
        acc = jnp.zeros((k_max + 1, lacc.shape[1]), jnp.float32)
        acc = acc.at[gidx].add(lacc, mode="drop")[:k_max]

        acc = jax.lax.psum(acc, axis)  # the one collective: exact reduction
        return _table_zyx(tkey, lens), acc, jnp.minimum(num_valid, k_max)

    table, acc, num_valid = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(points, mask, classes)

    return {
        "table": table,
        "counts": jnp.round(acc[:, 0]).astype(jnp.int32),
        "sum_shift": acc[:, 1:4],
        "sum_outer": acc[:, 4:13].reshape(k_max, 3, 3),
        "class_hist": jnp.round(acc[:, 13:]).astype(jnp.int32),
        "num_valid": num_valid,
    }


def sharded_count_occupied(mesh: Mesh, points, mask, voxel_size, lens,
                           offsets, k_max: int, axis: str = "points",
                           use_pallas: bool = False):
    """Global occupied-voxel count of a point-sharded cloud (the binary
    search objective), clipped to k_max."""

    def local(pts, msk):
        zy0, x0 = _keys_pair(
            pts[:, 0], pts[:, 1], pts[:, 2], msk, voxel_size, lens, offsets
        )
        zy, x = jax.lax.sort((zy0, x0), num_keys=2)
        (ltzy, ltx), _ = _distinct_sorted_cols((zy, x), k_max, use_pallas)
        gathered = jax.lax.all_gather(jnp.stack([ltzy, ltx], axis=0), axis)
        mzy, mx = jax.lax.sort(
            (gathered[:, 0, :].reshape(-1), gathered[:, 1, :].reshape(-1)),
            num_keys=2,
        )
        m = mzy.shape[0]
        mnew = jnp.ones((m,), bool)
        mnew = mnew.at[1:].set((mzy[1:] != mzy[:-1]) | (mx[1:] != mx[:-1]))
        mnew &= mzy != _INT_MAX
        return jnp.minimum(jnp.sum(mnew.astype(jnp.int32)), k_max)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )(points, mask)


def make_point_sharded_downsample(mesh: Mesh, n_desired: int,
                                  num_class_slots: int = 1,
                                  axis: str = "points",
                                  use_pallas: bool = False,
                                  search: str = "reference"):
    """Full NDT downsample for a single giant cloud sharded over the point
    axis — the complete sequence-parallel-analogue pipeline (SURVEY.md §5):
    voxel-size binary search with collective occupied counts, point-sharded
    moment psum, then KL + prune on the replicated (small) ND set.

    Returns a jitted fn(points [N,3], mask [N], classes [N]) ->
    (pcl [n_desired,3], covs [n_desired,9], labels, out_mask, NDTResult),
    matching ndt_downsample's contract. N must divide by the mesh size.

    search: "reference" follows the C bisection trajectory (the default —
    bit-matches single-device ndt_downsample's reference search,
    tests/test_sharding.py); "fast"/"probe" reuses the core secant search
    (_search_voxel_size_fast) with the sharded collective count — same
    acceptance band, typically 1-2 collective counts instead of the blind
    midpoint bisection's ~5+ (the r5 sizing check measured the
    geometric-mean seed already IN BAND on the 1M-point giant bench
    cloud; each saved evaluation is a full shard-local sort + table
    merge). "probe" is accepted as an alias so bench/CLI search flags
    pass through; the subsample estimator itself is not used here — at
    giant-cloud occupancies (hundreds of points per voxel) the seed
    count is exact and the estimator's bias can only hurt.
    """
    from ndtpu.core import ndt as nd
    from ndtpu.core.kl import neighbor_min_kl
    from ndtpu.core.moments import finalize_moments

    k_max = nd.max_segments(n_desired)

    def search_fast(points, mask, mins, maxs):
        # reuse the core secant trajectory with the collective count —
        # trajectory-identical to the single-device fast search by
        # construction (same state machine, same exact counts)
        def count_fn(px, py, pz, msk, guess, mins_, maxs_):
            lens, offsets = vx.estimate_voxel_grid(mins_, maxs_, guess)
            return sharded_count_occupied(
                mesh, points, msk, guess, lens, offsets, k_max, axis,
                use_pallas,
            )

        return nd._search_voxel_size_fast(
            points[:, 0], points[:, 1], points[:, 2], mask, n_desired,
            mins, maxs, count_fn=count_fn,
        )

    def search_bisect(points, mask, mins, maxs):
        upper = n_desired * (1.0 + nd.DOWNSAMPLE_UPPER_THRESHOLD)
        init = (
            jnp.array(False),
            jnp.float32((nd.MAX_VOXEL_GUESS - nd.MIN_VOXEL_GUESS) / 2.0),
            jnp.float32(nd.MIN_VOXEL_GUESS),
            jnp.float32(nd.MAX_VOXEL_GUESS),
            jnp.int32(0),
            jnp.float32(0.0),
            jnp.int32(jnp.iinfo(jnp.int32).max),
        )

        def cond(c):
            done, _, _, _, it, _, _ = c
            return (~done) & (it < nd.MAX_GUESS_ITERATIONS)

        def body(c):
            done, guess, lo, hi, it, best_g, best_c = c
            lens, offsets = vx.estimate_voxel_grid(mins, maxs, guess)
            count = sharded_count_occupied(
                mesh, points, mask, guess, lens, offsets, k_max, axis,
                use_pallas,
            )
            too_many = count.astype(jnp.float32) > upper
            too_few = count < n_desired
            hit = ~too_many & ~too_few
            better = (count >= n_desired) & (count < best_c)
            best_g = jnp.where(better, guess, best_g)
            best_c = jnp.where(better, count, best_c)
            lo = jnp.where(too_many, guess, lo)
            hi = jnp.where(too_few, guess, hi)
            guess = jnp.where(hit, guess, lo + (hi - lo) / 2.0)
            return (hit, guess, lo, hi, it + 1, best_g, best_c)

        done, guess, _, _, _, best_g, best_c = jax.lax.while_loop(
            cond, body, init
        )
        have_best = best_c < jnp.iinfo(jnp.int32).max
        return jnp.where(done, guess, jnp.where(have_best, best_g, guess)), done

    @jax.jit
    def downsample(points, mask=None, classes=None):
        n = points.shape[0]
        if mask is None:
            mask = jnp.ones((n,), bool)
        if classes is None:
            classes = jnp.zeros((n,), jnp.int32)
        points = points.astype(jnp.float32)

        mins, maxs = vx.pointcloud_limits(points, mask)  # global-view reduce
        search_impl = (search_fast if search in ("fast", "probe")
                       else search_bisect)
        voxel_size, converged = search_impl(points, mask, mins, maxs)
        # the packed-key moment pass needs the accepted size inside the
        # int32 grid envelope; if the clamp binds (dense cluster plus a
        # km-scale outlier) the grid is coarsened, so converged must flip
        # to False instead of silently reporting the accepted band — the
        # same semantics as core ndt_downsample (ADVICE r1)
        clamped = jnp.maximum(
            voxel_size, nd._min_packable_voxel_size(mins, maxs)
        )
        converged &= clamped <= voxel_size
        voxel_size = clamped
        lens, offsets = vx.estimate_voxel_grid(mins, maxs, voxel_size)

        mom = sharded_segment_moments(
            mesh, points, mask, voxel_size, lens, offsets, k_max,
            num_class_slots=num_class_slots, classes=classes, axis=axis,
            use_pallas=use_pallas,
        )
        seg_centers = vx.voxel_to_metric_space(
            jnp.where((mom["counts"] > 0)[:, None], mom["table"][:, ::-1], 0),
            voxel_size, offsets,
        )
        means, covs = finalize_moments(
            mom["counts"], mom["sum_shift"], mom["sum_outer"], seg_centers
        )
        min_kl, max_kl = neighbor_min_kl(
            means, covs, mom["counts"], mom["table"], lens
        )
        state = nd.NDTResult(
            means=means, covs=covs, counts=mom["counts"],
            class_hist=mom["class_hist"], zyx=mom["table"],
            min_kl=min_kl, max_kl=max_kl, lens=lens, offsets=offsets,
            voxel_size=voxel_size, num_valid=mom["num_valid"],
            converged=converged,
        )
        pcl, cov9, labels, out_mask = nd._emit(state, n_desired)
        return pcl, cov9, labels, out_mask, state

    return downsample
