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
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ndtpu.core import voxel as vx
from ndtpu.core.kl import lex_search

_INT_MAX = jnp.iinfo(jnp.int32).max


def _local_keys(points, mask, voxel_size, lens, offsets):
    coords, _ = vx.metric_to_voxel_space(points, voxel_size, lens, offsets)
    return jnp.where(mask[:, None], coords[:, ::-1], _INT_MAX)  # (z,y,x)


def _unique_keys(keys, k_max):
    """Distinct sorted keys of one shard, padded to [k_max, 3] with INT32_MAX.
    Returns (table, count)."""
    z, y, x = jax.lax.sort((keys[:, 0], keys[:, 1], keys[:, 2]), num_keys=3)
    valid = z != _INT_MAX
    first = jnp.ones_like(valid)
    first = first.at[1:].set(
        (z[1:] != z[:-1]) | (y[1:] != y[:-1]) | (x[1:] != x[:-1])
    )
    is_new = valid & first
    n = keys.shape[0]
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    count = rank[-1] + 1
    slot = jnp.where(is_new & (rank < k_max), rank, k_max)
    table = jnp.full((k_max + 1, 3), _INT_MAX, jnp.int32)
    table = table.at[slot].set(
        jnp.stack([z, y, x], axis=1), mode="drop"
    )[:k_max]
    return table, jnp.minimum(count, k_max)


def _merge_tables(tables, k_max):
    """Merge [D, k_max, 3] per-shard tables into one sorted distinct table."""
    flat = tables.reshape(-1, 3)
    return _unique_keys(flat, k_max)


def sharded_segment_moments(mesh: Mesh, points, mask, voxel_size, lens,
                            offsets, k_max: int, num_class_slots: int = 1,
                            classes=None, axis: str = "points"):
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
        keys = _local_keys(pts, msk, voxel_size, lens, offsets)
        local_table, _ = _unique_keys(keys, k_max)
        gathered = jax.lax.all_gather(local_table, axis)  # [D, k_max, 3]
        table, num_valid = _merge_tables(gathered, k_max)

        seg, found = lex_search(table, keys)
        seg = jnp.where(found & msk, seg, k_max)
        centers = vx.voxel_to_metric_space(
            jnp.where(msk[:, None], keys[:, ::-1], 0), voxel_size, offsets
        )
        from ndtpu.core.moments import segment_moments

        mom = segment_moments(
            pts, centers, seg.astype(jnp.int32), k_max, valid=msk,
            classes=cls, num_class_slots=num_class_slots,
        )
        acc = jnp.concatenate(
            [
                mom["counts"].astype(jnp.float32)[:, None],
                mom["sum_shift"],
                mom["sum_outer"].reshape(k_max, 9),
                mom["class_hist"].astype(jnp.float32),
            ],
            axis=1,
        )
        acc = jax.lax.psum(acc, axis)  # the one collective: exact reduction
        return table, acc, num_valid

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
                           offsets, k_max: int, axis: str = "points"):
    """Global occupied-voxel count of a point-sharded cloud (the binary
    search objective), clipped to k_max."""

    def local(pts, msk):
        keys = _local_keys(pts, msk, voxel_size, lens, offsets)
        local_table, _ = _unique_keys(keys, k_max)
        gathered = jax.lax.all_gather(local_table, axis)
        _, num_valid = _merge_tables(gathered, k_max)
        return num_valid

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )(points, mask)


def make_point_sharded_downsample(mesh: Mesh, n_desired: int,
                                  num_class_slots: int = 1,
                                  axis: str = "points"):
    """Full NDT downsample for a single giant cloud sharded over the point
    axis — the complete sequence-parallel-analogue pipeline (SURVEY.md §5):
    voxel-size binary search with collective occupied counts, point-sharded
    moment psum, then KL + prune on the replicated (small) ND set.

    Returns a jitted fn(points [N,3], mask [N], classes [N]) ->
    (pcl [n_desired,3], covs [n_desired,9], labels, out_mask, NDTResult),
    matching ndt_downsample's contract. N must divide by the mesh size.
    """
    import functools

    from ndtpu.core import ndt as nd
    from ndtpu.core.kl import neighbor_min_kl
    from ndtpu.core.moments import finalize_moments

    k_max = nd.max_segments(n_desired)

    def search(points, mask, mins, maxs):
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
                mesh, points, mask, guess, lens, offsets, k_max, axis
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
        voxel_size, converged = search(points, mask, mins, maxs)
        lens, offsets = vx.estimate_voxel_grid(mins, maxs, voxel_size)

        mom = sharded_segment_moments(
            mesh, points, mask, voxel_size, lens, offsets, k_max,
            num_class_slots=num_class_slots, classes=classes, axis=axis,
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
