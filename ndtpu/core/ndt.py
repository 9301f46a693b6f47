"""The NDT downsampling pipeline, as one jittable/vmappable function.

TPU-native re-design of the reference driver `core_legacy/src/ndt.c:119-222`
(ctypes-wrapped by `ndnet/preprocessing/ndt_legacy.py:111-240`) and its
pure-Python twin `ndnet/preprocessing/core/ndt.py:121-184`:

  1. cloud limits                          (pointclouds.c:40-66, bug-fixed)
  2. voxel-size binary search, ≤15 iters   (ndt.c:136-187; constants
     ndt.h:38-43: band [n, 1.2n], guesses in [0.01, 30.0])
  3. per-voxel Gaussian moments            (normal_distributions.c:139-285)
  4. 6-neighbor KL divergences             (kullback_leibler.c:129-202)
  5. prune lowest-divergence NDs to n      (ndt.c:28-73, documented intent:
     ascending order, per README.md:6 and core/ndt.py:37-75 — the C file's
     descending sort is a known reference bug, SURVEY.md §2.4)
  6. compact to a fixed-size point cloud   (ndt.c:75-117)

Design notes (why this is not a port):
- No dense ``len_x*len_y*len_z`` grid is ever allocated. Points are keyed by
  their packed int32 voxel index (the reference's own x-fastest
  linearization, voxel.c:177-189) and sorted; occupied voxels are the
  distinct keys. This keeps every shape static for XLA. Voxel sizes are
  clamped so grids stay under 2^31 cells (_min_packable_voxel_size) — the
  reference's dense allocation would need >400 GB beyond that, so the
  envelope is strictly more permissive than the C core's.
- Counting occupied voxels (the binary-search objective) is a sort + count
  of key transitions — O(N log N) on the VPU, no allocation.
- Gaussian moments are an associative segment reduction (ndtpu.core.moments)
  — the reference's mutex/condvar machinery is structurally unnecessary and
  the result is deterministic (bit-identical across runs), which the
  threaded reference cannot guarantee.
- The reference's sequential prune ("pop lowest entry; skip entries whose p
  was already removed") removes exactly the first ``to_remove`` *distinct*
  p's in ascending-divergence order. A p's first appearance in that order is
  its minimum divergence, so pruning = rank segments by min neighbor KL and
  drop the smallest ``to_remove``. That equivalence turns an inherently
  serial pointer loop into one argsort.
- ``downsample``/``prune`` stay two composable stages (ndt_legacy.py:111/:173)
  for NDT-Net++: the state carried between them is an `NDTResult` pytree, so
  the mid-forward prune of the multiscale model is jit-compatible — no
  device→host round trip.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ndtpu.core import voxel as vx
from ndtpu.core.kl import neighbor_min_kl
from ndtpu.core.moments import finalize_moments, segment_moments_soa

# Reference constants, ndt.h:38-43.
DOWNSAMPLE_UPPER_THRESHOLD = 0.2
MIN_VOXEL_GUESS = 0.01
MAX_VOXEL_GUESS = 30.0
MAX_GUESS_ITERATIONS = 15

_INT_MAX = jnp.iinfo(jnp.int32).max

# Grid-cell budget for the packed int32 voxel key (see _voxel_keys). The
# sufficient-condition bound in _min_packable_voxel_size splits it in four,
# so each admitted grid has < 2^31 - 1024 cells and every valid key is
# strictly below INT32_MAX (the padding sentinel); the 1024-cell shave also
# absorbs f32 rounding of the cbrt/sqrt bounds below.
_GRID_CELL_BUDGET = float(2**31 - 1024)


def _min_packable_voxel_size(mins, maxs):
    """Smallest voxel size whose grid linearizes into one int32 key.

    cells = prod(ceil(d_i/s)) <= prod(d_i/s + 1)
          = V/s^3 + S2/s^2 + S1/s + 1   (V volume, S2 pairwise SUM, S1 sum).
    Requiring each of the four terms <= budget/4 is sufficient and gives
    closed-form bounds on s; the max of the three is returned. Clouds
    needing a grid beyond 2^31 cells are strictly outside the reference's
    envelope too: its dense per-iteration grid alloc (ndt.c:151,
    ~200 B/cell) would exceed 400 GB there. For such clouds the search
    clamps its lower bound here and reports converged=False if that ever
    binds; key_mode="pair" extends the exact envelope to
    len_z*len_y < 2^31 grids.
    """
    d = jnp.maximum(maxs - mins, 0.0)
    dx, dy, dz = d[0], d[1], d[2]
    b4 = jnp.float32(_GRID_CELL_BUDGET / 4.0)
    s3 = jnp.cbrt(dx * dy * dz / b4)
    # bound the full pairwise SUM (dx*dy + dx*dz + dy*dz)/s^2, not just the
    # max product — term-wise sufficiency then holds with wide margin
    s2 = jnp.sqrt((dx * dy + dx * dz + dy * dz) / b4)
    s1 = (dx + dy + dz) / b4
    return jnp.maximum(
        jnp.maximum(jnp.maximum(s3, s2), s1), _min_axis_exact_size(d)
    )


def _min_axis_exact_size(d):
    """Smallest voxel size keeping EVERY axis grid length < 2^24, so a
    per-axis voxel coordinate is exact as an f32 (24 mantissa bits) — the
    precondition of the sparse tag columns that carry per-segment coords
    through the moment reduction (_build_state; ADVICE r3: the packed/pair
    cell budgets alone admit one axis up to ~2^31 for degenerate
    near-1-D clouds, where round(tag_sums) would silently corrupt
    seg_zyx). len_i = ceil(d_i/s) < 2^24  ⟸  s >= d_i / (2^24 - 2)."""
    return jnp.max(d) / jnp.float32(2.0**24 - 2.0)


def _min_pair_packable_voxel_size(mins, maxs):
    """Smallest voxel size for the (zy, x) key PAIR (key_mode="pair"):
    needs len_z*len_y < 2^31 (zy = z*len_y + y packs into one int32) and
    per-axis lengths < 2^24 (f32-exact tag columns, _min_axis_exact_size —
    this also covers the trivial len_x < 2^31 requirement). Same
    term-splitting argument as _min_packable_voxel_size in two dimensions:
    len_z*len_y <= dz*dy/s^2 + (dz+dy)/s + 1, each term <= budget/3."""
    d = jnp.maximum(maxs - mins, 0.0)
    dy, dz = d[1], d[2]
    b3 = jnp.float32(_GRID_CELL_BUDGET / 3.0)
    s2 = jnp.sqrt(dz * dy / b3)
    s1 = (dz + dy) / b3
    return jnp.maximum(jnp.maximum(s2, s1), _min_axis_exact_size(d))


class NDTResult(struct.PyTreeNode):
    """Post-downsample sampler state (the jittable analogue of the native
    pointers `NDT_Sampler` retains between downsample and prune,
    ndt_legacy.py:77-79). All arrays have static leading dim K = max NDs.
    """

    means: jax.Array        # [K, 3] f32
    covs: jax.Array         # [K, 3, 3] f32
    counts: jax.Array       # [K] i32, 0 = empty slot
    class_hist: jax.Array   # [K, C+1] i32; untagged clouds
                            # (num_class_slots == 1) carry [K, 1] (= counts
                            # column) — argmax over it is class 0 either way
    zyx: jax.Array          # [K, 3] i32 voxel coords (z,y,x), sorted; pad=INT32_MAX
    min_kl: jax.Array       # [K] f32, inf = no valid neighbor pair
    max_kl: jax.Array       # [K] f32, -inf = no valid pair (legacy C order)
    lens: jax.Array         # [3] i32 grid dims (x, y, z)
    offsets: jax.Array      # [3] f32
    voxel_size: jax.Array   # scalar f32
    num_valid: jax.Array    # scalar i32 (occupied voxels, clipped to K)
    converged: jax.Array    # scalar bool — binary search hit the band

    @property
    def max_nds(self) -> int:
        return self.means.shape[0]


def max_segments(n_desired: int) -> int:
    """Static capacity: the search band tops out at 1.2*n (ndt.h:38)."""
    return int(n_desired * (1.0 + DOWNSAMPLE_UPPER_THRESHOLD)) + 8


def empty_state(n_desired: int, num_class_slots: int = 1,
                batch: Optional[int] = None) -> NDTResult:
    """Zero-filled NDTResult with the exact shapes/dtypes that
    ``ndt_downsample(points, n_desired, num_class_slots=...)`` produces
    (leading ``batch`` dim on every leaf when given, matching a vmapped
    downsample). For building flax init / checkpoint templates without
    compiling and running a full-size pipeline."""
    k = max_segments(n_desired)
    c = num_class_slots if num_class_slots > 1 else 1

    def z(shape, dtype=jnp.float32):
        if batch is not None:
            shape = (batch,) + shape
        return jnp.zeros(shape, dtype)

    return NDTResult(
        means=z((k, 3)),
        covs=z((k, 3, 3)),
        counts=z((k,), jnp.int32),
        class_hist=z((k, c), jnp.int32),
        zyx=z((k, 3), jnp.int32),
        min_kl=z((k,)),
        max_kl=z((k,)),
        lens=z((3,), jnp.int32),
        offsets=z((3,)),
        voxel_size=z(()),
        num_valid=z((), jnp.int32),
        converged=z((), jnp.bool_),
    )


def _voxel_keys(px, py, pz, mask, voxel_size, mins, maxs):
    """Per-point sort key from structure-of-arrays coordinates.

    TPU pads the minor dim of narrow 2-D arrays to 128 lanes, so every pass
    over an [N, 3] array costs the bandwidth of [N, 128]; the whole hot path
    therefore works on compact [N] component vectors. Returns
    (key, lens, offsets) where key packs the full voxel coordinate into ONE
    int32 — key = (z*len_y + y)*len_x + x, the reference's own x-fastest
    linearization (voxel.c:177-189). Exactness is guaranteed by clamping
    voxel sizes to _min_packable_voxel_size (< 2^31 grid cells); grids
    beyond that would need the reference's dense allocation to exceed
    ~400 GB, i.e. this is strictly more permissive than the C core. One
    packed key means the occupancy count sorts a single [N] vector and the
    moment build needs one key + iota instead of three — sort traffic is
    the pipeline's dominant cost. Masked-out points get INT32_MAX keys
    (valid keys are strictly below the sentinel by the budget's margin).
    """
    lens, offsets = vx.estimate_voxel_grid(mins, maxs, voxel_size)

    def coord(p, axis):
        return vx.metric_to_voxel_axis(p, voxel_size, lens[axis], offsets[axis])

    x, y, z = coord(px, 0), coord(py, 1), coord(pz, 2)
    key = jnp.where(mask, (z * lens[1] + y) * lens[0] + x, _INT_MAX)
    return key, lens, offsets


def _count_occupied(px, py, pz, mask, voxel_size, mins, maxs):
    """Number of distinct occupied voxels at this voxel size (packed-key
    fast path: one [N] int32 sort; requires voxel_size inside the
    int32-packable envelope, which the fast search guarantees by clamping
    its lower bound)."""
    key, _, _ = _voxel_keys(px, py, pz, mask, voxel_size, mins, maxs)
    key = jax.lax.sort(key)
    valid = key != _INT_MAX
    diff = jnp.ones_like(valid)
    diff = diff.at[1:].set(key[1:] != key[:-1])
    return jnp.sum((valid & diff).astype(jnp.int32))


def _count_occupied_pair(px, py, pz, mask, voxel_size, mins, maxs):
    """Occupancy count via the (zy, x) key PAIR — exact for any grid with
    len_z*len_y < 2^31, i.e. also at sizes below the single-key packable
    envelope. Used by the key_mode="pair" search, whose lower clamp is the
    (much smaller) pair envelope."""
    lens, offsets = vx.estimate_voxel_grid(mins, maxs, voxel_size)

    def coord(p, axis):
        return vx.metric_to_voxel_axis(p, voxel_size, lens[axis], offsets[axis])

    x, y, z = coord(px, 0), coord(py, 1), coord(pz, 2)
    zy = jnp.where(mask, z * lens[1] + y, _INT_MAX)
    x = jnp.where(mask, x, _INT_MAX)
    zy, x = jax.lax.sort((zy, x), num_keys=2)
    valid = zy != _INT_MAX
    diff = jnp.ones_like(valid)
    diff = diff.at[1:].set((zy[1:] != zy[:-1]) | (x[1:] != x[:-1]))
    return jnp.sum((valid & diff).astype(jnp.int32))


def _search_voxel_size(px, py, pz, mask, n_desired, mins, maxs,
                       count_fn=_count_occupied, lo_min=None):
    """Binary search over voxel size (ndt.c:136-187).

    Same control flow as the C loop: start at (MAX−MIN)/2, shrink
    [min_guess, max_guess] until the occupied-voxel count lands in
    [n, 1.2n] or 15 iterations pass. Early-exits via while_loop.

    The lower bound is clamped to ``lo_min`` — the exactness envelope of
    ``count_fn`` — so every count along the trajectory is exact. The driver
    passes the (zy, x) pair envelope with the pair count, which binds only
    where the C core's dense grid alloc could not run at all, so the guess
    sequence matches the C bisection everywhere the C core exists; where
    the clamp prevents reaching the band the search reports
    converged=False instead of silently coarsening post-hoc.

    Where the reference errors out on non-convergence (ndt.c:191-194 — some
    clouds have no voxel size whose occupied count lands in the band, e.g.
    symmetric grids that jump 8→1), we instead keep the best guess seen
    (smallest count ≥ n) and let the KL prune remove the surplus — a strict
    superset of the reference behavior, flagged via `converged`.
    """
    upper = n_desired * (1.0 + DOWNSAMPLE_UPPER_THRESHOLD)
    lo0 = jnp.float32(MIN_VOXEL_GUESS)
    if lo_min is not None:
        lo0 = jnp.maximum(lo0, lo_min)
    hi0 = jnp.maximum(jnp.float32(MAX_VOXEL_GUESS), lo0)
    init = (
        jnp.array(False),                                   # done
        jnp.maximum(                                        # guess
            jnp.float32((MAX_VOXEL_GUESS - MIN_VOXEL_GUESS) / 2.0), lo0
        ),
        lo0,                                                # lo
        hi0,                                                # hi
        jnp.int32(0),                                       # iter
        jnp.float32(0.0),                                   # best guess
        jnp.int32(jnp.iinfo(jnp.int32).max),                # best count >= n
    )

    def cond(c):
        done, _, _, _, it, _, _ = c
        return (~done) & (it < MAX_GUESS_ITERATIONS)

    def body(c):
        done, guess, lo, hi, it, best_g, best_c = c
        # every guess is >= lo0 >= the key-packing envelope, so the packed
        # single-key count is exact along the whole trajectory
        count = count_fn(px, py, pz, mask, guess, mins, maxs)
        too_many = count.astype(jnp.float32) > upper
        too_few = count < n_desired
        hit = ~too_many & ~too_few
        better = (count >= n_desired) & (count < best_c)
        best_g = jnp.where(better, guess, best_g)
        best_c = jnp.where(better, count, best_c)
        lo = jnp.where(too_many, guess, lo)
        hi = jnp.where(too_few, guess, hi)
        next_guess = lo + (hi - lo) / 2.0
        guess = jnp.where(hit, guess, next_guess)
        return (hit, guess, lo, hi, it + 1, best_g, best_c)

    done, guess, _, _, _, best_g, best_c = jax.lax.while_loop(cond, body, init)
    have_best = best_c < jnp.iinfo(jnp.int32).max
    final = jnp.where(done, guess, jnp.where(have_best, best_g, guess))
    return final, done


PROBE_FACTOR = 4  # cold-probe subsample stride (scripts/probe_seed_validate)


def _probe_seed_size(px, py, pz, mask, n_desired, mins, maxs, lo_min):
    """Cold-start steering probe: a subsampled occupancy count at the
    geometric-mean seed, Chao1-corrected, feeding the same alpha=2 secant
    step the fast search would take from an exact seed evaluation.

    Rationale (r5 sort-stage work): every cold evaluation of the fused
    search is a full [N]-payload sort — the pipeline's dominant stage —
    and the geometric-mean seed (voxel.c:28-59) misses the acceptance
    band on cluster/surface clouds 100% of the time (BASELINE.md seed hit
    rates), so cold cost is >= 2 full sorts. This probe sorts only N/4
    interleaved KEYS (~1/5 the sort cost), estimates the full-cloud
    occupied count D via Chao1 (D = d + f1(f1-1)/(2(f2+1)) from the
    subsample's singleton/doubleton voxel runs — the plain subsample
    count misses low-occupancy voxels and its -7..-18% bias pushes the
    steered step out of the 20%-wide band), and returns the stepped size.
    Offline trajectory replay (scripts/probe_seed_validate.py): full
    evaluations to acceptance drop 2.00 -> 1.00 (bench distribution),
    3.69 -> 2.44 (64-cluster), 3.00 -> 2.00 (uniform) at estimator error
    -2.7% +- 1.9%.

    Steering only: the returned size seeds `_search_and_sort_fast`'s
    evaluation 0, whose full sort still verifies the acceptance band
    exactly — a probe miss costs one extra exact iteration (today's cold
    behavior), never correctness. Probe keys are packed (clamped into the
    packed envelope); acceptance evaluations use the caller's key mode.
    """
    s0, _, _ = vx.estimate_voxel_size(n_desired, mins, maxs)
    lo0 = jnp.maximum(jnp.float32(MIN_VOXEL_GUESS), lo_min)
    hi0 = jnp.maximum(jnp.float32(MAX_VOXEL_GUESS), lo0)
    s0 = jnp.clip(jnp.nan_to_num(s0, nan=1.0), lo0, hi0)
    s_eval = jnp.maximum(s0, _min_packable_voxel_size(mins, maxs))
    key, _, _ = _voxel_keys(
        px[::PROBE_FACTOR], py[::PROBE_FACTOR], pz[::PROBE_FACTOR],
        mask[::PROBE_FACTOR], s_eval, mins, maxs,
    )
    key = jax.lax.sort(key)
    valid = key != _INT_MAX
    new = jnp.ones_like(valid)
    new = new.at[1:].set(key[1:] != key[:-1])
    start = valid & new
    # a run has length 1 iff the next position starts a run too (the
    # sentinel tail's first position counts as a start; end pads True)
    nxt1 = jnp.concatenate([new[1:], jnp.ones((1,), bool)])
    nxt2 = jnp.concatenate([new[2:], jnp.ones((2,), bool)])
    d = jnp.sum(start.astype(jnp.int32))
    f1 = jnp.sum((start & nxt1).astype(jnp.int32))
    f2 = jnp.sum((start & ~nxt1 & nxt2).astype(jnp.int32))
    f1f = f1.astype(jnp.float32)
    d_hat = d.astype(jnp.float32) + f1f * (f1f - 1.0) / (
        2.0 * (f2.astype(jnp.float32) + 1.0)
    )
    target = jnp.float32(n_desired * (1.0 + DOWNSAMPLE_UPPER_THRESHOLD / 2.0))
    step = s_eval * jnp.sqrt(jnp.maximum(d_hat, 1.0) / target)
    return jnp.clip(jnp.nan_to_num(step, nan=1.0), lo0, hi0)


def _count_occupied_multi(px, py, pz, mask, sizes, mins, maxs,
                          pair: bool = False):
    """Occupied-voxel counts at G candidate sizes in ONE fused sort.

    One dispatch instead of G, but NOT free: measured on the tunneled
    v5e, a [16, G, 70000] fused sort costs ~3x a [16, 70000] sort (flat
    in G — see BASELINE.md's sort-scaling table), which is why the grid
    search built on this is not the default there. ``pair`` sorts the
    (zy, x) key pair instead of the packed key (exact out to
    len_z*len_y < 2^31 grids). Returns counts [G]."""
    if pair:
        def one_keys(s):
            lens, offsets = vx.estimate_voxel_grid(mins, maxs, s)

            def coord(p, axis):
                return vx.metric_to_voxel_axis(p, s, lens[axis], offsets[axis])

            x, y, z = coord(px, 0), coord(py, 1), coord(pz, 2)
            zy = jnp.where(mask, z * lens[1] + y, _INT_MAX)
            return zy, jnp.where(mask, x, _INT_MAX)

        zy, x = jax.vmap(one_keys)(sizes)     # [G, N] each
        zy, x = jax.lax.sort((zy, x), dimension=-1, num_keys=2)
        valid = zy != _INT_MAX
        diff = jnp.ones_like(valid)
        diff = diff.at[..., 1:].set(
            (zy[..., 1:] != zy[..., :-1]) | (x[..., 1:] != x[..., :-1])
        )
        return jnp.sum((valid & diff).astype(jnp.int32), axis=-1)

    def one_keys(s):
        key, _, _ = _voxel_keys(px, py, pz, mask, s, mins, maxs)
        return key

    keys = jax.vmap(one_keys)(sizes)          # [G, N]
    keys = jax.lax.sort(keys, dimension=-1)
    valid = keys != _INT_MAX
    diff = jnp.ones_like(valid)
    diff = diff.at[..., 1:].set(keys[..., 1:] != keys[..., :-1])
    return jnp.sum((valid & diff).astype(jnp.int32), axis=-1)


def _search_voxel_size_grid(px, py, pz, mask, n_desired, mins, maxs,
                            pair: bool = False, lo_min=None, g: int = 6,
                            max_rounds: int = 5):
    """Grid-refinement search: each round counts g log-spaced candidates
    inside the bracket with one fused multi-candidate sort, accepts any
    candidate in the reference band [n, 1.2n] (same acceptance semantics
    as ndt.c:136-187 — only the trajectory differs), else shrinks the
    bracket to the gap straddling the band. Bracket ratio shrinks by
    ^(1/(g+1)) per round, so 3-4 rounds cover the full [0.01, 30] range.
    Measured on the tunneled v5e: a [B, g, N] fused sort costs ~3x a
    [B, N] sort (flat in g), so this does NOT beat the secant search
    there (~2 sequential evals thanks to its surface-prior seed); it wins
    only where wide sorts are near-free."""
    upper = jnp.float32(n_desired * (1.0 + DOWNSAMPLE_UPPER_THRESHOLD))
    target = jnp.float32(n_desired * (1.0 + DOWNSAMPLE_UPPER_THRESHOLD / 2.0))
    lo0 = jnp.float32(MIN_VOXEL_GUESS)
    if lo_min is not None:
        lo0 = jnp.maximum(lo0, lo_min)
    hi0 = jnp.maximum(jnp.float32(MAX_VOXEL_GUESS), lo0)

    init = (
        jnp.array(False),                       # done
        jnp.float32(0.0),                       # accepted size
        jnp.log(lo0),                           # log lo
        jnp.log(hi0),                           # log hi
        jnp.int32(0),                           # round
        jnp.float32(0.0),                       # best fallback size
        jnp.int32(jnp.iinfo(jnp.int32).max),    # best fallback count >= n
    )

    def cond(c):
        done, _, llo, lhi, it, _, _ = c
        return ~done & (it < max_rounds)

    def body(c):
        done, acc, llo, lhi, it, best_g, best_c = c
        fracs = jnp.arange(1, g + 1, dtype=jnp.float32) / jnp.float32(g + 1)
        lsizes = llo + (lhi - llo) * fracs
        sizes = jnp.exp(lsizes)
        counts = _count_occupied_multi(
            px, py, pz, mask, sizes, mins, maxs, pair=pair
        )
        countsf = counts.astype(jnp.float32)
        in_band = (counts >= n_desired) & (countsf <= upper)
        hit = jnp.any(in_band)
        pick = jnp.argmin(jnp.where(in_band, jnp.abs(countsf - target),
                                    jnp.inf))
        # counts are (weakly) decreasing in size: the new bracket is the
        # gap between the largest too-small size and the smallest
        # too-large size
        too_many = countsf > upper     # size too small -> raise lo
        too_few = counts < n_desired   # size too large -> lower hi
        new_llo = jnp.max(jnp.where(too_many, lsizes, llo))
        new_lhi = jnp.min(jnp.where(too_few, lsizes, lhi))
        new_lhi = jnp.maximum(new_lhi, new_llo)  # monotonicity guard
        # fallback: smallest count still >= n seen anywhere (the
        # best-guess superset semantics of the other searches)
        ge = counts >= n_desired
        cand_c = jnp.min(jnp.where(ge, counts, jnp.iinfo(jnp.int32).max))
        cand_i = jnp.argmin(jnp.where(ge, counts, jnp.iinfo(jnp.int32).max))
        better = cand_c < best_c
        best_c = jnp.where(better, cand_c, best_c)
        best_g = jnp.where(better, sizes[cand_i], best_g)
        return (
            done | hit,
            jnp.where(~done & hit, sizes[pick], acc),
            new_llo, new_lhi, it + 1, best_g, best_c,
        )

    done, acc, llo, lhi, _, best_g, best_c = jax.lax.while_loop(
        cond, body, init
    )
    have_best = best_c < jnp.iinfo(jnp.int32).max
    mid = jnp.exp((llo + lhi) * 0.5)
    final = jnp.where(done, acc, jnp.where(have_best, best_g, mid))
    return final, done


def _search_voxel_size_fast(px, py, pz, mask, n_desired, mins, maxs,
                            count_fn=_count_occupied, lo_min=None):
    """Accelerated search: same acceptance band [n, 1.2n] as the reference
    (so results are equally valid), but seeded with the geometric-mean
    estimate (voxel.c:28-59) and iterated with a log-log secant: occupied
    count scales as size^-alpha, where alpha ≈ 2 for real point clouds
    (lidar/mesh samples lie on surfaces) and 3 for volume-filling ones.
    The first step assumes the surface prior alpha = 2; every later step
    measures alpha from the last two (size, count) pairs, so both regimes
    converge in ~2-3 counts instead of the blind bisection's ~8-15.
    Bisection bounds are kept as a safety rail; the step falls back to the
    midpoint if the secant leaves them.

    The production pipeline uses _search_and_sort_fast — this same
    trajectory with the payload fused into each count sort; this unfused
    twin is the measurement baseline (bench.py --components,
    scripts/stage_timing.py) and the pair-count reference for tests.
    """
    upper = n_desired * (1.0 + DOWNSAMPLE_UPPER_THRESHOLD)
    target = jnp.float32(n_desired * (1.0 + DOWNSAMPLE_UPPER_THRESHOLD / 2.0))
    size0, _, _ = vx.estimate_voxel_size(n_desired, mins, maxs)
    lo0 = jnp.float32(MIN_VOXEL_GUESS)
    if lo_min is not None:  # key-packing envelope, see _min_packable_voxel_size
        lo0 = jnp.maximum(lo0, lo_min)
    size0 = jnp.clip(
        jnp.nan_to_num(size0, nan=1.0),
        lo0, jnp.maximum(jnp.float32(MAX_VOXEL_GUESS), lo0),
    )
    init = (
        jnp.array(False),
        size0.astype(jnp.float32),
        lo0,
        jnp.maximum(jnp.float32(MAX_VOXEL_GUESS), lo0),
        jnp.int32(0),
        jnp.float32(0.0),
        jnp.int32(jnp.iinfo(jnp.int32).max),
        jnp.float32(0.0),   # previous guess (0 = none yet)
        jnp.float32(0.0),   # previous count
    )

    def cond(c):
        done, _, _, _, it, _, _, _, _ = c
        return (~done) & (it < MAX_GUESS_ITERATIONS)

    def body(c):
        done, guess, lo, hi, it, best_g, best_c, pg, pc = c
        count = count_fn(px, py, pz, mask, guess, mins, maxs)
        countf = count.astype(jnp.float32)
        too_many = countf > upper
        too_few = count < n_desired
        hit = ~too_many & ~too_few
        better = (count >= n_desired) & (count < best_c)
        best_g = jnp.where(better, guess, best_g)
        best_c = jnp.where(better, count, best_c)
        lo = jnp.where(too_many, guess, lo)
        hi = jnp.where(too_few, guess, hi)
        # measured occupancy exponent from the last two evaluations;
        # surface prior (2.0) when no usable pair exists
        dlog_c = jnp.log(jnp.maximum(countf, 1.0) / jnp.maximum(pc, 1.0))
        dlog_g = jnp.log(pg / guess)
        usable = (pg > 0) & (jnp.abs(dlog_g) > 1e-6) & (jnp.abs(dlog_c) > 1e-6)
        alpha = jnp.where(usable, dlog_c / dlog_g, 2.0)
        alpha = jnp.clip(alpha, 0.5, 4.0)
        ratio = jnp.maximum(countf, 1.0) / target
        secant = guess * jnp.power(ratio, 1.0 / alpha)
        inside = (secant > lo) & (secant < hi)
        nxt = jnp.where(inside, secant, lo + (hi - lo) / 2.0)
        pg, pc = guess, countf
        guess = jnp.where(hit, guess, nxt)
        return (hit, guess, lo, hi, it + 1, best_g, best_c, pg, pc)

    done, guess, _, _, _, best_g, best_c, _, _ = jax.lax.while_loop(
        cond, body, init
    )
    have_best = best_c < jnp.iinfo(jnp.int32).max
    final = jnp.where(done, guess, jnp.where(have_best, best_g, guess))
    return final, done


def _sort_payload_at(px, py, pz, mask, classes, size, mins, maxs, tagged,
                     key_mode):
    """One voxel-key + payload sort at `size`. Returns the sorted operand
    tuple (key column(s), px, py, pz[, cls]) — the exact operand layout
    _build_state consumes.

    lax.sort is stable (is_stable defaults True), so duplicate keys keep
    their input order — the payload permutation is already a total,
    deterministic order and downstream f32 segment sums accumulate in a
    fixed association order without carrying an index tie-break column
    (one less operand through the stage-bound sort network)."""
    lens, offsets = vx.estimate_voxel_grid(mins, maxs, size)

    def coord(p, axis):
        return vx.metric_to_voxel_axis(p, size, lens[axis], offsets[axis])

    xc, yc, zc = coord(px, 0), coord(py, 1), coord(pz, 2)
    zy0 = jnp.where(mask, zc * lens[1] + yc, _INT_MAX)
    if key_mode == "pair":
        keys = (zy0, jnp.where(mask, xc, _INT_MAX))
    else:
        keys = (jnp.where(mask, zy0 * lens[0] + xc, _INT_MAX),)
    payload = (px, py, pz) + ((classes.astype(jnp.int32),) if tagged else ())
    return jax.lax.sort(keys + payload, num_keys=len(keys))


def _search_and_sort_fast(px, py, pz, mask, classes, n_desired, mins, maxs,
                          lo_min, tagged, key_mode="packed",
                          size0_override=None):
    """Fast search fused with the build's payload sort.

    Identical acceptance trajectory to _search_voxel_size_fast, but every
    evaluation sorts the voxel key WITH the coordinate payload riding
    along. TPU sorts are stage-bound, so payload operands cost only a few
    percent (measured: 8.24 → 8.82 ms for +3 operands on a flat 1.12M-key
    sort, bench.py --roofline) — and the accepted iteration's sort IS the
    moment pass's sort, so _build_state skips its own full payload sort
    (one [16, 70000] x 5-operand sort saved per canonical batch).

    Non-convergence: one extra FORCED evaluation at the best fallback size
    (smallest count >= n seen), so the carried sort always matches the
    returned voxel size — the fallback semantics of the unfused searches,
    at the price of one extra sort only on the (rare) unconverged clouds'
    batches.

    size0_override: optional runtime scalar replacing the geometric-mean
    seed — the warm-start path (an accepted size from a previous frame or
    batch of the same stream). Band monitoring is unchanged: the override
    is evaluated like any guess, so a stale seed just costs the searched
    trajectory, never correctness. Steady state = 1 sort, like
    fixed_voxel_size but self-healing (the amortization target:
    ndt.c:136-187 re-voxelizes up to 15x per cloud).

    Returns (voxel_size, converged, sorted operand tuple).
    """
    upper = n_desired * (1.0 + DOWNSAMPLE_UPPER_THRESHOLD)
    target = jnp.float32(n_desired * (1.0 + DOWNSAMPLE_UPPER_THRESHOLD / 2.0))
    if size0_override is not None:
        size0 = jnp.asarray(size0_override, jnp.float32)
    else:
        size0, _, _ = vx.estimate_voxel_size(n_desired, mins, maxs)
    lo0 = jnp.float32(MIN_VOXEL_GUESS)
    if lo_min is not None:
        lo0 = jnp.maximum(lo0, lo_min)
    size0 = jnp.clip(
        jnp.nan_to_num(size0, nan=1.0),
        lo0, jnp.maximum(jnp.float32(MAX_VOXEL_GUESS), lo0),
    )
    n_keys = 2 if key_mode == "pair" else 1

    def count_of(cols):
        skeys = cols[:n_keys]
        valid = skeys[0] != _INT_MAX
        diff = jnp.ones_like(valid)
        neq = functools.reduce(
            jnp.logical_or, [k[1:] != k[:-1] for k in skeys]
        )
        diff = diff.at[1:].set(neq)
        return jnp.sum((valid & diff).astype(jnp.int32))

    def evaluate(size):
        cols = _sort_payload_at(
            px, py, pz, mask, classes, size, mins, maxs, tagged, key_mode
        )
        return cols, count_of(cols)

    big = jnp.iinfo(jnp.int32).max

    def ingest(guess, count, lo, hi, best_g, best_c):
        """Bookkeeping for one evaluation (matches the unfused search)."""
        countf = count.astype(jnp.float32)
        too_many = countf > upper
        too_few = count < n_desired
        hit = ~too_many & ~too_few
        better = (count >= n_desired) & (count < best_c)
        best_g = jnp.where(better, guess, best_g)
        best_c = jnp.where(better, count, best_c)
        lo = jnp.where(too_many, guess, lo)
        hi = jnp.where(too_few, guess, hi)
        return hit, lo, hi, best_g, best_c

    # evaluation 0 (the seeded estimate) happens outside the loop, so
    # every loop body is exactly one sort and the loop never runs for
    # clouds whose seed already lands in band
    size0 = size0.astype(jnp.float32)
    cols0, count0 = evaluate(size0)
    hit0, lo1, hi1, best_g0, best_c0 = ingest(
        size0, count0, lo0,
        jnp.maximum(jnp.float32(MAX_VOXEL_GUESS), lo0),
        jnp.float32(0.0), jnp.int32(big),
    )

    init = (
        hit0,                                  # accepted
        size0,                                 # size the carried cols are at
        lo1, hi1,
        jnp.int32(1),                          # evaluations so far
        best_g0, best_c0,
        jnp.float32(0.0),                      # previous guess (none yet)
        jnp.float32(0.0),                      # previous count
        count0.astype(jnp.float32),            # current count
        cols0,
    )

    def cond(c):
        accepted, _, _, _, it, _, _, _, _, _, _ = c
        return (~accepted) & (it < MAX_GUESS_ITERATIONS + 1)

    def body(c):
        (accepted, guess, lo, hi, it, best_g, best_c, pg, pc, countf,
         cols) = c
        # secant step in log-log space (see _search_voxel_size_fast)
        dlog_c = jnp.log(jnp.maximum(countf, 1.0) / jnp.maximum(pc, 1.0))
        dlog_g = jnp.log(jnp.where(pg > 0, pg, 1.0) / guess)
        usable = (pg > 0) & (jnp.abs(dlog_g) > 1e-6) & (jnp.abs(dlog_c) > 1e-6)
        alpha = jnp.where(usable, dlog_c / dlog_g, 2.0)
        alpha = jnp.clip(alpha, 0.5, 4.0)
        ratio = jnp.maximum(countf, 1.0) / target
        secant = guess * jnp.power(ratio, 1.0 / alpha)
        inside = (secant > lo) & (secant < hi)
        nxt = jnp.where(inside, secant, lo + (hi - lo) / 2.0)
        # last allowed evaluation: force the best fallback size (smallest
        # count >= n seen) so the carried sort matches the returned size
        # on non-converged clouds — the unfused searches' fallback
        have_best = best_c < big
        nxt = jnp.where(
            (it >= MAX_GUESS_ITERATIONS) & have_best, best_g, nxt
        )
        cols, count = evaluate(nxt)
        hit, lo, hi, best_g, best_c = ingest(
            nxt, count, lo, hi, best_g, best_c
        )
        return (hit, nxt, lo, hi, it + 1, best_g, best_c, guess, countf,
                count.astype(jnp.float32), cols)

    accepted, guess, _, _, _, _, _, _, _, _, cols = jax.lax.while_loop(
        cond, body, init
    )
    return guess, accepted, cols


def _build_state(px, py, pz, mask, classes, num_class_slots, voxel_size,
                 converged, mins, maxs, k_max, use_pallas=False,
                 key_mode="packed", presorted=None):
    """Steps 3-4: sort by voxel key, reduce moments, compute neighbor KLs.

    Operates on structure-of-arrays coordinates end to end (see _voxel_keys
    for why): the sort payload, gathers, voxel centers, and shifted
    coordinates are all compact [N] vectors; the 13(+C)-wide moment rows
    are only ever materialized inside the Pallas kernel's VMEM.

    key_mode: "packed" sorts one int32 key (grid must be inside the
    _min_packable_voxel_size envelope, which the search guarantees);
    "pair" sorts the (zy, x) key pair — one extra int32 sort column —
    and is exact out to len_z*len_y < 2^31 grids (dense clusters plus
    km-scale outliers).

    presorted: the sorted operand tuple from _search_and_sort_fast (the
    accepted iteration's payload sort, at exactly `voxel_size`) — skips
    this function's own sort.
    """
    n = px.shape[0]
    lens, offsets = vx.estimate_voxel_grid(mins, maxs, voxel_size)
    # with a single class slot (untagged clouds) the class column is
    # statically all-zero: its histogram equals the counts, so neither the
    # sort payload nor the scatter needs to carry it
    tagged = num_class_slots > 1
    n_keys = 2 if key_mode == "pair" else 1
    if presorted is None:
        # coordinates and classes ride along as sort PAYLOAD: a post-hoc
        # px[perm] would be a gather along the lane dim, which TPU executes
        # orders of magnitude slower than moving payload through the
        # (VMEM-resident) sort network; the stable sort keeps duplicate
        # keys in input order, so the permutation is deterministic
        sorted_cols = _sort_payload_at(
            px, py, pz, mask, classes, voxel_size, mins, maxs, tagged,
            key_mode,
        )
    else:
        sorted_cols = presorted
    skeys = sorted_cols[:n_keys]
    pxs, pys, pzs = sorted_cols[n_keys : n_keys + 3]
    cls = sorted_cols[n_keys + 3] if tagged else None
    valid_s = skeys[0] != _INT_MAX
    if key_mode == "pair":
        zy, x = skeys
        z = jnp.where(valid_s, zy // lens[1], _INT_MAX)
        y = jnp.where(valid_s, zy % lens[1], _INT_MAX)
    else:
        key = skeys[0]
        lxy = lens[0] * lens[1]
        rem = key % lxy
        z = jnp.where(valid_s, key // lxy, _INT_MAX)
        y = jnp.where(valid_s, rem // lens[0], _INT_MAX)
        x = jnp.where(valid_s, rem % lens[0], _INT_MAX)

    new_seg = jnp.ones((n,), bool).at[1:].set(
        functools.reduce(
            jnp.logical_or, [sk[1:] != sk[:-1] for sk in skeys]
        )
    )
    new_seg &= valid_s
    seg = jnp.cumsum(new_seg.astype(jnp.int32)) - 1  # [N], -1 only if row0 invalid
    total = seg[-1] + 1  # distinct occupied voxels
    seg = jnp.where(valid_s & (seg < k_max) & (seg >= 0), seg, k_max)

    # voxel centers from sorted coords, per component (voxel.c:105-114)
    def center(c, axis):
        return vx.voxel_to_metric_axis(
            jnp.where(valid_s, c, 0), voxel_size, offsets[axis]
        )

    v = valid_s.astype(jnp.float32)
    xt = jnp.where(valid_s, pxs - center(x, 0), 0.0)
    yt = jnp.where(valid_s, pys - center(y, 1), 0.0)
    zt = jnp.where(valid_s, pzs - center(z, 2), 0.0)

    # per-segment voxel coords ride the moment reduction as sparse "tag"
    # columns masked to each segment's FIRST row (new_seg): exactly one row
    # contributes per segment, so the "sum" is the segment-constant
    # coordinate itself, bit-exact in f32 (needs |coord| < 2^24 per axis;
    # the packable-grid envelope is far inside that). This replaces the
    # previous top_k-over-N segment-starts compaction — one fewer O(N log)
    # pass per cloud (the gather z[safe] it fed is gone too).
    tag_z = jnp.where(new_seg, z, 0).astype(jnp.float32)
    tag_y = jnp.where(new_seg, y, 0).astype(jnp.float32)
    tag_x = jnp.where(new_seg, x, 0).astype(jnp.float32)
    mom = segment_moments_soa(
        xt, yt, zt, v, seg, k_max,
        classes=cls, num_class_slots=num_class_slots if tagged else 0,
        use_pallas=use_pallas, tags=(tag_z, tag_y, tag_x),
    )
    if not tagged:
        mom["class_hist"] = mom["counts"][:, None]
    occupied = mom["counts"] > 0
    seg_zyx = jnp.where(
        occupied[:, None],
        jnp.round(mom["tag_sums"]).astype(jnp.int32),
        _INT_MAX,
    )

    seg_centers = vx.voxel_to_metric_space(
        jnp.where(occupied[:, None], seg_zyx[:, ::-1], 0), voxel_size, offsets
    )
    means, covs = finalize_moments(
        mom["counts"], mom["sum_shift"], mom["sum_outer"], seg_centers
    )
    min_kl, max_kl = neighbor_min_kl(means, covs, mom["counts"], seg_zyx, lens)

    return NDTResult(
        means=means,
        covs=covs,
        counts=mom["counts"],
        class_hist=mom["class_hist"],
        zyx=seg_zyx,
        min_kl=min_kl,
        max_kl=max_kl,
        lens=lens,
        offsets=offsets,
        voxel_size=voxel_size,
        num_valid=jnp.minimum(total, k_max).astype(jnp.int32),
        converged=converged,
    )


def _emit(state: NDTResult, n_out: int, prune_order: str = "ascending"):
    """Steps 5-6: prune to n_out NDs and compact (ndt.c:28-117).

    prune_order: "ascending" removes the least-divergent first (the
    documented intent, README.md:6 / core/ndt.py:59-73); "legacy_c"
    replicates the C core's actual behavior (descending entry list,
    SURVEY.md §2.4) by removing the most-divergent first.

    Returns (points [n_out,3], covs [n_out,9], class_labels [n_out] i32,
    out_mask [n_out] bool). Rows beyond the kept count are zero/masked.
    """
    k = state.max_nds
    to_remove = jnp.maximum(state.num_valid - n_out, 0)
    # rank by min (or legacy: max) pair KL; stable keeps voxel-index order
    # among ties, padding slots (no valid pair / counts=0) sort last
    occupied = state.counts > 0
    if prune_order == "legacy_c":
        key = jnp.where(
            occupied & jnp.isfinite(state.max_kl), -state.max_kl, jnp.inf
        )
    else:
        key = jnp.where(occupied, state.min_kl, jnp.inf)
    ar = jnp.arange(k, dtype=jnp.int32)
    # sort 1: ascending prune key, payload = segment id. Row i of the
    # sorted order has rank i, so "rank[seg] < to_remove" is just a
    # position test in sorted space — the separate argsort-of-argsort
    # inverse-permutation pass is gone (VERDICT r3: K-row bookkeeping).
    _, seg_by_kl = jax.lax.sort((key, ar), num_keys=1, is_stable=True)
    kept_s = (ar >= to_remove) & occupied[seg_by_kl]

    # sort 2: stable compaction in ascending voxel-index order, replacing
    # to_point_cloud's sequential append (ndt.c:75-117); keys are unique
    # ints so one 3-operand sort yields both the gather perm and the out
    # mask. An r5 payload-mode variant (NDTPU_EMIT=payload: outputs ride
    # the compaction sort as 10 payload columns, zero output gathers —
    # the rewrite that cracked the KL stage) measured a TIE here
    # (canonical A/B 4.90 gather vs 4.98 payload ms, tpu_r5_emit_ab.log):
    # unlike KL's ~30-op composition, emit has only 3 gathers + 1 argmax
    # to delete, and the wider sort buys them back. Bit-identical either
    # way (goldens + the modes-agree check); the r4-proven gather path
    # stays default per the honest-tie rule (cf. the r4 KL-fusion revert).
    import os as _os
    if _os.environ.get("NDTPU_EMIT", "gather") == "gather":
        comp_key = jnp.where(kept_s, seg_by_kl, k + seg_by_kl)
        _, perm, kept_c = jax.lax.sort(
            (comp_key, seg_by_kl, kept_s.astype(jnp.int32)), num_keys=1
        )
        perm = perm[:n_out]
        out_mask = kept_c[:n_out] > 0
        pcl = jnp.where(out_mask[:, None], state.means[perm], 0.0)
        covs = jnp.where(
            out_mask[:, None], state.covs[perm].reshape(n_out, 9), 0.0
        )
        labels = jnp.where(
            out_mask,
            jnp.argmax(state.class_hist[perm], axis=1).astype(jnp.int32), 0,
        )
        return pcl, covs, labels, out_mask
    kept_seg = jnp.zeros((k,), bool).at[seg_by_kl].set(kept_s)
    comp_key = jnp.where(kept_seg, ar, k + ar)
    m = state.means
    c = state.covs
    labels_all = jnp.argmax(state.class_hist, axis=1).astype(jnp.int32)
    cols = jax.lax.sort(
        (comp_key, kept_seg.astype(jnp.int32),
         m[:, 0], m[:, 1], m[:, 2],
         c[:, 0, 0], c[:, 0, 1], c[:, 0, 2],
         c[:, 1, 1], c[:, 1, 2], c[:, 2, 2],
         labels_all),
        num_keys=1,
    )
    out_mask = cols[1][:n_out] > 0
    m0, m1, m2 = (col[:n_out] for col in cols[2:5])
    c0, c1, c2, c3, c4, c5 = (col[:n_out] for col in cols[5:11])
    pcl = jnp.where(out_mask[:, None], jnp.stack([m0, m1, m2], axis=1), 0.0)
    covs = jnp.where(
        out_mask[:, None],
        jnp.stack([c0, c1, c2, c1, c3, c4, c2, c4, c5], axis=1), 0.0,
    )
    labels = jnp.where(out_mask, cols[11][:n_out], 0)
    return pcl, covs, labels, out_mask


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_desired", "num_class_slots", "use_pallas", "prune_order",
        "search", "key_mode",
    ),
)
def ndt_downsample(points, n_desired: int, mask=None, classes=None,
                   num_class_slots: int = 1, use_pallas: bool = False,
                   prune_order: str = "ascending", search: str = "reference",
                   fixed_voxel_size=None, key_mode: str = "packed",
                   warm_start_size=None):
    """Full NDT downsample of one cloud (ndt_downsample, ndt.c:119-222).

    Args:
      points: [N, 3] float32.
      n_desired: static target ND count.
      mask: optional [N] bool validity (padding rows).
      classes: optional [N] int class tags in [0, num_class_slots).
      num_class_slots: static, = n_classes + 1 in reference terms.
      search: "reference" follows the C bisection trajectory exactly
        (ndt.c:136-187); "fast" reaches the same
        acceptance band in ~2-5 voxelizations via a seeded secant
        iteration; "probe" is "fast" with the cold seed evaluation
        replaced by a subsampled Chao1 occupancy probe (the r5 throughput
        default: ~1 full payload sort per cold cloud instead of >= 2,
        same acceptance band, same converged semantics — see
        _probe_seed_size); "grid" evaluates 6 candidates per round in one fused
        multi-row sort (~2-3 rounds) — fewer sequential rounds, but
        measured slower than "fast" on the current backend, where a G-row
        sort costs ~3x a single-row sort (sort-scaling measurement in
        BASELINE.md); kept for backends where wide sorts are closer to
        free.
      fixed_voxel_size: optional runtime scalar; skips the search entirely
        (one voxelization) — for production streams where consecutive
        clouds share statistics, reuse `state.voxel_size` from a previous
        frame. The prune still trims to exactly n_desired when at least
        n_desired voxels are occupied.
      warm_start_size: optional runtime scalar seeding the "fast" search's
        first evaluation (e.g. the previous frame's/batch's accepted
        ``state.voxel_size``). Unlike fixed_voxel_size the acceptance band
        is still enforced — an in-band seed costs one voxelization
        (streaming speed), an out-of-band one falls back to the searched
        trajectory. Ignored by the other search modes.
      key_mode: "packed" (default) keys voxels with one packed int32 —
        the search's lower bound is clamped to the < 2^31-cell grid
        envelope, and `converged` is False whenever that clamp prevented
        reaching the acceptance band (dense cluster + km-scale outlier).
        "pair" keys voxels with the (zy, x) int32 pair — one extra sort
        column, exact out to len_z*len_y < 2^31 grids (axes each < 2^24,
        the f32 tag-column envelope), for clouds where the packed
        envelope binds.

    Returns (pcl [n_desired,3], covs [n_desired,9], labels [n_desired] i32,
    out_mask [n_desired] bool, state: NDTResult).
    """
    points = points.astype(jnp.float32)
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    if classes is None:
        classes = jnp.zeros((n,), jnp.int32)
    k_max = max_segments(n_desired)

    # split to structure-of-arrays once: everything downstream works on
    # compact [N] vectors (TPU bills an [N, 3] pass as [N, 128] — lane
    # padding; see _voxel_keys)
    px, py, pz = points[:, 0], points[:, 1], points[:, 2]

    def limits(p):
        big = jnp.asarray(jnp.finfo(p.dtype).max, p.dtype)
        return (
            jnp.min(jnp.where(mask, p, big)),
            jnp.max(jnp.where(mask, p, -big)),
        )

    (x0, x1), (y0, y1), (z0, z1) = limits(px), limits(py), limits(pz)
    mins = jnp.stack([x0, y0, z0])
    maxs = jnp.stack([x1, y1, z1])
    if key_mode == "pair":
        envelope = _min_pair_packable_voxel_size(mins, maxs)
    else:
        envelope = _min_packable_voxel_size(mins, maxs)
    presorted = None  # the fast search supplies the build's sort itself
    if fixed_voxel_size is not None:
        # clamp into the key-packing envelope (no-op for any size the
        # search itself could have produced); a binding clamp coarsens
        # the grid, so it must not report converged (ADVICE r1)
        requested = jnp.asarray(fixed_voxel_size, jnp.float32)
        voxel_size = jnp.maximum(requested, envelope)
        converged = voxel_size <= requested
    elif search == "grid":
        # fused multi-candidate rounds (see _search_voxel_size_grid);
        # same acceptance band, lower bound clamped to the build envelope
        voxel_size, converged = _search_voxel_size_grid(
            px, py, pz, mask, n_desired, mins, maxs,
            pair=(key_mode == "pair"), lo_min=envelope,
        )
    elif search in ("fast", "probe"):
        # our own trajectory: lower bound clamped to the build envelope up
        # front (every guess is buildable, counts exact throughout), with
        # the payload riding along in each count sort — the accepted
        # iteration's sort feeds _build_state directly, saving one full
        # payload sort per call (see _search_and_sort_fast). "probe"
        # additionally replaces the cold seed evaluation with a
        # subsampled Chao1 occupancy probe (~1/5 of a key sort) whose
        # steered size typically lands evaluation 0 in band — cold cost
        # drops from >= 2 full payload sorts to ~1 (see _probe_seed_size);
        # acceptance stays exact, a warm seed takes precedence
        override = warm_start_size
        if search == "probe" and warm_start_size is None:
            override = _probe_seed_size(
                px, py, pz, mask, n_desired, mins, maxs, lo_min=envelope,
            )
        voxel_size, converged, presorted = _search_and_sort_fast(
            px, py, pz, mask, classes, n_desired, mins, maxs,
            lo_min=envelope, tagged=num_class_slots > 1, key_mode=key_mode,
            size0_override=override,
        )
    else:
        # exact C bisection trajectory (ndt.c:136-187): counts use the
        # (zy, x) pair key, exact out to len_z*len_y < 2^31 — the lower
        # clamp to the PAIR envelope binds only where the C core's dense
        # grid alloc (>400 GB) cannot run at all. The accepted size is
        # then clamped into the build envelope; if that coarsens the grid,
        # converged flips to False instead of silently collapsing the
        # output (ADVICE r1: dense cluster + km-scale GPS outlier).
        voxel_size, converged = _search_voxel_size(
            px, py, pz, mask, n_desired, mins, maxs,
            count_fn=_count_occupied_pair,
            lo_min=_min_pair_packable_voxel_size(mins, maxs),
        )
        clamped = jnp.maximum(voxel_size, envelope)
        converged &= clamped <= voxel_size
        voxel_size = clamped
    state = _build_state(
        px, py, pz, mask, classes, num_class_slots, voxel_size, converged,
        mins, maxs, k_max, use_pallas=use_pallas, key_mode=key_mode,
        presorted=presorted,
    )
    pcl, covs, labels, out_mask = _emit(state, n_desired, prune_order)
    return pcl, covs, labels, out_mask, state


@functools.partial(jax.jit, static_argnames=("n_out", "prune_order"))
def ndt_prune(state: NDTResult, n_out: int, prune_order: str = "ascending"):
    """Second-stage prune to a coarser resolution (prune_nds + to_point_cloud
    via ndt_legacy.py:173-240). Continuing the ascending removal from the
    retained state is exactly re-ranking with a larger to_remove — the
    removed set is a prefix of the same min-KL ordering."""
    return _emit(state, n_out, prune_order)


class NDTSampler:
    """Host-side convenience wrapper mirroring the reference sampler API
    (`NDT_Sampler.{downsample, prune, cleanup}`, ndt_legacy.py:45-240), with
    the native pointer state replaced by an NDTResult pytree.
    """

    def __init__(self, point_cloud, classes=None, num_classes: int = 0):
        import numpy as np

        self._points = jnp.asarray(np.asarray(point_cloud, dtype="float32"))
        if classes is not None:
            self._classes = jnp.asarray(np.asarray(classes, dtype="int32"))
        else:
            self._classes = None
        self._num_class_slots = int(num_classes) + 1
        self._state: Optional[NDTResult] = None

    def downsample(self, num_desired_nds: int):
        pcl, covs, labels, mask, state = ndt_downsample(
            self._points,
            int(num_desired_nds),
            None,
            self._classes,
            num_class_slots=self._num_class_slots,
        )
        self._state = state
        import numpy as np

        return (
            np.asarray(pcl, dtype=np.float64),
            np.asarray(covs, dtype=np.float64),
            np.asarray(labels, dtype=np.uint16),
        )

    def prune(self, num_desired_nds: int):
        if self._state is None:
            raise RuntimeError("call downsample() before prune()")
        if int(num_desired_nds) > int(self._state.num_valid):
            # reference parity: prune_nds errors when the target exceeds the
            # valid count (ndt.c:36-39 / core/ndt.py:53-54)
            raise ValueError(
                "Number of desired normal distributions is greater than the "
                "number of valid distributions!"
            )
        pcl, covs, labels, mask = ndt_prune(self._state, int(num_desired_nds))
        import numpy as np

        return (
            np.asarray(pcl, dtype=np.float64),
            np.asarray(covs, dtype=np.float64),
            np.asarray(labels, dtype=np.uint16),
        )

    def cleanup(self):
        """No native memory to free — kept for API parity
        (ndt_legacy.py:84-108)."""
        self._state = None
