"""Closed-form Gaussian KL divergence on batched 3x3 covariances.

TPU-native replacement for the reference's per-pair GSL LU decomposition
(`core_legacy/src/kullback_leibler.c:28-127`): determinants and inverses of
3x3 matrices are analytic (rule of Sarrus / adjugate), so the whole
neighbor-KL pass is one fused batched elementwise computation — no
factorizations, no insertion sort (ordering is done globally by the pruner).

The divergence formula replicates the reference *exactly*, including its
non-standard determinant-ratio sign (kullback_leibler.c:115 computes
``− log(det q / det p)`` = ``+ log(det p / det q)``; the Python twin
`ndnet/preprocessing/core/kullback_leibler.py:55-62` agrees):

    KL(p, q) = 0.5 * (Δμᵀ Σq⁻¹ Δμ + tr(Σq⁻¹ Σp) + ln(det Σp / det Σq) − 3)

Validity masking mirrors kullback_leibler.c:42-78: pairs where either
distribution has ≤ 1 sample or a singular covariance are skipped.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def det3(m):
    """Analytic determinant of [..., 3, 3]."""
    return (
        m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
        - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
        + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0])
    )


def adjugate3(m):
    """Analytic adjugate of [..., 3, 3]; inverse = adj / det."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    cof = jnp.stack(
        [
            jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return cof


def gaussian_kl(mu_p, cov_p, mu_q, cov_q, rel_eps: float = 1e-6):
    """Reference-formula KL for batched Gaussians.

    Returns (kl [...], defined [...]) where `defined` is False when either
    covariance is singular (reference's -2 return, kullback_leibler.c:66-78).
    Singularity uses a scale-aware threshold |det| > rel_eps * (tr/3)^3
    rather than the reference's exact-zero compare: in floating point a
    rank-deficient covariance yields a tiny *noise* determinant (the f64
    reference included — its ==0 check almost never fires), and KL computed
    from it is unstable garbage that breaks run-to-run determinism of the
    prune ranking. Sample-count gating is the caller's job.
    """
    det_p = det3(cov_p)
    det_q = det3(cov_q)
    tr_p = jnp.trace(cov_p, axis1=-2, axis2=-1) / 3.0
    tr_q = jnp.trace(cov_q, axis1=-2, axis2=-1) / 3.0
    defined = (jnp.abs(det_p) > rel_eps * tr_p**3) & (
        jnp.abs(det_q) > rel_eps * tr_q**3
    )
    safe_det_q = jnp.where(det_q != 0.0, det_q, 1.0)

    q_inv = adjugate3(cov_q) / safe_det_q[..., None, None]
    diff = mu_q - mu_p  # [..., 3]
    quad = jnp.einsum("...i,...ij,...j->...", diff, q_inv, diff)
    trace = jnp.einsum("...ij,...ji->...", q_inv, cov_p)
    ratio = det_p / safe_det_q
    log_ratio = jnp.log(jnp.where(ratio > 0, ratio, 1.0))
    defined &= ratio > 0
    kl = 0.5 * (quad + trace + log_ratio - 3.0)
    defined &= jnp.isfinite(kl)
    return jnp.where(defined, kl, jnp.inf), defined


_INT32_MAX = jnp.iinfo(jnp.int32).max


def _inv_mode() -> str:
    # r4 TPU A/B (BASELINE.md): scatter-set 8.37 vs argsort 8.45 ms
    # canonical — a tie-to-slight-win, and one fewer K-row sort stage
    import os

    return os.environ.get("NDTPU_KL_INV", "scatter")


def _kl_mode() -> str:
    # r5 decomposition (BASELINE.md): the KL stage is op-count-bound —
    # its parts (2 K-row sorts ~0, 6 KL evals 0.08 ms, 18 gathers
    # 0.01 ms, 6 scatter-sets 0.32 ms) sum to ~0.4 ms while the gather
    # composition measures 1.49 ms: dozens of small sequential ops each
    # pay fixed stage latency. "payload" carries the moments THROUGH the
    # two re-sorts (13-operand sorts; payload columns are nearly free in
    # a stage-bound sort) so adjacent-row KL needs zero segment gathers;
    # bit-identical outputs (tests/test_kl.py), measured cost shape
    # 0.42 ms (kernel_micro --mode kl_payload).
    import os

    return os.environ.get("NDTPU_KL_MODE", "payload")


def _pack_pair(a, b, b_span):
    """Fuse (a, b) into a*b_span + b, preserving INT32_MAX padding. Exact
    whenever the two grid dims multiply below 2^31 — the same (generous)
    headroom argument as the zy key fusion in ndt._voxel_keys."""
    return jnp.where(a == _INT32_MAX, _INT32_MAX, a * b_span + b)


def neighbor_min_kl(means, covs, counts, zyx, lens):
    """Per-segment minimum AND maximum KL to its 6-connected occupied
    neighbors.

    Replaces `calculate_kl_divergences` (kullback_leibler.c:129-202) plus the
    global ordering consumed by the pruner: the sequential
    remove-lowest-then-skip loop (ndt.c:28-73 / core/ndt.py:37-75) removes
    exactly the first `to_remove` *distinct* p's in ascending divergence
    order, and a p's first appearance is its minimum divergence — so ranking
    segments by min KL reproduces the prune semantics with no serial loop.

    Neighbor pairing is adjacency in sorted key space, not search: the rows
    are lexicographically (z, y, x)-sorted, so ±x neighbors are *adjacent
    rows* with equal (z, y) and x differing by one; re-sorting the K keys by
    (z, x, y) and (y, x, z) — two K-row sorts, K = max NDs, not N points —
    exposes ±y and ±z the same way. This replaces the per-neighbor
    lexicographic binary search (12 dependent gather rounds, latency-bound
    on TPU) with three tiny sorts and shifted compares.

    Args:
      means [K, 3], covs [K, 3, 3], counts [K] int32.
      zyx   [K, 3] int32 voxel coords as (z, y, x), lexicographically sorted,
            INT32_MAX padding.
      lens  [3] i32 grid dims (x, y, z).

    Returns (min_kl [K], max_kl [K]) f32 (inf / -inf where the segment has
    no valid pair). min_kl drives the documented-intent ascending prune;
    max_kl drives the legacy C-core order (descending entry list,
    kullback_leibler.c:181-190 + ndt.c:49-67 — a documented reference bug
    kept available for bit-level behavioral comparison).
    """
    k = means.shape[0]
    if k < 2:
        return jnp.full((k,), jnp.inf), jnp.full((k,), -jnp.inf)
    z, y, x = zyx[:, 0], zyx[:, 1], zyx[:, 2]
    idx = jnp.arange(k, dtype=jnp.int32)
    if _kl_mode() == "payload":
        return _neighbor_min_kl_payload(means, covs, counts, z, y, x, idx,
                                        lens)

    def axis_contrib(major, minor, perm):
        """Adjacent-row pairs in one sorted order.

        major/minor: the sorted packed key and the fastest-varying coord;
        perm: segment id per sorted row. Pair i = (perm[i], perm[i+1]) is a
        real grid neighbor iff majors match and minors differ by one. Each
        ordered direction is one gaussian_kl; contributions land back in
        segment space by inverse-permutation *gather* (no scatter).
        """
        adj = (
            (major[:-1] == major[1:])
            & (major[:-1] != _INT32_MAX)
            & (minor[1:] == minor[:-1] + 1)
        )
        a, b = perm[:-1], perm[1:]
        # sample gating: both sides need > 1 sample (kullback_leibler.c:42-45)
        ok = adj & (counts[a] > 1) & (counts[b] > 1)
        kl_ab, def_ab = gaussian_kl(means[a], covs[a], means[b], covs[b])
        kl_ba, def_ba = gaussian_kl(means[b], covs[b], means[a], covs[a])
        ok_ab = ok & def_ab
        ok_ba = ok & def_ba
        inf = jnp.float32(jnp.inf)
        # sorted-row i's segment perm[i] sees pair i as p (forward) and
        # pair i-1 as p (backward)
        mn = jnp.minimum(
            jnp.concatenate([jnp.where(ok_ab, kl_ab, inf), inf[None]]),
            jnp.concatenate([inf[None], jnp.where(ok_ba, kl_ba, inf)]),
        )
        mx = jnp.maximum(
            jnp.concatenate([jnp.where(ok_ab, kl_ab, -inf), -inf[None]]),
            jnp.concatenate([-inf[None], jnp.where(ok_ba, kl_ba, -inf)]),
        )
        if _inv_mode() == "scatter":
            # perm is a permutation, so the inverse-gather is equivalently
            # ONE unique-index scatter-set (no K-row argsort). Default per
            # the r4 TPU A/B; NDTPU_KL_INV=argsort restores the r3 path.
            out_mn = jnp.full_like(mn, jnp.inf).at[perm].set(mn)
            out_mx = jnp.full_like(mx, -jnp.inf).at[perm].set(mx)
            return out_mn, out_mx
        inv = jnp.argsort(perm).astype(jnp.int32)  # segment -> sorted row
        return mn[inv], mx[inv]

    # ±x: rows already sorted by (z, y, x) — adjacency is free
    mn_x, mx_x = axis_contrib(_pack_pair(z, y, lens[1]), x, idx)
    # ±y: re-sort by (z, x, y); idx is both tie-break key and payload
    zx, ys, py = jax.lax.sort((_pack_pair(z, x, lens[0]), y, idx), num_keys=3)
    mn_y, mx_y = axis_contrib(zx, ys, py)
    # ±z: re-sort by (y, x, z)
    yx, zs, pz = jax.lax.sort((_pack_pair(y, x, lens[0]), z, idx), num_keys=3)
    mn_z, mx_z = axis_contrib(yx, zs, pz)

    min_kl = jnp.minimum(jnp.minimum(mn_x, mn_y), mn_z)
    max_kl = jnp.maximum(jnp.maximum(mx_x, mx_y), mx_z)
    return min_kl, max_kl


def _neighbor_min_kl_payload(means, covs, counts, z, y, x, idx, lens):
    """Payload-mode neighbor KL: moments ride the two K-row re-sorts.

    The r5 decomposition (kernel_micro kl_* modes, BASELINE.md) showed
    the gather-mode stage is op-count-bound: ~30 small sequential ops
    (sorts, 18 segment gathers, 6 evals, 6 scatter-sets) each pay fixed
    stage latency, totalling ~1.5 ms while the parts sum to ~0.4. Here
    each re-sort carries (idx, counts, mean xyz, the 6 unique covariance
    entries) as payload — payload operands are nearly free in a
    stage-bound sort (BASELINE.md sort table) — so the directional KLs
    are shifted-adjacent elementwise evals with ZERO segment gathers,
    and only ±y/±z need a scatter-set back to segment order (±x is
    already in segment order; the identity scatter is dropped).

    Bit-identical to the gather path (tests/test_kl.py): the sort keys
    (major, minor) are unique for valid rows and the stable sort orders
    INT32_MAX padding ties by input position — exactly the gather path's
    explicit idx tie-break key; carrying cov as 6 columns is exact
    because sum_outer's mirrored entries are bit-equal (IEEE a*b == b*a,
    same accumulation order — ndtpu/core/moments.py).
    """
    inf = jnp.float32(jnp.inf)
    c6 = (covs[:, 0, 0], covs[:, 0, 1], covs[:, 0, 2],
          covs[:, 1, 1], covs[:, 1, 2], covs[:, 2, 2])
    payload = (idx, counts, means[:, 0], means[:, 1], means[:, 2]) + c6

    def pair_minmax(major, minor, m, c, cnt):
        """Directional adjacent-row KLs in one sorted layout (the
        axis_contrib semantics of the gather path, zero gathers)."""
        adj = (
            (major[:-1] == major[1:])
            & (major[:-1] != _INT32_MAX)
            & (minor[1:] == minor[:-1] + 1)
        )
        ok = adj & (cnt[:-1] > 1) & (cnt[1:] > 1)
        kl_ab, def_ab = gaussian_kl(m[:-1], c[:-1], m[1:], c[1:])
        kl_ba, def_ba = gaussian_kl(m[1:], c[1:], m[:-1], c[:-1])
        ok_ab = ok & def_ab
        ok_ba = ok & def_ba
        mn = jnp.minimum(
            jnp.concatenate([jnp.where(ok_ab, kl_ab, inf), inf[None]]),
            jnp.concatenate([inf[None], jnp.where(ok_ba, kl_ba, inf)]),
        )
        mx = jnp.maximum(
            jnp.concatenate([jnp.where(ok_ab, kl_ab, -inf), -inf[None]]),
            jnp.concatenate([-inf[None], jnp.where(ok_ba, kl_ba, -inf)]),
        )
        return mn, mx

    def unpack(cols):
        perm, cnt = cols[0], cols[1]
        m = jnp.stack(cols[2:5], axis=1)
        cv = cols[5:11]
        c = jnp.stack(
            [jnp.stack([cv[0], cv[1], cv[2]], axis=-1),
             jnp.stack([cv[1], cv[3], cv[4]], axis=-1),
             jnp.stack([cv[2], cv[4], cv[5]], axis=-1)],
            axis=-2,
        )
        return perm, cnt, m, c

    # ±x: rows are already (z, y, x)-sorted segment order — no sort, and
    # the gather path's identity scatter-set is value-identical to a no-op
    mn_x, mx_x = pair_minmax(_pack_pair(z, y, lens[1]), x, means, covs,
                             counts)

    # ±y: re-sort by (z, x) major with y minor
    cols = jax.lax.sort((_pack_pair(z, x, lens[0]), y) + payload,
                        num_keys=2)
    perm, cnt, m, c = unpack(cols[2:])
    mn, mx = pair_minmax(cols[0], cols[1], m, c, cnt)
    mn_y = jnp.full_like(mn, jnp.inf).at[perm].set(mn)
    mx_y = jnp.full_like(mx, -jnp.inf).at[perm].set(mx)
    # ±z: re-sort by (y, x) major with z minor
    cols = jax.lax.sort((_pack_pair(y, x, lens[0]), z) + payload,
                        num_keys=2)
    perm, cnt, m, c = unpack(cols[2:])
    mn, mx = pair_minmax(cols[0], cols[1], m, c, cnt)
    mn_z = jnp.full_like(mn, jnp.inf).at[perm].set(mn)
    mx_z = jnp.full_like(mx, -jnp.inf).at[perm].set(mx)

    min_kl = jnp.minimum(jnp.minimum(mn_x, mn_y), mn_z)
    max_kl = jnp.maximum(jnp.maximum(mx_x, mx_y), mx_z)
    return min_kl, max_kl
