"""Per-voxel Gaussian moment estimation as a segment reduction.

TPU-native replacement for the reference's 8-pthread scatter with per-voxel
mutexes (`core_legacy/src/normal_distributions.c:28-137`, Welford updates at
:82-103, majority-vote class at :107-121). Locks are replaced by an
associative reduction: each point contributes (1, x̃, x̃x̃ᵀ, onehot(class))
to its voxel's accumulator, where x̃ = x − voxel_center. The voxel-center
shift keeps float32 exact where the reference needed float64: covariances of
far-from-origin coordinates would otherwise cancel catastrophically.

Finalization matches the reference's biased estimators:
    mean = center + Σx̃ / n                      (normal_distributions.c:82)
    cov  = Σx̃x̃ᵀ / n − (Σx̃/n)(Σx̃/n)ᵀ           (biased /n, :86)
Note the reference's *off-diagonal* update (:97) is a mathematically
inconsistent running approximation; we compute the exact biased covariance,
which is the documented intent (its diagonal matches the reference exactly).

Inputs are assumed sorted by segment (the NDT pipeline sorts points by voxel
key first), which lets XLA lower segment_sum efficiently; a fused Pallas
scatter-as-matmul kernel lives in ndtpu.ops.pallas.segment_moments.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_moments(points, centers, seg_ids, num_segments, valid=None,
                    classes=None, num_class_slots=0, use_pallas=False):
    """Accumulate per-segment Gaussian moments.

    Args:
      points:   [N, 3] float point coordinates (sorted by segment).
      centers:  [N, 3] per-point voxel centers (constant within a segment).
      seg_ids:  [N] int32 segment index per point, in [0, num_segments);
                invalid points must carry seg_ids == num_segments (dropped).
      num_segments: static int K.
      valid:    optional [N] bool; invalid rows are zero-weighted.
      classes:  optional [N] int32 class tags in [0, num_class_slots).
      num_class_slots: static int, reference's num_classes+1 slots
                (normal_distributions.c:158).
      use_pallas: accumulate with the fused Pallas kernel on TPU.

    Returns dict with:
      counts    [K] int32 — samples per segment
      sum_shift [K, 3] f32 — Σ(x − center)
      sum_outer [K, 3, 3] f32 — Σ(x − center)(x − center)ᵀ
      class_hist [K, C] int32 (present iff classes given)
    """
    n = points.shape[0]
    x = points - centers  # shifted coordinates, small magnitude
    outer = x[:, :, None] * x[:, None, :]  # [N, 3, 3]

    feats = jnp.concatenate(
        [jnp.ones((n, 1), points.dtype), x, outer.reshape(n, 9)], axis=1
    )  # [N, 13]
    if classes is not None:
        onehot = jax.nn.one_hot(classes, num_class_slots, dtype=points.dtype)
        feats = jnp.concatenate([feats, onehot], axis=1)
    if valid is not None:
        feats = jnp.where(valid[:, None], feats, 0.0)

    if use_pallas:
        from ndtpu.ops.pallas.segment_moments import segment_sum_sorted

        acc = segment_sum_sorted(feats, seg_ids, num_segments + 1)
    else:
        acc = jax.ops.segment_sum(
            feats, seg_ids, num_segments=num_segments + 1,
            indices_are_sorted=True,
        )
    acc = acc[:num_segments]  # row K collects the dropped/invalid points

    out = {
        "counts": jnp.round(acc[:, 0]).astype(jnp.int32),
        "sum_shift": acc[:, 1:4],
        "sum_outer": acc[:, 4:13].reshape(num_segments, 3, 3),
    }
    if classes is not None:
        out["class_hist"] = jnp.round(acc[:, 13:]).astype(jnp.int32)
    return out


def segment_moments_soa(xt, yt, zt, v, seg_ids, num_segments, classes=None,
                        num_class_slots=0, use_pallas=False, tags=None):
    """Structure-of-arrays variant of `segment_moments` for the NDT hot path.

    TPU lays narrow 2-D arrays out 128-lanes wide, so an [N, 42] feature
    matrix costs the HBM bandwidth of [N, 128]; 1-D component arrays pack
    tightly. This entry takes the shifted coordinates as three [N] vectors
    (pre-masked: invalid rows must already be zero), the validity as a f32
    [N] vector, and builds the 13(+C)-wide feature rows inside the Pallas
    kernel (never materializing them in HBM). The XLA fallback materializes
    the same columns and matches `segment_moments` bit for bit.

    tags: optional tuple of [N] f32 vectors, each nonzero on AT MOST ONE
    row per segment (e.g. a per-segment constant masked to the segment's
    first row). They ride the same contraction as extra columns, so each
    segment's output is that single row's value EXACTLY (one f32
    contribution, no accumulation error) — this is how the pipeline
    extracts per-segment voxel coordinates without a top_k/compaction pass
    over N. Returned as "tag_sums" [K, len(tags)].

    Returns the same dict contract as `segment_moments`.
    """
    n_tags = len(tags) if tags else 0
    if use_pallas:
        from ndtpu.ops.pallas.segment_moments import fused_moments_sorted

        cls = classes if classes is not None else jnp.zeros_like(seg_ids)
        acc = fused_moments_sorted(
            xt, yt, zt, v, cls.astype(jnp.int32), seg_ids,
            num_segments + 1,
            num_class_slots if classes is not None else 0,
            tags=tags,
        )
    else:
        cols = [
            v, xt, yt, zt,
            xt * xt, xt * yt, xt * zt,
            yt * xt, yt * yt, yt * zt,
            zt * xt, zt * yt, zt * zt,
        ]
        if classes is not None:
            cols += [
                v * (classes == c) for c in range(num_class_slots)
            ]
        if tags:
            cols += list(tags)
        feats = jnp.stack(cols, axis=1)
        acc = jax.ops.segment_sum(
            feats, seg_ids, num_segments=num_segments + 1,
            indices_are_sorted=True,
        )
    acc = acc[:num_segments]

    out = {
        "counts": jnp.round(acc[:, 0]).astype(jnp.int32),
        "sum_shift": acc[:, 1:4],
        "sum_outer": acc[:, 4:13].reshape(num_segments, 3, 3),
    }
    slots = num_class_slots if classes is not None else 0
    if classes is not None:
        out["class_hist"] = jnp.round(acc[:, 13:13 + slots]).astype(jnp.int32)
    if tags:
        out["tag_sums"] = acc[:, 13 + slots:13 + slots + n_tags]
    return out


def finalize_moments(counts, sum_shift, sum_outer, seg_centers):
    """Turn accumulated moments into (mean, covariance).

    seg_centers: [K, 3] voxel center per segment. Empty segments produce
    zero mean/cov (the reference leaves them zero-initialized,
    normal_distributions.c:164-170).
    """
    n = jnp.maximum(counts, 1).astype(sum_shift.dtype)[:, None]
    mean_shift = sum_shift / n  # [K, 3]
    mean = seg_centers + mean_shift
    cov = sum_outer / n[..., None] - mean_shift[:, :, None] * mean_shift[:, None, :]
    occupied = (counts > 0)[:, None]
    mean = jnp.where(occupied, mean, 0.0)
    cov = jnp.where(occupied[..., None], cov, 0.0)
    # NaN guards mirroring normal_distributions.c:87-99
    return jnp.nan_to_num(mean), jnp.nan_to_num(cov)
