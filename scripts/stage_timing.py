"""Fine-grained timing of the NDT build_state sub-stages on the current
device. Each stage is timed with the on-device scan protocol from bench.py
(scalar readback; see CLAUDE.md for why block_until_ready can't be trusted
on the tunneled backend).

Stages (cumulative structure of ndtpu/core/ndt.py::_build_state):
  sort      — voxel keys + payload sort (coords/classes ride as operands)
  segsum    — + boundary detection and the segment-moment accumulation
  moments   — + segment starts, voxel keys per segment, finalize
  kl        — + sorted-adjacency neighbor pairing + closed-form KL
  emit      — + prune ranking and compaction (the full downsample)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_samples", type=int, default=70000)
    p.add_argument("--n_desired_nds", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--n_classes", type=int, default=28)
    p.add_argument("--use_pallas", action="store_true")
    p.add_argument("--inner", type=int, default=16)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--stages", type=str, default="sort,moments,kl,emit",
                   help="comma-separated subset of "
                        "sort,segsum,moments,kl,emit")
    args = p.parse_args()
    known = {"sort", "segsum", "moments", "kl", "emit"}
    bad = set(args.stages.split(",")) - known
    if bad:
        p.error(f"unknown stage(s) {sorted(bad)}; choose from {sorted(known)}")

    import jax
    import jax.numpy as jnp

    from bench import make_batch
    from ndtpu.core import ndt as nd
    from ndtpu.core import voxel as vx
    from ndtpu.core.kl import neighbor_min_kl
    from ndtpu.core.moments import finalize_moments, segment_moments_soa

    M, C = args.n_desired_nds, args.n_classes + 1
    k_max = nd.max_segments(M)
    pts = jnp.asarray(make_batch(args.batch_size, args.n_samples))

    from bench import measure_rtt

    rtt = measure_rtt()

    def scan_time(fn, *inputs):
        @jax.jit
        def repeat(*a):
            def body(carry, _):
                out = fn(*((a[0] + carry * 1e-20,) + a[1:]))
                return jnp.sum(out), None

            total, _ = jax.lax.scan(
                body, jnp.float32(0.0), None, length=args.inner
            )
            return total

        float(repeat(*inputs))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            float(repeat(*inputs))
        return max(
            (time.perf_counter() - t0) / args.iters / args.inner
            - rtt / args.inner, 1e-9,
        )

    def prefix(stage):
        def one(p):
            n = p.shape[0]
            mask = jnp.ones((n,), bool)
            classes = jnp.zeros((n,), jnp.int32)
            mins, maxs = vx.pointcloud_limits(p, mask)
            px, py, pz = p[:, 0], p[:, 1], p[:, 2]
            vs, _ = nd._search_voxel_size_fast(
                px, py, pz, mask, M, mins, maxs,
                lo_min=nd._min_packable_voxel_size(mins, maxs),
            )

            _, lens, offsets = nd._voxel_keys(
                px, py, pz, mask, vs, mins, maxs
            )
            # production sort structure: stable key + payload, no
            # tie-break column (ndt._sort_payload_at)
            key, pxs, pys, pzs, cls = nd._sort_payload_at(
                px, py, pz, mask, classes, vs, mins, maxs, True, "packed"
            )
            valid_s = key != nd._INT_MAX
            lxy = lens[0] * lens[1]
            rem = key % lxy
            z = jnp.where(valid_s, key // lxy, nd._INT_MAX)
            y = jnp.where(valid_s, rem // lens[0], nd._INT_MAX)
            x = jnp.where(valid_s, rem % lens[0], nd._INT_MAX)
            if stage == "sort":
                return jnp.sum(pxs) + jnp.sum(key)

            new_seg = jnp.ones((n,), bool)
            new_seg = new_seg.at[1:].set(key[1:] != key[:-1])
            new_seg &= valid_s
            seg = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
            seg = jnp.where(valid_s & (seg < k_max) & (seg >= 0), seg, k_max)

            def center(c, axis):
                return vx.voxel_to_metric_axis(
                    jnp.where(valid_s, c, 0), vs, offsets[axis]
                )

            v = valid_s.astype(jnp.float32)
            xt = jnp.where(valid_s, pxs - center(x, 0), 0.0)
            yt = jnp.where(valid_s, pys - center(y, 1), 0.0)
            zt = jnp.where(valid_s, pzs - center(z, 2), 0.0)
            # per-segment voxel coords as sparse tag columns (mirrors
            # ndt._build_state — replaced the top_k starts compaction)
            tag_z = jnp.where(new_seg, z, 0).astype(jnp.float32)
            tag_y = jnp.where(new_seg, y, 0).astype(jnp.float32)
            tag_x = jnp.where(new_seg, x, 0).astype(jnp.float32)
            mom = segment_moments_soa(
                xt, yt, zt, v, seg, k_max,
                classes=cls, num_class_slots=C, use_pallas=args.use_pallas,
                tags=(tag_z, tag_y, tag_x),
            )
            if stage == "segsum":
                return jnp.sum(mom["sum_outer"]) + jnp.sum(mom["sum_shift"])
            occupied = mom["counts"] > 0
            seg_zyx = jnp.where(
                occupied[:, None],
                jnp.round(mom["tag_sums"]).astype(jnp.int32),
                nd._INT_MAX,
            )
            seg_centers = vx.voxel_to_metric_space(
                jnp.where(occupied[:, None], seg_zyx[:, ::-1], 0), vs, offsets
            )
            means, covs = finalize_moments(
                mom["counts"], mom["sum_shift"], mom["sum_outer"], seg_centers
            )
            if stage == "moments":
                return jnp.sum(means) + jnp.sum(covs)

            min_kl, _ = neighbor_min_kl(
                means, covs, mom["counts"], seg_zyx, lens
            )
            if stage == "kl":
                return jnp.sum(jnp.where(jnp.isfinite(min_kl), min_kl, 0.0))

            pcl, cv, labels, mask_out, _ = nd.ndt_downsample(
                p, M, num_class_slots=C, use_pallas=args.use_pallas,
                search="fast",
            )
            return jnp.sum(pcl) + jnp.sum(cv)

        return jax.jit(jax.vmap(one))

    results = {}
    for stage in args.stages.split(","):
        t = scan_time(prefix(stage), pts)
        results[stage] = round(t * 1000, 2)
        print(f"[stage] {stage}: {t*1000:.2f} ms/batch", file=sys.stderr)

    print(json.dumps({"metric": "stage_ms_cumulative", **results}))


if __name__ == "__main__":
    main()
