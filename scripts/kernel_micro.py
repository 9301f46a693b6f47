"""Microbenchmark the segment-sum kernel in isolation (vs XLA scatter-add)
at the canonical NDT shape: B=16, N=70k, F=42, K=1209 dense sorted ranks.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# pin the backend BEFORE any jax use (the env var alone is ignored: this
# image's sitecustomize force-registers the tunneled TPU)
if os.environ.get("NDTPU_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["NDTPU_PLATFORM"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--n", type=int, default=70000)
    p.add_argument("--f", type=int, default=42)
    p.add_argument("--k", type=int, default=1209)
    p.add_argument("--mode", type=str, default="pallas",
                   choices=["pallas", "xla", "none", "sort1", "sort2",
                            "sort4", "sort5", "sort7", "moments",
                            "moments_noflop", "moments_empty",
                            "kl_full", "kl_sorts", "kl_evals",
                            "kl_gathers", "kl_scatter", "kl_payload"],
                   help="'none' times only the input perturbation loop; "
                        "sortN times an N-operand lax.sort over [B, N]; "
                        "the moments* trio isolates the fused moment "
                        "kernel's cost structure at the production grid: "
                        "'moments' = the real kernel, 'moments_noflop' = "
                        "same DMAs + VPU feats build, matmul replaced by "
                        "a row reduce, 'moments_empty' = same grid/DMAs "
                        "with an empty body (the per-grid-step floor); "
                        "the kl_* family decomposes the KL stage at "
                        "K-row scale (VERDICT r5 item 5): kl_full = the "
                        "production neighbor_min_kl, kl_sorts = the two "
                        "3-operand K-row re-sorts, kl_evals = the 6 "
                        "gaussian_kl evaluations on pre-gathered rows, "
                        "kl_gathers = the per-axis segment gathers, "
                        "kl_scatter = the 6 inverse-permutation "
                        "scatter-sets, kl_payload = the candidate "
                        "rewrite (moments ride the re-sorts as payload; "
                        "zero segment gathers)")
    p.add_argument("--slots", type=int, default=1)
    p.add_argument("--k_max", type=int, default=1208,
                   help="padded K for the kl_* modes "
                        "(max_segments(1000) = 1208, the canonical row "
                        "count through the KL stage)")
    p.add_argument("--n_tags", type=int, default=3)
    p.add_argument("--inner", type=int, default=32)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(args.batch, args.n, args.f)).astype(np.float32)
    # dense sorted ranks, ~uniform segment sizes
    seg = np.sort(
        rng.integers(0, args.k, size=(args.batch, args.n)), axis=1
    )
    # make ranks dense: remap each row's values to 0..distinct-1
    for b in range(args.batch):
        _, seg[b] = np.unique(seg[b], return_inverse=True)
    seg = seg.astype(np.int32)

    feats_d = jnp.asarray(feats)
    seg_d = jnp.asarray(seg)

    if args.mode == "pallas":
        from ndtpu.ops.pallas.segment_moments import segment_sum_sorted

        def fn(f, s):
            return jax.vmap(
                lambda ff, ss: segment_sum_sorted(ff, ss, args.k)
            )(f, s)
    elif args.mode == "xla":
        def fn(f, s):
            return jax.vmap(
                lambda ff, ss: jax.ops.segment_sum(
                    ff, ss, num_segments=args.k, indices_are_sorted=True
                )
            )(f, s)
    elif args.mode.startswith("moments"):
        # probe trio at the PRODUCTION layout: flat [B*N] SoA vectors with
        # per-batch-offset dense sorted ids (exactly what the custom_vmap
        # rule feeds _call_moments_kernel), slots/tags as in the canonical
        # untagged inference pipeline (slots=1, 3 coordinate tag columns)
        import functools as ft

        from jax.experimental import pallas as pl

        from ndtpu.ops.pallas import segment_moments as sm
        from ndtpu.utils.platform import is_tpu

        block_n, sub_n = sm._block_config(None, args.n)
        rows = sm._round_up(
            max(args.k, sub_n + sm._SUBLANE), sm._SUBLANE
        )
        b = args.batch
        n_p = ((args.n + block_n - 1) // block_n) * block_n
        seg_p = np.full((b, n_p), sm._BIG, np.int32)
        seg_p[:, :args.n] = seg + (np.arange(b)[:, None] * rows)
        seg_flat = jnp.asarray(seg_p.reshape(b * n_p))

        def flat(x):
            out = np.zeros((b, n_p), np.float32)
            out[:, :args.n] = x
            return jnp.asarray(out.reshape(b * n_p))

        rngf = np.random.default_rng(2)
        xt = flat(rngf.normal(size=(b, args.n)).astype(np.float32))
        yt = flat(rngf.normal(size=(b, args.n)).astype(np.float32))
        zt = flat(rngf.normal(size=(b, args.n)).astype(np.float32))
        v = flat(np.ones((b, args.n), np.float32))
        cls = jnp.asarray(np.zeros((b * n_p,), np.int32))
        tags = [xt * 0.5 for _ in range(args.n_tags)]
        n_ops = 6 + args.n_tags
        f_out = 13 + args.slots + args.n_tags
        grid = (b * n_p // block_n,)

        def probe_call(kernel_body):
            return pl.pallas_call(
                kernel_body,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, 1, block_n), lambda i: (i, 0, 0))
                    for _ in range(n_ops)
                ],
                out_specs=pl.BlockSpec((b * rows, f_out), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((b * rows, f_out),
                                               jnp.float32),
                interpret=not is_tpu(),
            )

        def empty_body(*refs):
            out_ref = refs[-1]

            @pl.when(pl.program_id(0) == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

        def noflop_body(*refs):
            # reads every input block and builds the feature rows on the
            # VPU, but replaces the one-hot matmul with a row reduce into
            # a fixed 8-row strip — isolates matmul cost from DMA+VPU
            seg_ref, xt_ref, yt_ref, zt_ref, v_ref, cls_ref = refs[:6]
            tag_refs = refs[6:-1]
            out_ref = refs[-1]

            @pl.when(pl.program_id(0) == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            for j in range(block_n // sub_n):
                sl = pl.ds(j * sub_n, sub_n)
                segv = seg_ref[0, 0, sl]
                xtv = xt_ref[0, 0, sl]
                ytv = yt_ref[0, 0, sl]
                ztv = zt_ref[0, 0, sl]
                vv = v_ref[0, 0, sl]
                clsv = cls_ref[0, 0, sl]
                xx, xy, xz = xtv * xtv, xtv * ytv, xtv * ztv
                yy, yz, zz = ytv * ytv, ytv * ztv, ztv * ztv
                row_list = [vv, xtv, ytv, ztv, xx, xy, xz, xy, yy, yz,
                            xz, yz, zz]
                for c in range(args.slots):
                    row_list.append(vv * (clsv == c).astype(jnp.float32))
                for tr in tag_refs:
                    row_list.append(tr[0, 0, sl])
                feats = jnp.stack(row_list, axis=0)  # [F, sub_n]
                red = jnp.sum(
                    feats * (segv[None, :] >= 0), axis=1
                )  # [F], touches every element
                out_ref[pl.ds(0, sm._SUBLANE), :] += jnp.broadcast_to(
                    red[None, :], (sm._SUBLANE, f_out)
                )

        if args.mode == "moments":
            kern = ft.partial(
                sm._moments_kernel, block_n=block_n, sub_n=sub_n,
                rows=b * rows, slots=args.slots, n_tags=args.n_tags,
                bf16x3=False,
            )
        elif args.mode == "moments_noflop":
            kern = noflop_body
        else:
            kern = empty_body
        call = probe_call(kern)

        def rs(a):
            return a.reshape(grid[0], 1, block_n)

        def fn(f_unused, s_unused):
            out = call(
                rs(seg_flat), rs(xt + jnp.sum(f_unused[:1, :1, :1]) * 1e-20),
                rs(yt), rs(zt), rs(v), rs(cls), *[rs(t) for t in tags]
            )
            return jnp.sum(out[:1])

        print(f"[micro] moments probe: block {block_n} sub {sub_n} "
              f"grid {grid[0]} rows/el {rows}", file=sys.stderr)
    elif args.mode.startswith("kl"):
        # KL-stage decomposition at the canonical K-row scale. Inputs
        # mirror what _build_state hands neighbor_min_kl: lexicographically
        # sorted occupied-voxel coords with INT32_MAX padding, per-segment
        # moments, sample counts (ndtpu/core/kl.py:101-196).
        from ndtpu.core.kl import _pack_pair, gaussian_kl, neighbor_min_kl

        K = args.k_max
        kv = int(K * 0.91)  # ~1100 valid of 1208 (canonical occupancy)
        G = 40
        imax = np.iinfo(np.int32).max
        zyx_np = np.full((args.batch, K, 3), imax, np.int32)
        means_np = np.zeros((args.batch, K, 3), np.float32)
        covs_np = np.zeros((args.batch, K, 3, 3), np.float32)
        counts_np = np.zeros((args.batch, K), np.int32)
        for b in range(args.batch):
            lin = np.sort(rng.choice(G * G * G, size=kv, replace=False))
            z, rem = lin // (G * G), lin % (G * G)
            y, x = rem // G, rem % G
            zyx_np[b, :kv] = np.stack([z, y, x], axis=1)
            means_np[b, :kv] = (np.stack([x, y, z], axis=1) + 0.5
                                + rng.normal(scale=0.1, size=(kv, 3)))
            a = rng.normal(scale=0.3, size=(kv, 3, 3)).astype(np.float32)
            covs_np[b, :kv] = a @ a.transpose(0, 2, 1) + 0.05 * np.eye(3)
            counts_np[b, :kv] = rng.integers(2, 60, size=kv)
        zyx_d = jnp.asarray(zyx_np)
        means_d = jnp.asarray(means_np)
        covs_d = jnp.asarray(covs_np)
        counts_d = jnp.asarray(counts_np)
        lens_d = jnp.asarray(np.array([G, G, G], np.int32))
        perms = [jnp.asarray(rng.permutation(K).astype(np.int32))
                 for _ in range(2)]
        # kl modes use a small feats array purely as the anti-CSE carry
        feats_d = jnp.asarray(feats[:, :K, :4].copy())

        if args.mode == "kl_full":
            def fn(f, s):
                mp = means_d + f[:, :, :3] * 1e-20
                mn, mx = jax.vmap(
                    neighbor_min_kl, in_axes=(0, 0, 0, 0, None)
                )(mp, covs_d, counts_d, zyx_d, lens_d)
                return (jnp.where(jnp.isfinite(mn), mn, 0.0)
                        + jnp.where(jnp.isfinite(mx), mx, 0.0))
        elif args.mode == "kl_sorts":
            def fn(f, s):
                pert = jnp.round(f[:, :, 0] * 0).astype(jnp.int32)

                def one(zyx_row, p):
                    z, y, x = (zyx_row[:, 0] + p, zyx_row[:, 1],
                               zyx_row[:, 2])
                    idx = jnp.arange(K, dtype=jnp.int32)
                    zx, ys, py = jax.lax.sort(
                        (_pack_pair(z, x, lens_d[0]), y, idx), num_keys=3)
                    yx, zs, pz = jax.lax.sort(
                        (_pack_pair(y, x, lens_d[0]), z, idx), num_keys=3)
                    return (zx + ys + py + yx + zs + pz).astype(jnp.float32)

                return jax.vmap(one)(zyx_d, pert)
        elif args.mode == "kl_evals":
            def fn(f, s):
                mp = means_d + f[:, :, :3] * 1e-20

                def one(m, c):
                    tot = jnp.zeros((K - 3,), jnp.float32)
                    for shift in (1, 2, 3):  # 3 axes x 2 directions
                        ka, _ = gaussian_kl(m[:-shift], c[:-shift],
                                            m[shift:], c[shift:])
                        kb, _ = gaussian_kl(m[shift:], c[shift:],
                                            m[:-shift], c[:-shift])
                        tot += (jnp.nan_to_num(ka[: K - 3])
                                + jnp.nan_to_num(kb[: K - 3]))
                    return tot

                return jax.vmap(one)(mp, covs_d)
        elif args.mode == "kl_gathers":
            def fn(f, s):
                mp = means_d + f[:, :, :3] * 1e-20

                def one(m, c, cnt):
                    tot = jnp.float32(0.0)
                    for p in (jnp.arange(K, dtype=jnp.int32), *perms):
                        a, b = p[:-1], p[1:]
                        tot += (jnp.sum(m[a]) + jnp.sum(m[b])
                                + jnp.sum(c[a]) + jnp.sum(c[b])
                                + jnp.sum(cnt[a]).astype(jnp.float32)
                                + jnp.sum(cnt[b]).astype(jnp.float32))
                    return tot

                return jax.vmap(one)(mp, covs_d, counts_d)
        elif args.mode == "kl_scatter":
            def fn(f, s):
                def one(vals):
                    tot = jnp.float32(0.0)
                    for p in perms:
                        for col in range(3):
                            out = jnp.full((K,), jnp.inf).at[p].set(
                                vals[:, col])
                            tot += jnp.sum(jnp.where(
                                jnp.isfinite(out), out, 0.0))
                    return tot

                return jax.vmap(one)(means_d + f[:, :, :3] * 1e-20)
        else:  # kl_payload — the candidate zero-gather rewrite's cost shape
            def fn(f, s):
                mp = means_d + f[:, :, :3] * 1e-20

                def one(zyx_row, m, c, cnt):
                    z, y, x = zyx_row[:, 0], zyx_row[:, 1], zyx_row[:, 2]
                    idx = jnp.arange(K, dtype=jnp.int32)
                    c6 = (c[:, 0, 0], c[:, 0, 1], c[:, 0, 2],
                          c[:, 1, 1], c[:, 1, 2], c[:, 2, 2])
                    payload = (idx, m[:, 0], m[:, 1], m[:, 2], *c6,
                               cnt.astype(jnp.float32))
                    tot = jnp.float32(0.0)
                    for maj, mi in ((_pack_pair(z, x, lens_d[0]), y),
                                    (_pack_pair(y, x, lens_d[0]), z)):
                        cols = jax.lax.sort((maj, mi) + payload,
                                            num_keys=2)
                        ms = jnp.stack(cols[3:6], axis=1)
                        cv = cols[6:12]
                        cs = jnp.stack(
                            [jnp.stack([cv[0], cv[1], cv[2]], -1),
                             jnp.stack([cv[1], cv[3], cv[4]], -1),
                             jnp.stack([cv[2], cv[4], cv[5]], -1)], -2)
                        ka, _ = gaussian_kl(ms[:-1], cs[:-1],
                                            ms[1:], cs[1:])
                        kb, _ = gaussian_kl(ms[1:], cs[1:],
                                            ms[:-1], cs[:-1])
                        perm = cols[2]
                        mn = jnp.concatenate([ka, jnp.zeros((1,))])
                        mx = jnp.concatenate([jnp.zeros((1,)), kb])
                        o1 = jnp.full((K,), jnp.inf).at[perm].set(mn)
                        o2 = jnp.full((K,), -jnp.inf).at[perm].set(mx)
                        tot += jnp.sum(jnp.where(jnp.isfinite(o1), o1, 0.0)
                                       + jnp.where(jnp.isfinite(o2), o2,
                                                   0.0))
                    # the free +-x axis: shifted evals, no sort
                    ka, _ = gaussian_kl(m[:-1], c[:-1], m[1:], c[1:])
                    kb, _ = gaussian_kl(m[1:], c[1:], m[:-1], c[:-1])
                    return (tot + jnp.sum(jnp.nan_to_num(ka))
                            + jnp.sum(jnp.nan_to_num(kb)))

                return jax.vmap(one)(zyx_d, mp, covs_d, counts_d)
    elif args.mode.startswith("sort"):
        n_ops = int(args.mode[4:])
        keys = jnp.asarray(
            rng.integers(0, 1 << 20, size=(args.batch, args.n)).astype(
                np.int32
            )
        )

        def fn(f, s):
            k0 = keys + jnp.round(f[:, :, 0] * 0).astype(jnp.int32)
            ops = [k0, s] + [f[:, :, i % args.f] for i in range(n_ops - 2)]
            out = jax.vmap(
                lambda *a: jax.lax.sort(a, num_keys=min(2, n_ops))
            )(*ops[:n_ops])
            return out[0][:, :1].astype(jnp.float32)
    else:
        def fn(f, s):
            return jnp.sum(f, axis=1)[:, None, :] * 0.0

    @jax.jit
    def repeat(f, s):
        def body(carry, _):
            out = fn(f + carry * 1e-20, s)
            return jnp.sum(out), None

        total, _ = jax.lax.scan(
            body, jnp.float32(0.0), None, length=args.inner
        )
        return total

    from bench import measure_rtt

    rtt = measure_rtt()
    float(repeat(feats_d, seg_d))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        float(repeat(feats_d, seg_d))
    raw = (time.perf_counter() - t0) / args.iters / args.inner
    dt = max(raw - rtt / args.inner, 1e-9)  # subtract the per-call RTT floor
    print(json.dumps({
        "metric": "kernel_micro_ms", "mode": args.mode,
        "block": os.environ.get("NDTPU_PALLAS_BLOCK", "default"),
        "ms_per_batch": round(dt * 1000, 2),
        "raw_ms_per_batch": round(raw * 1000, 2),
        "rtt_ms": round(rtt * 1000, 2),
    }))


if __name__ == "__main__":
    main()
