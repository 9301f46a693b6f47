"""Microbenchmark the moment-stage PREP subgraph — everything between the
accepted payload sort and the fused Pallas kernel in `_build_from_sorted`
(ndtpu/core/ndt.py): key decode, boundary flags, the seg-id cumsum, center
shifts, validity and tag masking.

The r4 sub-blocked kernel cut the kernel itself to ~0.05-0.45 ms, but the
cumulative "moments" stage increment also carries this prep. Modes isolate
where that remainder lives at the canonical flattened shape [16, 70000]:

  prep_full      the whole prep subgraph (decode -> tags), XLA cumsum
  prep_matmul    same, cumsum replaced by the blocked matmul form
  prep_nocumsum  elementwise-only (seg ids supplied precomputed)
  cumsum         jnp.cumsum over [B, N] i32 alone
  cumsum_matmul  blocked cumsum-as-matmul over [B, N] i32 alone
                 ([B, nb, blk] @ lower-triangular [blk, blk] on the MXU +
                 tiny exclusive scan of block sums — exact in f32 for
                 sums < 2^24)

Timing protocol: on-device lax.scan loop + RTT subtraction (CLAUDE.md).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("NDTPU_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["NDTPU_PLATFORM"])

_INT_MAX = np.iinfo(np.int32).max


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--n", type=int, default=70000)
    p.add_argument("--k", type=int, default=1256)
    p.add_argument("--mode", default="prep_full",
                   choices=["prep_full", "prep_matmul", "prep_nocumsum",
                            "cumsum", "cumsum_matmul"])
    p.add_argument("--blk", type=int, default=512,
                   help="block length for the matmul cumsum")
    p.add_argument("--inner", type=int, default=32)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, N, K = args.batch, args.n, args.k
    # realistic sorted occupancy: K segments, ~uniform sizes, ~2% invalid
    # tail (INT_MAX-key padding), pair-mode keys zy = z*len_y + y
    len_x = len_y = len_z = 40
    seg_np = np.sort(rng.integers(0, K, size=(B, N)), axis=1)
    n_valid = int(N * 0.98)
    zy_np = np.where(np.arange(N)[None, :] < n_valid,
                     (seg_np // len_x).astype(np.int32), _INT_MAX)
    x_np = np.where(np.arange(N)[None, :] < n_valid,
                    (seg_np % len_x).astype(np.int32), _INT_MAX)
    pts_np = rng.normal(size=(3, B, N)).astype(np.float32) * 5.0

    zy = jnp.asarray(zy_np)
    xk = jnp.asarray(x_np)
    pxs, pys, pzs = (jnp.asarray(pts_np[i]) for i in range(3))
    voxel_size = jnp.full((B,), 0.35, jnp.float32)
    offs = jnp.tile(jnp.asarray([-7.0, -7.0, -7.0], jnp.float32), (B, 1))
    lens = jnp.tile(jnp.asarray([len_x, len_y, len_z], jnp.int32), (B, 1))

    blk = args.blk
    nb = (N + blk - 1) // blk
    n_pad = nb * blk - N
    tri = jnp.asarray(np.tril(np.ones((blk, blk), np.float32)))

    def matmul_cumsum(flags_f32):
        # [N] f32 0/1 -> inclusive cumsum, exact for totals < 2^24
        fpad = jnp.pad(flags_f32, (0, n_pad))
        blocks = fpad.reshape(nb, blk)
        within = jax.lax.dot_general(
            blocks, tri, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [nb, blk] inclusive within-block
        sums = within[:, -1]
        carry = jnp.cumsum(sums) - sums  # tiny [nb] exclusive scan
        return (within + carry[:, None]).reshape(-1)[:N]

    def prep(zy_r, x_r, px, py, pz, vs, off, ln, seg_pre, cumsum_kind):
        valid = zy_r != _INT_MAX
        z = jnp.where(valid, zy_r // ln[1], _INT_MAX)
        y = jnp.where(valid, zy_r % ln[1], _INT_MAX)
        xx = x_r
        new_seg = jnp.ones((N,), bool).at[1:].set(
            (zy_r[1:] != zy_r[:-1]) | (x_r[1:] != x_r[:-1])
        )
        new_seg &= valid
        if cumsum_kind == "xla":
            seg = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
        elif cumsum_kind == "matmul":
            seg = matmul_cumsum(new_seg.astype(jnp.float32)).astype(
                jnp.int32) - 1
        else:
            seg = seg_pre
        seg = jnp.where(valid & (seg < K) & (seg >= 0), seg, K)

        def center(c, axis):
            return (jnp.where(valid, c, 0).astype(jnp.float32) + 0.5) * vs \
                + off[axis]

        v = valid.astype(jnp.float32)
        xt = jnp.where(valid, px - center(xx, 0), 0.0)
        yt = jnp.where(valid, py - center(y, 1), 0.0)
        zt = jnp.where(valid, pz - center(z, 2), 0.0)
        tag_z = jnp.where(new_seg, z, 0).astype(jnp.float32)
        tag_y = jnp.where(new_seg, y, 0).astype(jnp.float32)
        tag_x = jnp.where(new_seg, xx, 0).astype(jnp.float32)
        return (jnp.sum(xt) + jnp.sum(yt) + jnp.sum(zt) + jnp.sum(v)
                + jnp.sum(tag_z + tag_y + tag_x)
                + jnp.sum(seg).astype(jnp.float32))

    seg_pre = jnp.asarray(seg_np.astype(np.int32))

    if args.mode.startswith("prep"):
        kind = {"prep_full": "xla", "prep_matmul": "matmul",
                "prep_nocumsum": "pre"}[args.mode]

        def fn(c):
            return jnp.sum(jax.vmap(
                lambda *a: prep(*a, cumsum_kind=kind)
            )(zy, xk, pxs + c * 1e-20, pys, pzs, voxel_size, offs, lens,
              seg_pre))
    elif args.mode == "cumsum":
        flags = jnp.asarray((seg_np[:, 1:] != seg_np[:, :-1]))
        flags = jnp.pad(flags, ((0, 0), (1, 0))).astype(jnp.int32)

        def fn(c):
            s = jnp.cumsum(flags + jnp.round(c * 1e-20).astype(jnp.int32),
                           axis=1)
            return jnp.sum(s).astype(jnp.float32)
    else:  # cumsum_matmul
        flags = jnp.asarray((seg_np[:, 1:] != seg_np[:, :-1]))
        flags = jnp.pad(flags, ((0, 0), (1, 0))).astype(jnp.float32)

        def fn(c):
            s = jax.vmap(matmul_cumsum)(flags + c * 1e-20)
            return jnp.sum(s)

    @jax.jit
    def repeat(c0):
        def body(carry, _):
            return carry + fn(carry), None

        total, _ = jax.lax.scan(body, c0, None, length=args.inner)
        return total

    from bench import measure_rtt

    rtt = measure_rtt()
    float(repeat(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        float(repeat(jnp.float32(0.0)))
    raw = (time.perf_counter() - t0) / args.iters / args.inner
    dt = raw - rtt / args.inner
    # a measurement at or below the RTT floor is noise, not data (ADVICE
    # r4: a clamped 0.0 reads as a real sub-resolution number) — mark it
    below_floor = dt <= 0
    print(json.dumps({
        "metric": "prep_micro_ms", "mode": args.mode, "blk": args.blk,
        "ms_per_batch": None if below_floor else round(dt * 1000, 3),
        "below_floor": below_floor,
        "raw_ms_per_batch": round(raw * 1000, 3),
        "rtt_ms": round(rtt * 1000, 2),
    }))


if __name__ == "__main__":
    main()
