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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--n", type=int, default=70000)
    p.add_argument("--f", type=int, default=42)
    p.add_argument("--k", type=int, default=1209)
    p.add_argument("--mode", type=str, default="pallas",
                   choices=["pallas", "xla", "none", "sort1", "sort2",
                            "sort7"],
                   help="'none' times only the input perturbation loop; "
                        "sortN times an N-operand lax.sort over [B, N]")
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
