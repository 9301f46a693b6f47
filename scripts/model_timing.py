#!/usr/bin/env python
"""Per-stage timing of the NDTNetSegmentation forward (VERDICT r2 weak #1:
the model half ran at ~5% MXU utilization and nobody had profiled it).

Times standalone stage programs whose shapes/ops mirror
ndtpu/models/ndtnet.py exactly (reference architecture:
/root/reference/ndnet/models/ndtnet.py:112-243), using the on-device scan
protocol from bench.py (scalar readback — block_until_ready can't be
trusted on the tunneled backend, CLAUDE.md):

  tnet3    TNet(3) on [B, M, 3]  (pointnet.py:7-62)
  tnet64   TNet(64) on [B, M, 64]
  backbone Dense12->64+BN, 64->128+BN, 128->F+BN on [B, M, 12]
  head     seg head on [B, M, 64+F]: 3x(Dense+BN+ReLU) + Dense(C+1)
  full     the real NDTNetSegmentation forward (sum of the above + einsums)

Variants (--variants):
  flat     backbone/head with rows flattened to [B*M, F] (fewer dims)
  fold     backbone/head with inference BN folded into the Dense weights
           (pure matmul stack — measures what BN costs if XLA doesn't fuse)
  bf16     all stages in bfloat16

Prints one JSON line {stage: ms_per_batch}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("NDTPU_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["NDTPU_PLATFORM"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--n_desired_nds", type=int, default=1000)
    p.add_argument("--n_classes", type=int, default=28)
    p.add_argument("--feature_dim", type=int, default=768)
    p.add_argument("--dtype", type=str, default="f32", choices=["f32", "bf16"])
    p.add_argument("--inner", type=int, default=64)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--stages", type=str,
                   default="tnet3,tnet64,backbone,head,full")
    p.add_argument("--variants", type=str, default="",
                   help="comma-separated subset of flat,fold")
    args = p.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from ndtpu.models import NDTNetSegmentation
    from ndtpu.models.norm import BatchNorm
    from ndtpu.models.tnet import TNet

    B, M, C, F = (args.batch_size, args.n_desired_nds, args.n_classes,
                  args.feature_dim)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)

    from bench import measure_rtt

    rtt = measure_rtt()

    def scan_time(fn, *inputs):
        @jax.jit
        def repeat(*a):
            def body(carry, _):
                out = fn(*((a[0] + carry * 1e-20,) + a[1:]))
                return jnp.sum(out.astype(jnp.float32)), None

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

    class DenseBNStack(nn.Module):
        """Dense+BN chain (optionally +ReLU), the backbone/head building
        block (ndtnet.py:62-70, :120-123)."""
        feats: tuple
        relu: bool = False
        final_dense: int = 0

        @nn.compact
        def __call__(self, x):
            for f in self.feats:
                h = nn.Dense(f, dtype=dtype)(x)
                h = BatchNorm(use_running_average=True, dtype=dtype)(h)
                x = nn.relu(h) if self.relu else h
            if self.final_dense:
                x = nn.Dense(self.final_dense, dtype=dtype)(x)
            return x

    class FoldedStack(nn.Module):
        """The same chain with inference BN folded into the Dense weights
        (exact when use_running_average: BN is an affine y = a*x + b, so
        W' = W*a, b' = b*a + beta - mu*a)."""
        feats: tuple
        relu: bool = False
        final_dense: int = 0

        @nn.compact
        def __call__(self, x):
            for f in self.feats:
                h = nn.Dense(f, dtype=dtype)(x)
                x = nn.relu(h) if self.relu else h
            if self.final_dense:
                x = nn.Dense(self.final_dense, dtype=dtype)(x)
            return x

    def timed_module(mod, shape):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32), dtype)
        v = mod.init(jax.random.PRNGKey(0), x)
        return scan_time(lambda a: mod.apply(v, a), x)

    results = {}
    stages = args.stages.split(",") if args.stages else []
    variants = set(args.variants.split(",")) - {""}

    for stage in stages:
        if stage == "tnet3":
            t = timed_module(TNet(in_dim=3, dtype=dtype), (B, M, 3))
        elif stage == "tnet64":
            t = timed_module(TNet(in_dim=64, dtype=dtype), (B, M, 64))
        elif stage == "backbone":
            t = timed_module(
                DenseBNStack(feats=(64, 128, F)), (B, M, 12)
            )
        elif stage == "head":
            t = timed_module(
                DenseBNStack(feats=(512, 256, 128), relu=True,
                             final_dense=C + 1),
                (B, M, 64 + F),
            )
        elif stage == "full":
            model = NDTNetSegmentation(num_classes=C, feature_dim=F,
                                       dtype=dtype)
            pcl = jnp.asarray(
                rng.normal(size=(B, M, 3)).astype(np.float32)
            )
            covs = jnp.asarray(
                rng.normal(size=(B, M, 9)).astype(np.float32)
            )
            v = model.init(jax.random.PRNGKey(0), pcl, covs, train=False)
            t = scan_time(
                lambda a: model.apply(v, a, covs, train=False,
                                      return_logits=True),
                pcl,
            )
        else:
            raise SystemExit(f"unknown stage {stage}")
        results[stage] = round(t * 1000, 3)
        print(f"[model] {stage}: {t*1000:.3f} ms/batch", file=sys.stderr)

    if "flat" in variants:
        t = timed_module(DenseBNStack(feats=(64, 128, F)), (B * M, 12))
        results["backbone_flat"] = round(t * 1000, 3)
        t = timed_module(
            DenseBNStack(feats=(512, 256, 128), relu=True,
                         final_dense=C + 1),
            (B * M, 64 + F),
        )
        results["head_flat"] = round(t * 1000, 3)
        print(f"[model] flat: backbone {results['backbone_flat']} ms, "
              f"head {results['head_flat']} ms", file=sys.stderr)
    if "fold" in variants:
        t = timed_module(FoldedStack(feats=(64, 128, F)), (B, M, 12))
        results["backbone_fold"] = round(t * 1000, 3)
        t = timed_module(
            FoldedStack(feats=(512, 256, 128), relu=True,
                        final_dense=C + 1),
            (B, M, 64 + F),
        )
        results["head_fold"] = round(t * 1000, 3)
        print(f"[model] fold: backbone {results['backbone_fold']} ms, "
              f"head {results['head_fold']} ms", file=sys.stderr)

    print(json.dumps({"metric": "model_stage_ms", "dtype": args.dtype,
                      **results}))


if __name__ == "__main__":
    main()
