#!/usr/bin/env python
"""Offline (CPU) validation of the probe-seeded cold search.

The r4 measurement (BASELINE.md "search evaluation counts"): every cold
bench cloud converges in exactly 2 full evaluations — the geometric-mean
seed (voxel.c:28-59) misses the band, the first secant step (alpha=2)
from the seed's EXACT count lands in it. Each evaluation is a full [N]
payload sort (the pipeline's dominant stage), so cold = 2 sorts.

Idea under test: replace evaluation 0 with a SUBSAMPLED occupancy probe —
sort only N/f interleaved points, estimate the full-cloud occupied count,
and steer the secant identically. Acceptance remains exact (every full
sort verifies in-band; the probe only steers), so the figure of merit is
the number of FULL evaluations until acceptance: probe-seeded vs today's
exact-seeded trajectory. A probe as good as the exact count saves exactly
one full sort per cold batch.

Estimator: strided subsample 1/f with a nested half-depth 1/(2f)
(interleaved — a prefix half is spatially biased on cluster-ordered
clouds). Saturated regime (points-per-voxel >> f): d(1/f) ~= D already.
Sparse regime: two-depth extrapolation d_f/(1-(d_f/d_{f/2}-1)^2) under a
homogeneous-occupancy model. Both distributions of interest sit in the
saturated regime at the seed size (60+ points per occupied voxel).
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("NDTPU_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["NDTPU_PLATFORM"])

MAX_EVALS = 16  # MAX_GUESS_ITERATIONS + 1, matching the fused search


def trajectory(count_fn, s0, c0_hat, M, upper, target, lo0, hi0):
    """Replay _search_and_sort_fast's steering with evaluation 0 replaced
    by (s0, c0_hat) (exact when c0_hat is the exact count). Returns the
    number of FULL evaluations spent until in-band acceptance."""
    def ingest(guess, count, lo, hi, best_g, best_c):
        hit = M <= count <= upper
        if count >= M and count < best_c:
            best_g, best_c = guess, count
        if count > upper:
            lo = guess
        elif count < M:
            hi = guess
        return hit, lo, hi, best_g, best_c

    # evaluation 0: steering only (free when probed; the caller decides
    # what it cost). Its count may be approximate -> do NOT trust it for
    # acceptance, but brackets from it are how the real integration works.
    hit0, lo, hi, best_g, best_c = ingest(s0, c0_hat, lo0, hi0,
                                          0.0, float("inf"))
    pg, pc = 0.0, 0.0
    guess, countf = s0, float(c0_hat)
    full_evals = 0
    for it in range(1, MAX_EVALS + 1):
        # secant step in log-log space (ndt.py _search_and_sort_fast body)
        dlog_c = np.log(max(countf, 1.0) / max(pc, 1.0)) if pc > 0 else 0.0
        dlog_g = np.log(pg / guess) if pg > 0 else 0.0
        usable = pg > 0 and abs(dlog_g) > 1e-6 and abs(dlog_c) > 1e-6
        alpha = np.clip(dlog_c / dlog_g, 0.5, 4.0) if usable else 2.0
        ratio = max(countf, 1.0) / target
        secant = guess * ratio ** (1.0 / alpha)
        nxt = secant if lo < secant < hi else lo + (hi - lo) / 2.0
        c = count_fn(nxt)
        full_evals += 1
        hit, lo, hi, best_g, best_c = ingest(nxt, c, lo, hi, best_g, best_c)
        pg, pc, guess, countf = guess, countf, nxt, float(c)
        if hit:
            return full_evals, True
    return full_evals, False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_desired_nds", type=int, default=1000)
    p.add_argument("--n_samples", type=int, default=70000)
    p.add_argument("--clouds", type=int, default=16)
    p.add_argument("--factors", default="4,8,16")
    p.add_argument("--estimator", default="chao",
                   choices=["pair", "chao", "max"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import make_batch
    from ndtpu.core import ndt as nd
    from ndtpu.core import voxel as vx
    from ndtpu.data.synthetic import clustered_cloud, random_cloud

    M = args.n_desired_nds
    upper = int(M * (1.0 + nd.DOWNSAMPLE_UPPER_THRESHOLD))
    target = M * (1.0 + nd.DOWNSAMPLE_UPPER_THRESHOLD / 2.0)
    factors = [int(f) for f in args.factors.split(",")]

    @jax.jit
    def seed_and_limits(pts):
        mask = jnp.ones(pts.shape[:1], bool)
        mins, maxs = vx.pointcloud_limits(pts, mask)
        env = nd._min_packable_voxel_size(mins, maxs)
        s0, _, _ = vx.estimate_voxel_size(M, mins, maxs)
        s0 = jnp.clip(jnp.nan_to_num(s0, nan=1.0),
                      jnp.maximum(jnp.float32(nd.MIN_VOXEL_GUESS), env),
                      jnp.float32(nd.MAX_VOXEL_GUESS))
        return s0, mins, maxs, env

    count_jit = jax.jit(
        lambda px, py, pz, s, mins, maxs: nd._count_occupied(
            px, py, pz, jnp.ones_like(px, bool), s, mins, maxs))

    keys_jit = jax.jit(
        lambda px, py, pz, s, mins, maxs: nd._voxel_keys(
            px, py, pz, jnp.ones_like(px, bool), s, mins, maxs)[0])

    def key_of(sub, s, mins, maxs):
        return np.asarray(keys_jit(
            jnp.asarray(sub[:, 0]), jnp.asarray(sub[:, 1]),
            jnp.asarray(sub[:, 2]), jnp.float32(s), mins, maxs))

    def run_dist(name, clouds):
        evals_exact, evals_probe = [], {f: [] for f in factors}
        est_err = {f: [] for f in factors}
        for c in clouds:
            px, py, pz = (jnp.asarray(c[:, i]) for i in range(3))
            s0_j, mins, maxs, env = seed_and_limits(jnp.asarray(c))
            s0 = float(s0_j)
            lo0 = max(nd.MIN_VOXEL_GUESS, float(env))
            hi0 = max(nd.MAX_VOXEL_GUESS, lo0)
            count_fn = lambda s: int(count_jit(px, py, pz, jnp.float32(s),
                                               mins, maxs))
            c0 = count_fn(s0)
            ex_evals, _ = trajectory(count_fn, s0, c0, M, upper, target,
                                     lo0, hi0)
            evals_exact.append(1 + ex_evals)  # eval 0 was a full sort too
            for f in factors:
                d_full = int(count_jit(px[::f], py[::f], pz[::f],
                                       jnp.float32(s0), mins, maxs))
                d_half = int(count_jit(px[::2 * f], py[::2 * f],
                                       pz[::2 * f], jnp.float32(s0),
                                       mins, maxs))
                ratio = d_full / max(d_half, 1)
                su = np.clip(ratio - 1.0, 0.0, 0.95)
                d_pair = d_full / max(1.0 - su * su, 1e-3)
                # Chao1 from the subsample's occupancy run lengths
                # (singletons f1, doubletons f2): D = d + f1^2/(2 f2)
                sub = np.asarray(c[::f])
                keys = key_of(sub, s0, mins, maxs)
                _, counts = np.unique(keys, return_counts=True)
                f1 = int((counts == 1).sum())
                f2 = int((counts == 2).sum())
                d_chao = d_full + (f1 * (f1 - 1)) / (2.0 * (f2 + 1))
                d_hat = {"pair": d_pair, "chao": d_chao,
                         "max": max(d_pair, d_chao)}[args.estimator]
                est_err[f].append(d_hat / max(c0, 1) - 1.0)
                pr_evals, _ = trajectory(count_fn, s0, d_hat, M, upper,
                                         target, lo0, hi0)
                evals_probe[f].append(pr_evals)
        out = {"exact_full_evals_mean": float(np.mean(evals_exact))}
        msg = [f"exact {np.mean(evals_exact):.2f} full sorts"]
        for f in factors:
            errs = np.array(est_err[f])
            out[f"probe_1_{f}"] = {
                "full_evals_mean": float(np.mean(evals_probe[f])),
                "saved_vs_exact": float(np.mean(evals_exact)
                                        - np.mean(evals_probe[f])),
                "estimator_rel_err_mean": round(float(errs.mean()), 4),
                "estimator_rel_err_sd": round(float(errs.std()), 4),
            }
            msg.append(f"1/{f}: {np.mean(evals_probe[f]):.2f} "
                       f"(est err {errs.mean():+.1%}±{errs.std():.1%})")
        print(f"[probe] {name}: " + "; ".join(msg), file=sys.stderr,
              flush=True)
        return out

    results = {}
    results["bench"] = run_dist(
        "bench", list(make_batch(args.clouds, args.n_samples)))
    results["clustered"] = run_dist(
        "clustered", [clustered_cloud(args.n_samples, seed=i)
                      for i in range(args.clouds)])
    results["random"] = run_dist(
        "random", [random_cloud(args.n_samples, seed=i)
                   for i in range(args.clouds)])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
