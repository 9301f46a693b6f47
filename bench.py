"""Benchmark: NDT preprocess + forward throughput (clouds/sec/chip).

Workload = the reference's canonical training shape (README.md:36 /
tools/train.py:100-111): clouds of n_samples=70000 points downsampled to
n_desired_nds=1000 NDs, then NDTNetSegmentation forward, batch 16 — the
exact per-batch work of the reference hot loop (train.py:44-92) minus the
host round-trips it needed.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is the TPU-vs-host-CPU throughput ratio of this same fused
pipeline (the reference's own C core is unbuildable here — no GSL — and it
published no numbers; BASELINE.md documents this).

Extra diagnostics go to stderr.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

# NDTPU_PLATFORM=cpu pins the backend for local smoke runs (this image's
# sitecustomize force-registers the tunneled TPU and ignores JAX_PLATFORMS)
if os.environ.get("NDTPU_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["NDTPU_PLATFORM"])


def make_batch(batch, n_points, seed=0):
    rng = np.random.default_rng(seed)
    clouds = []
    for b in range(batch):
        centers = rng.uniform(-20, 20, size=(600, 3))
        per = n_points // 600 + 1
        pts = (
            (centers[:, None, :] + rng.normal(scale=0.4, size=(600, per, 3)))
            .reshape(-1, 3)[:n_points]
            .astype(np.float32)
        )
        clouds.append(pts)
    return np.stack(clouds)


def build_pipeline(n_desired, n_classes, feature_dim, batch, use_pallas,
                   search="fast", streaming=False, dtype="f32", warm=False):
    import jax
    import jax.numpy as jnp

    from ndtpu.models import NDTNetSegmentation
    from ndtpu.preprocessing.batch import ndt_preprocessing_with_state

    # bf16 runs the model's matmuls on the MXU at twice the f32 rate; the
    # NDT preprocessing stays f32 (covariance accumulation needs it)
    compute_dtype = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    model = NDTNetSegmentation(
        num_classes=n_classes, feature_dim=feature_dim, dtype=compute_dtype
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((batch, n_desired, 3)),
        jnp.zeros((batch, n_desired, 9)),
        train=False,
    )

    def pipeline(variables, points, sizes=None):
        pcl, covs, _, mask, st = ndt_preprocessing_with_state(
            n_desired, points, None, n_classes, use_pallas, search,
            fixed_voxel_sizes=sizes if streaming else None,
            warm_start_sizes=sizes if warm else None,
        )
        out = model.apply(
            variables, pcl, covs, train=False, return_logits=True
        )
        return out, st.voxel_size

    @jax.jit
    def pipeline_scalar(variables, points, sizes=None):
        # scalar readback forces true completion: on the tunneled axon
        # backend block_until_ready returns before execution finishes,
        # so timing must fetch a value derived from the full output
        out, _ = pipeline(variables, points, sizes)
        return jnp.sum(out.astype(jnp.float32))

    @functools.partial(jax.jit, static_argnames=("inner",))
    def pipeline_repeat(variables, points, inner: int, sizes=None):
        # on-device loop amortizes the ~25 ms tunnel round-trip out of the
        # measurement; the carry feeds back into the input so iterations
        # can't be CSE'd or elided. Warm mode threads each iteration's
        # accepted voxel sizes into the next (the frame-stream steady
        # state); otherwise the sizes pass through unchanged.
        def body(carry, _):
            tot, sz = carry
            out, new_sz = pipeline(variables, points + tot * 1e-20, sz)
            return (jnp.sum(out.astype(jnp.float32)),
                    new_sz if warm else sz), None

        (total, _), _ = jax.lax.scan(
            body, (jnp.float32(0.0), sizes), None, length=inner
        )
        return total

    return pipeline, pipeline_scalar, pipeline_repeat, variables


def measure_rtt(iters=7):
    """Median host->device->host round trip for a trivial jitted scalar op.

    On this image's tunneled backend every dispatch+readback costs ~25 ms;
    an on-device scan of `inner` iterations still pays it ONCE per call,
    so the naive per-iteration time carries a floor of RTT/inner. r2's
    numbers (inner=8 -> ~3.1 ms floor; --components inner=4 -> ~6.3 ms)
    were biased by exactly this — most visibly the "model 6.32 ms" figure,
    which was almost entirely RTT floor. r3 measures the RTT explicitly
    and subtracts it (see BASELINE.md r3 notes)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))  # compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    rtt = sorted(ts)[len(ts) // 2]
    print(f"[bench] host round trip: {rtt*1000:.2f} ms (median of {iters})",
          file=sys.stderr)
    return rtt


def timed_throughput(fn_scalar, variables, batch_arr, iters, warmup=2):
    for _ in range(warmup):
        float(fn_scalar(variables, batch_arr))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn_scalar(variables, batch_arr))
    dt = time.perf_counter() - t0
    return (iters * batch_arr.shape[0]) / dt, dt / iters


def bench_components(args):
    """Time pipeline stages separately with on-device scan loops."""
    import jax
    import jax.numpy as jnp

    from ndtpu.core import ndt as nd
    from ndtpu.core import voxel as vxm
    from ndtpu.preprocessing.batch import ndt_preprocessing_with_state
    from ndtpu.models import NDTNetSegmentation

    batch = jnp.asarray(make_batch(args.batch_size, args.n_samples))
    M, C = args.n_desired_nds, args.n_classes

    rtt = measure_rtt()

    def scan_time(fn, *inputs, inner=None, iters=3):
        inner = args.inner if inner is None else inner

        @jax.jit
        def repeat(*a):
            def body(carry, _):
                out = fn(*((a[0] + carry * 1e-20,) + a[1:]))
                return jnp.sum(out), None

            total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=inner)
            return total

        float(repeat(*inputs))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(repeat(*inputs))
        return max(
            (time.perf_counter() - t0) / iters / inner - rtt / inner, 1e-9
        )

    def search_only(pts):
        def one(p):
            m = jnp.ones(p.shape[:1], bool)
            mins, maxs = vxm.pointcloud_limits(p, m)
            px, py, pz = p[:, 0], p[:, 1], p[:, 2]
            # mirror the production paths' envelope clamps and count
            # functions (ndt_downsample), so the timed program matches
            if args.search in ("fast", "probe"):
                # the unfused secant twin (probe's seeding lives in the
                # fused path; the full-preprocess component carries it)
                vs, _ = nd._search_voxel_size_fast(
                    px, py, pz, m, M, mins, maxs,
                    lo_min=nd._min_packable_voxel_size(mins, maxs),
                )
            else:
                vs, _ = nd._search_voxel_size(
                    px, py, pz, m, M, mins, maxs,
                    count_fn=nd._count_occupied_pair,
                    lo_min=nd._min_pair_packable_voxel_size(mins, maxs),
                )
            return vs

        return jax.vmap(one)(pts)

    def preprocess_only(pts):
        pcl, covs, _, _, _ = ndt_preprocessing_with_state(
            M, pts, None, C, args.use_pallas, args.search
        )
        return pcl

    model = NDTNetSegmentation(num_classes=C, feature_dim=args.feature_dim)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((args.batch_size, M, 3)),
        jnp.zeros((args.batch_size, M, 9)), train=False,
    )
    pcl0, covs0, _, _, _ = ndt_preprocessing_with_state(
        M, batch, None, C, args.use_pallas, args.search
    )

    def model_only(pcl, covs):
        return model.apply(variables, pcl, covs, train=False, return_logits=True)

    t_search = scan_time(search_only, batch)
    t_prep = scan_time(preprocess_only, batch)
    t_model = scan_time(model_only, pcl0, covs0)
    print(
        f"[bench] components per batch: search {t_search*1000:.2f} ms | "
        f"full preprocess {t_prep*1000:.2f} ms | model {t_model*1000:.2f} ms",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "component_ms",
        "search": round(t_search * 1000, 2),
        "preprocess": round(t_prep * 1000, 2),
        "model": round(t_model * 1000, 2),
    }))


def bench_train(args):
    """TPU benchmark of the TRAINING step — the reference's actual hot loop
    (/root/reference/tools/train.py:16-92): on-device NDT preprocess +
    NDTNetSegmentation forward + CE loss + backward + Adam, at the
    canonical shape (B=16, N=70000, M=1000). Uses the SAME
    `make_ndt_seg_step` program `tools/train.py` compiles (VERDICT r2 #1),
    scanned on device with one scalar readback."""
    import jax
    import jax.numpy as jnp
    import optax

    from ndtpu.models import NDTNetSegmentation
    from ndtpu.train.loop import make_ndt_seg_step
    from ndtpu.train.state import create_train_state

    B, N, M, C = (args.batch_size, args.n_samples, args.n_desired_nds,
                  args.n_classes)
    compute_dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = NDTNetSegmentation(
        num_classes=C, feature_dim=args.feature_dim, dtype=compute_dtype
    )
    tx = optax.adam(1e-3)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        jnp.zeros((B, M, 3)), jnp.zeros((B, M, 9)),
        init_kwargs={"train": False},
    )
    step_fn, _ = make_ndt_seg_step(M, C, args.use_pallas, args.search)

    points = jnp.asarray(make_batch(B, N))
    labels = np.random.default_rng(1).integers(0, C, size=(B, N))
    if args.train_gt == "int":
        # the trainers' default input path (int tags, C+1x less traffic)
        gt = jnp.asarray(labels, jnp.int32)
    else:
        gt = jax.nn.one_hot(jnp.asarray(labels), C + 1, dtype=jnp.float32)

    extra = ()
    if args.streaming:
        # tools/train.py --streaming: sizes from one searched pass, the
        # timed step skips the search (one voxelization per cloud)
        from ndtpu.preprocessing.batch import ndt_preprocessing_with_state

        _, _, _, _, st = ndt_preprocessing_with_state(
            M, points, None, C, args.use_pallas, args.search
        )
        extra = (st.voxel_size,)

    @functools.partial(jax.jit, static_argnames=("inner",))
    def repeat(state, points, gt, inner: int, *extra):
        def body(carry, _):
            st, tot = carry
            # thread the running loss into the points: the preprocessing
            # must NOT be loop-invariant, or XLA hoists the whole NDT
            # stage out of the scan and the "train step" times only the
            # model fwd/bwd (observed: 11.6 -> 2.7 ms/step apparent)
            st, metrics = step_fn(st, points + tot * 1e-20, gt, *extra)
            return (st, tot + metrics["loss"]), None

        (st, tot), _ = jax.lax.scan(
            body, (state, jnp.float32(0.0)), None, length=inner
        )
        return tot

    # single-call step too (includes tunnel RTT), for the per-step view
    new_state, metrics = step_fn(state, points, gt, *extra)
    loss0 = float(metrics["loss"])

    rtt = measure_rtt()
    float(repeat(state, points, gt, args.inner, *extra))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        float(repeat(state, points, gt, args.inner, *extra))
    t_raw = (time.perf_counter() - t0) / args.iters / args.inner
    t_step = max(t_raw - rtt / args.inner, 1e-9)
    tput = B / t_step
    print(
        f"[bench] train step (preprocess+fwd+CE+bwd+Adam): "
        f"{t_step*1000:.2f} ms/step on-device -> {tput:.1f} clouds/s "
        f"(batch {B}, N {N}, M {M}, search="
        f"{'streaming' if args.streaming else args.search}); "
        f"first-step loss {loss0:.4f}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "train_step_throughput",
        "value": round(tput, 3),
        "unit": "clouds/s/chip",
        "step_ms": round(t_step * 1000, 2),
        "raw_step_ms": round(t_raw * 1000, 2),
        "rtt_ms": round(rtt * 1000, 2),
        "gt": args.train_gt,
        "vs_baseline": None,
    }))


def bench_multiscale(args):
    """The reference's multiscale workload (train_multiscale.py:17-29 /
    ndtnetpp.py:57): fine 8160 / coarse 4080 NDs, batch 4 — two NDT
    preprocessings plus the NDT-Net++ forward with its mid-forward prune."""
    import jax
    import jax.numpy as jnp

    from ndtpu.models import NDTNetPPSegmentation
    from ndtpu.preprocessing.batch import ndt_preprocessing_with_state

    B, fine, coarse = 4, 8160, 4080
    batch = jnp.asarray(make_batch(B, args.n_samples, seed=1))
    model = NDTNetPPSegmentation(
        num_classes=args.n_classes, fine_res=fine, coarse_res=coarse,
        feature_dim=1024,
    )

    p1, c1, _, _, st1 = ndt_preprocessing_with_state(
        fine, batch, None, args.n_classes, args.use_pallas, args.search
    )
    p2, c2, _, _, _ = ndt_preprocessing_with_state(
        coarse, batch, None, args.n_classes, args.use_pallas, args.search
    )
    variables = model.init(
        jax.random.PRNGKey(0), p1, c1, st1, p2, c2, train=False
    )

    def pipeline(v, points):
        q1, d1, _, _, s1 = ndt_preprocessing_with_state(
            fine, points, None, args.n_classes, args.use_pallas, args.search
        )
        q2, d2, _, _, _ = ndt_preprocessing_with_state(
            coarse, points, None, args.n_classes, args.use_pallas, args.search
        )
        return model.apply(v, q1, d1, s1, q2, d2, train=False,
                           return_logits=True)

    @functools.partial(jax.jit, static_argnames=("inner",))
    def repeat(v, points, inner: int):
        def body(carry, _):
            out = pipeline(v, points + carry * 1e-20)
            return jnp.sum(out.astype(jnp.float32)), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=inner)
        return total

    rtt = measure_rtt()
    float(repeat(variables, batch, args.inner))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        float(repeat(variables, batch, args.inner))
    dt = max(
        (time.perf_counter() - t0) / args.iters / args.inner
        - rtt / args.inner, 1e-9,
    )
    tput = B / dt
    print(
        f"[bench] multiscale per-batch: {dt*1000:.2f} ms on-device; "
        f"{tput:.2f} clouds/s (batch {B}, fine {fine} / coarse {coarse})",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "multiscale_preprocess_forward_throughput",
        "value": round(tput, 3),
        "unit": "clouds/s/chip",
        "vs_baseline": None,
    }))


def bench_giant(args):
    """Giant-cloud config (SURVEY.md §5 sequence-parallel analogue): ONE
    1M+-point cloud -> n_desired NDs through the point-sharded pipeline
    (make_point_sharded_downsample) on a 1-chip mesh — the single-chip
    anchor for the >=80% scaling-efficiency target (BASELINE.md:30) — plus
    the viz.py prune-Hz protocol on the resulting state."""
    import jax
    import jax.numpy as jnp

    from ndtpu.core.ndt import ndt_prune
    from ndtpu.parallel.mesh import make_mesh
    from ndtpu.parallel.point_sharded import make_point_sharded_downsample

    n_pts = args.giant_points
    m = args.giant_nds
    rng = np.random.default_rng(0)
    centers = rng.uniform(-40, 40, size=(4096, 3))
    per = n_pts // 4096 + 1
    pts = (
        (centers[:, None, :] + rng.normal(scale=0.5, size=(4096, per, 3)))
        .reshape(-1, 3)[:n_pts]
        .astype(np.float32)
    )
    mesh = make_mesh(("points",), devices=np.asarray(jax.devices()[:1]))
    fn = make_point_sharded_downsample(mesh, m, use_pallas=args.use_pallas,
                                       search=args.search)
    pts_d = jnp.asarray(pts)
    mask = jnp.ones((n_pts,), bool)
    classes = jnp.zeros((n_pts,), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("inner",))
    def repeat(p, inner: int):
        def body(carry, _):
            pcl, covs, labels, msk, state = fn(p + carry * 1e-20, mask, classes)
            return jnp.sum(pcl) + jnp.sum(covs), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=inner)
        return total

    rtt = measure_rtt()
    float(repeat(pts_d, args.inner))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        float(repeat(pts_d, args.inner))
    dt = max(
        (time.perf_counter() - t0) / args.iters / args.inner
        - rtt / args.inner, 1e-9,
    )

    # prune-Hz protocol (viz.py:119-129): second-stage prune to m//2
    _, _, _, _, state = jax.jit(fn)(pts_d, mask, classes)

    @functools.partial(jax.jit, static_argnames=("inner",))
    def prune_repeat(st, inner: int):
        def body(carry, _):
            # perturb a field _emit actually READS (min_kl drives the prune
            # ranking) so the loop body is not loop-invariant — perturbing
            # voxel_size would let XLA hoist the whole prune out of the scan
            pcl, covs, labels, msk = ndt_prune(
                st.replace(min_kl=st.min_kl + carry * 1e-20), m // 2
            )
            return jnp.sum(pcl), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=inner)
        return total

    float(prune_repeat(state, args.inner))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        float(prune_repeat(state, args.inner))
    dt_prune = (time.perf_counter() - t0) / args.iters / args.inner \
        - rtt / args.inner
    # a prune reading at/below the RTT floor is noise, not a Hz figure
    # (the ADVICE r4 below-floor rule; the r5 prune measured exactly this)
    prune_below_floor = dt_prune <= 0

    prune_txt = ("below measurement floor" if prune_below_floor else
                 f"{dt_prune*1000:.3f} ms ({1.0/dt_prune:.1f} Hz)")
    print(
        f"[bench] giant cloud: {n_pts} pts -> {m} NDs in {dt*1000:.2f} ms "
        f"({1.0/dt:.2f} Hz, {n_pts/dt/1e6:.1f} Mpts/s); prune to {m//2}: "
        f"{prune_txt}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "giant_cloud_downsample",
        "value": round(1.0 / dt, 3),
        "unit": "clouds/s/chip",
        "points": n_pts,
        "n_desired": m,
        "mpts_per_s": round(n_pts / dt / 1e6, 2),
        "prune_hz": (None if prune_below_floor
                     else round(1.0 / dt_prune, 2)),
        "prune_below_floor": prune_below_floor,
        "vs_baseline": None,
    }))


def bench_roofline(args):
    """Bytes-moved roofline accounting (VERDICT r1 item 4).

    Measures (a) this chip's achievable HBM read bandwidth with a big
    elementwise reduction, (b) the canonical preprocess time, (c) the cost
    of the individual sort passes the pipeline is built from. Prints the
    analytic minimum traffic (each point component read once + outputs)
    against (a) to give %-of-roofline, and the sort-pass decomposition
    that accounts for the gap."""
    import jax
    import jax.numpy as jnp

    from ndtpu.preprocessing.batch import ndt_preprocessing_with_state

    B, N, M, C = (args.batch_size, args.n_samples, args.n_desired_nds,
                  args.n_classes)

    rtt = measure_rtt()

    def scan_time(fn, *inputs, inner=8, iters=3):
        @jax.jit
        def repeat(*a):
            def body(carry, _):
                out = fn(*((a[0] + carry * 1e-20,) + a[1:]))
                return jnp.sum(out).astype(jnp.float32), None

            total, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=inner)
            return total

        float(repeat(*inputs))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(repeat(*inputs))
        return max(
            (time.perf_counter() - t0) / iters / inner - rtt / inner, 1e-9
        )

    # (a) achievable HBM bandwidth over 2^28 f32 (1 GiB). The scan's
    # anti-CSE perturbation (x + carry*1e-20) is itself a read+write pass,
    # so each iteration moves 3 GiB (read, write, read-for-reduce); the
    # reduction's output traffic is negligible.
    big = jnp.ones((1 << 28,), jnp.float32)
    t_bw = scan_time(lambda x: jnp.sum(x * 1.000001), big, inner=4)
    gbps = (3 * big.size * 4) / t_bw / 1e9

    # (b) canonical preprocess
    batch = jnp.asarray(make_batch(B, N))

    def preprocess_only(pts):
        pcl, _, _, _, _ = ndt_preprocessing_with_state(
            M, pts, None, C, args.use_pallas, args.search
        )
        return pcl

    t_prep = scan_time(preprocess_only, batch, inner=4)

    # (c) sort passes: single-key and the build's key+payload sort
    keys = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 30, B * N, dtype=np.int32)
    )
    t_sort1 = scan_time(lambda k: jax.lax.sort(k)[:8].astype(jnp.float32),
                        keys, inner=4)
    px = jnp.asarray(np.random.default_rng(1).random(B * N, np.float32))

    def payload_sort(k, x):
        cols = jax.lax.sort((k, x, x + 1, x + 2), num_keys=1)
        return cols[1][:8]

    t_sortp = scan_time(lambda k: payload_sort(k, px), keys, inner=4)

    # analytic minimum traffic per batch: read 3 coord vectors once, write
    # keys once, read them once more for the moment pass, write the
    # [k_max, 13+C] accumulator (negligible)
    bytes_min = B * N * 4 * (3 + 2)
    t_ideal = bytes_min / (gbps * 1e9)
    pct = 100.0 * t_ideal / t_prep

    print(
        f"[bench] roofline: HBM read {gbps:.1f} GB/s | preprocess "
        f"{t_prep*1000:.2f} ms/batch vs ideal {t_ideal*1000:.3f} ms "
        f"({pct:.2f}% of speed-of-light) | sort passes over [B*N]: "
        f"1-key {t_sort1*1000:.2f} ms, 1-key+3-payload {t_sortp*1000:.2f} ms",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "roofline",
        "hbm_read_gbps": round(gbps, 1),
        "preprocess_ms": round(t_prep * 1000, 2),
        "ideal_ms": round(t_ideal * 1000, 3),
        "pct_of_roofline": round(pct, 2),
        "sort1_ms": round(t_sort1 * 1000, 2),
        "payload_sort_ms": round(t_sortp * 1000, 2),
    }))


def bench_stress(args):
    """The reference's C stress shape (ndt_downsample.c:5-13): one 90k-point
    random cloud -> 24 NDs, the viz.py Hz protocol."""
    import jax
    import jax.numpy as jnp

    from ndtpu.core.ndt import ndt_downsample
    from ndtpu.data.synthetic import random_cloud

    pts = jnp.asarray(random_cloud(90000, seed=0))

    @jax.jit
    def run(p):
        pcl, covs, labels, mask, state = ndt_downsample(
            p, 24, search=args.search
        )
        return jnp.sum(pcl) + jnp.sum(covs)

    float(run(pts))
    t0 = time.perf_counter()
    iters = 10  # ndt_downsample.c:21 loops 10x
    for _ in range(iters):
        float(run(pts))
    dt = (time.perf_counter() - t0) / iters
    print(f"Downsampling took {dt} seconds. ({1.0/dt} Hz)", file=sys.stderr)
    print(json.dumps({
        "metric": "stress_90k_to_24_hz",
        "value": round(1.0 / dt, 2),
        "unit": "clouds/s",
        "vs_baseline": None,
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_desired_nds", type=int, default=1000)  # README.md:36
    p.add_argument("--n_samples", type=int, default=70000)     # train.py:101
    p.add_argument("--batch_size", type=int, default=16)       # train.py:108
    p.add_argument("--n_classes", type=int, default=28)
    p.add_argument("--feature_dim", type=int, default=768)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--inner", type=int, default=32)
    p.add_argument("--cpu_iters", type=int, default=1)
    p.add_argument("--use_pallas", action="store_true", default=None,
                   help="force the Pallas segment-sum kernel (default: auto "
                        "— on when the first device is a TPU)")
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false")
    p.add_argument("--search", type=str, default="probe",
                   choices=["fast", "probe", "reference", "grid"],
                   help="'fast' hits the same [n, 1.2n] acceptance band in "
                        "~2-5 voxelizations; 'reference' follows the C "
                        "bisection trajectory")
    p.add_argument("--dtype", type=str, default="f32",
                   choices=["f32", "bf16"],
                   help="model compute dtype (preprocessing stays f32)")
    p.add_argument("--skip_cpu_baseline", action="store_true")
    p.add_argument("--components", action="store_true",
                   help="time search/preprocess/model separately")
    p.add_argument("--stress", action="store_true",
                   help="run the 90k->24 C-harness stress shape instead")
    p.add_argument("--multiscale", action="store_true",
                   help="run the NDT-Net++ multiscale workload (fine 8160 / "
                        "coarse 4080, batch 4)")
    p.add_argument("--streaming", action="store_true",
                   help="streaming regime: voxel sizes searched once, then "
                        "fixed for the timed loop (frame-stream production "
                        "mode, one voxelization per cloud)")
    p.add_argument("--warm_start", action="store_true",
                   help="warm-start regime: each iteration seeds the fast "
                        "search with the previous iteration's accepted "
                        "voxel sizes (band still enforced — the "
                        "self-healing version of --streaming; steady state "
                        "= one voxelization per cloud)")
    p.add_argument("--giant", action="store_true",
                   help="giant-cloud config: one 1M+-point cloud through "
                        "the point-sharded pipeline on a 1-chip mesh")
    p.add_argument("--giant_points", type=int, default=1048576)
    p.add_argument("--giant_nds", type=int, default=2080,
                   help="ND target for --giant (the reference's default "
                        "trainer resolution, train.py:100)")
    p.add_argument("--train", action="store_true",
                   help="benchmark the full TRAINING step (preprocess + "
                        "forward + CE + backward + Adam) — the reference's "
                        "hot loop — instead of the inference pipeline")
    p.add_argument("--train_gt", type=str, default="int",
                   choices=["int", "onehot"],
                   help="GT input contract for --train: 'int' = [B, N] "
                        "int32 tags (the trainers' default), 'onehot' = "
                        "the reference's [B, N, C+1]")
    p.add_argument("--roofline", action="store_true",
                   help="bytes-moved roofline accounting: HBM bandwidth, "
                        "%-of-speed-of-light, sort-pass decomposition")
    args = p.parse_args()

    if args.use_pallas is None:
        from ndtpu.utils.platform import is_tpu

        args.use_pallas = is_tpu()
        print(f"[bench] pallas segment-sum: {args.use_pallas} (auto)",
              file=sys.stderr)

    if args.train:
        bench_train(args)
        return
    if args.components:
        bench_components(args)
        return
    if args.stress:
        bench_stress(args)
        return
    if args.multiscale:
        bench_multiscale(args)
        return
    if args.giant:
        bench_giant(args)
        return
    if args.roofline:
        bench_roofline(args)
        return

    import jax

    dev = jax.devices()[0]
    print(f"[bench] device: {dev}", file=sys.stderr)

    batch = make_batch(args.batch_size, args.n_samples)

    import jax.numpy as jnp

    _, pipeline_scalar, pipeline_repeat, variables = build_pipeline(
        args.n_desired_nds, args.n_classes, args.feature_dim,
        args.batch_size, args.use_pallas, args.search, args.streaming,
        args.dtype, args.warm_start,
    )
    batch_dev = jnp.asarray(batch)

    sizes = None
    if args.streaming or args.warm_start:
        # one searched pass provides the per-cloud voxel sizes
        from ndtpu.preprocessing.batch import ndt_preprocessing_with_state

        _, _, _, _, st = ndt_preprocessing_with_state(
            args.n_desired_nds, batch_dev, None, args.n_classes,
            args.use_pallas, args.search,
        )
        sizes = st.voxel_size
        mode = "streaming" if args.streaming else "warm-start"
        print(f"[bench] {mode}: voxel sizes seeded from a searched pass",
              file=sys.stderr)

    # warmup/compile both programs
    float(pipeline_scalar(variables, batch_dev, sizes))
    float(pipeline_repeat(variables, batch_dev, args.inner, sizes))

    # single-call path (includes tunnel RTT)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        float(pipeline_scalar(variables, batch_dev, sizes))
    t_call = (time.perf_counter() - t0) / args.iters

    # on-device repeated path (amortizes RTT out), minus the measured
    # per-call round trip (see measure_rtt)
    rtt = measure_rtt()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        float(pipeline_repeat(variables, batch_dev, args.inner, sizes))
    t_raw = (time.perf_counter() - t0) / args.iters / args.inner
    t_inner = max(t_raw - rtt / args.inner, 1e-9)

    tput = args.batch_size / t_inner
    print(
        f"[bench] per-batch: {t_inner*1000:.2f} ms on-device "
        f"({t_raw*1000:.2f} ms raw incl. RTT/inner floor, "
        f"{t_call*1000:.2f} ms single-call incl. full RTT); "
        f"device throughput: {tput:.2f} clouds/s (batch {args.batch_size})",
        file=sys.stderr,
    )

    vs_baseline = float("nan")
    if not args.skip_cpu_baseline:
        try:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                _, pipe_cpu_scalar, _, vars_cpu = build_pipeline(
                    args.n_desired_nds, args.n_classes, args.feature_dim,
                    args.batch_size, False, args.search,
                )
                batch_cpu = jax.device_put(jnp.asarray(batch), cpu)
                cpu_tput, _ = timed_throughput(
                    pipe_cpu_scalar, vars_cpu, batch_cpu, args.cpu_iters,
                    warmup=1,
                )
            print(f"[bench] host-CPU baseline: {cpu_tput:.2f} clouds/s",
                  file=sys.stderr)
            vs_baseline = tput / cpu_tput
        except Exception as e:
            print(f"[bench] cpu baseline failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "ndt_preprocess_forward_throughput",
        "mode": ("streaming" if args.streaming
                 else "warm_start" if args.warm_start else "searched"),
        "value": round(tput, 3),
        "unit": "clouds/s/chip",
        "per_batch_ms": round(t_inner * 1000, 2),
        "raw_per_batch_ms": round(t_raw * 1000, 2),
        "rtt_ms": round(rtt * 1000, 2),
        "vs_baseline": round(vs_baseline, 3) if np.isfinite(vs_baseline) else None,
    }))


if __name__ == "__main__":
    main()
