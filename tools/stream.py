"""Streaming (frame-stream) inference — the production regime.

The repo's fastest measured configuration (BASELINE.md: 1417.8 clouds/s r2
streaming vs 1159.2 canonical) reuses the voxel size across consecutive
frames of a sensor stream: frames of the same scene share statistics, so
the per-cloud voxel-size search — roughly half the preprocessing cost —
runs once, and every subsequent frame voxelizes directly with
``fixed_voxel_size``. This tool makes that regime reachable outside
bench.py (VERDICT r2 weak #6).

Robustness: the accepted band is monitored. Each frame's resulting
occupied-voxel count (``state.num_valid``) is checked against the
reference acceptance band [n_desired, 1.2·n_desired] (ndt.h:38,
core/ndt.py:32-35); when the scene drifts out of band the next frame
re-runs the full search and the new size is locked in. ``--research_every``
additionally forces a periodic re-search.

Input: a directory of PLY frames (sorted order = stream order,
tools/viz.py PLY conventions) or a synthetic drifting stream. Optional
segmentation checkpoint (tools/train.py output) colors each frame's NDs;
frames are written as colored PLYs with --out_dir.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import _common  # noqa: F401  (sys.path + NDTPU_PLATFORM pinning)
from tools._common import paint_classes

from ndtpu.core.ndt import DOWNSAMPLE_UPPER_THRESHOLD, ndt_downsample
from ndtpu.data.ply import read_ply, write_ply


def synthetic_stream(n_frames, n_points, seed=0):
    """Drifting clustered scene: cluster centers translate a little per
    frame (a vehicle-mounted-sensor stand-in)."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-15, 15, size=(256, 3))
    per = n_points // 256 + 1
    for f in range(n_frames):
        drift = np.array([0.4 * f, 0.15 * f, 0.0])
        pts = (
            (centers + drift)[:, None, :]
            + rng.normal(scale=0.35, size=(256, per, 3))
        ).reshape(-1, 3)[:n_points].astype(np.float32)
        yield pts


def frame_iter(args):
    if args.frames_path:
        names = sorted(
            n for n in os.listdir(args.frames_path) if n.endswith(".ply")
        )
        for n in names:
            pts, _ = read_ply(os.path.join(args.frames_path, n))
            yield pts.astype(np.float32)
    else:
        yield from synthetic_stream(args.n_frames, args.n_points)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames_path", type=str, default=None,
                   help="directory of PLY frames; synthetic stream if unset")
    p.add_argument("--n_frames", type=int, default=16)
    p.add_argument("--n_points", type=int, default=70000)
    p.add_argument("--n_desired_nds", type=int, default=1000)
    p.add_argument("--n_classes", type=int, default=28)
    p.add_argument("--feature_dim", type=int, default=768)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="tools/train.py segmentation checkpoint to run on "
                        "each frame's NDs")
    p.add_argument("--search", type=str, default="probe",
                   choices=["fast", "probe", "reference", "grid"])
    p.add_argument("--mode", type=str, default="warm",
                   choices=["warm", "fixed"],
                   help="'warm' (default): each frame seeds the fast "
                        "search with the previous frame's accepted size — "
                        "the band is enforced IN-GRAPH, so a drifted frame "
                        "self-heals within its own step (steady state = "
                        "one voxelization). 'fixed': the r3 regime — "
                        "fixed size + host-side band monitor; an "
                        "out-of-band frame emits a degraded count and the "
                        "re-search happens one frame late")
    p.add_argument("--research_every", type=int, default=0,
                   help="force a full cold voxel-size re-search every K "
                        "frames (0 = never force; warm mode self-heals "
                        "without it, fixed mode re-searches on drift)")
    p.add_argument("--out_dir", type=str, default=None,
                   help="write each frame's NDs as a colored PLY here")
    args = p.parse_args()

    M = args.n_desired_nds
    upper = int(M * (1.0 + DOWNSAMPLE_UPPER_THRESHOLD))

    model = variables = None
    if args.checkpoint:
        import optax

        from ndtpu.models import NDTNetSegmentation
        from ndtpu.train.state import create_train_state, restore_checkpoint

        model = NDTNetSegmentation(
            num_classes=args.n_classes, feature_dim=args.feature_dim
        )
        state = create_train_state(
            model, optax.adam(1e-3), jax.random.PRNGKey(0),
            jnp.zeros((1, M, 3)), jnp.zeros((1, M, 9)),
            init_kwargs={"train": False},
        )
        state = restore_checkpoint(state, args.checkpoint)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

    def searched(pts):
        return ndt_downsample(pts, M, search=args.search)

    def fixed(pts, size):
        return ndt_downsample(pts, M, fixed_voxel_size=size)

    def warm(pts, size):
        return ndt_downsample(pts, M, search="fast", warm_start_size=size)

    searched_j = jax.jit(searched)
    fixed_j = jax.jit(fixed)
    warm_j = jax.jit(warm)

    if model is not None:
        @jax.jit
        def infer(pcl, covs):
            out = model.apply(
                variables, pcl[None], covs[None], train=False,
                return_logits=True,
            )
            return jnp.argmax(out[0], axis=-1)

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)

    size = None
    n_search = n_fixed = 0
    t_total = 0.0
    frame_times = []
    for i, pts in enumerate(frame_iter(args)):
        pts_d = jnp.asarray(pts)
        force = args.research_every and i % args.research_every == 0
        t0 = time.perf_counter()
        if size is None or force:
            pcl, covs, labels, mask, state = searched_j(pts_d)
            size = state.voxel_size
            n_search += 1
            mode = "search"
        elif args.mode == "warm":
            pcl, covs, labels, mask, state = warm_j(pts_d, size)
            size = state.voxel_size  # thread the accepted size forward
            n_fixed += 1
            mode = "warm"
        else:
            pcl, covs, labels, mask, state = fixed_j(pts_d, size)
            n_fixed += 1
            mode = "fixed"
        valid = int(state.num_valid)  # device sync: the frame is done
        t_frame = time.perf_counter() - t0
        t_total += t_frame
        frame_times.append(t_frame)

        in_band = M <= valid <= upper
        if not in_band and args.mode == "fixed":
            size = None  # drifted out of the acceptance band: re-search
        if model is not None:
            pred = np.asarray(infer(pcl, covs))
        else:
            pred = np.asarray(labels)
        if args.out_dir:
            keep = np.asarray(mask)
            write_ply(
                os.path.join(args.out_dir, f"frame_{i:04d}.ply"),
                np.asarray(pcl)[keep],
                colors=paint_classes(pred[keep]),
            )
        print(
            f"[stream] frame {i}: {mode} voxels={valid} "
            f"{'OK' if in_band else 'OUT-OF-BAND -> re-search'} "
            f"{t_frame * 1000:.1f} ms",
            file=sys.stderr,
        )

    n = n_search + n_fixed
    # steady state excludes the first two frames (each mode's compile)
    steady = frame_times[2:] or frame_times
    print(json.dumps({
        "frames": n,
        "searched_frames": n_search,
        "fixed_frames": n_fixed,
        "mean_ms_per_frame": round(t_total / max(n, 1) * 1000, 2),
        "steady_ms_per_frame": round(sum(steady) / len(steady) * 1000, 2),
        "steady_hz": round(len(steady) / sum(steady), 2),
    }))


if __name__ == "__main__":
    main()
