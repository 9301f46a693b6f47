"""NDT downsample/prune benchmark + headless visualization.

Equivalent of the reference `tools/viz.py:70-143`: loads a cloud (PLY or
synthetic), runs timed downsample (the repo's canonical Hz protocol,
viz.py:100-107) and optional prune (:119-129), then — instead of an Open3D
window — writes colored PLY files for inspection.
"""
import argparse
import contextlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from tools._common import paint_classes
from ndtpu.core.ndt import NDTSampler, ndt_downsample, ndt_prune
from ndtpu.data.ply import read_ply, write_ply
from ndtpu.data.synthetic import random_cloud
from ndtpu.utils.profiling import profile_trace, timed


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pcl_path", type=str, default=None,
                   help="input PLY; synthetic 90k cloud when omitted")
    p.add_argument("--target", type=int, default=2080)
    p.add_argument("--target1", type=int, default=None,
                   help="optional second-stage prune target")
    p.add_argument("--n_points", type=int, default=90000)
    p.add_argument("--n_classes", type=int, default=28)
    p.add_argument("--out_dir", type=str, default="out/viz")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--trace", type=str, default=None,
                   help="capture a jax.profiler trace of the timed "
                        "downsample loop into this directory")
    args = p.parse_args()

    if args.pcl_path:
        points, classes = read_ply(args.pcl_path)
    else:
        points = random_cloud(args.n_points, seed=0)
        classes = np.zeros((points.shape[0],), np.uint16)

    pts = jnp.asarray(points, jnp.float32)
    cls = jnp.asarray(classes.astype(np.int32))

    # warmup (compile), then the reference's Hz timing protocol
    out = ndt_downsample(pts, args.target, None, cls,
                         num_class_slots=args.n_classes + 1)
    out[0].block_until_ready()

    trace_ctx = (
        profile_trace(args.trace) if args.trace else contextlib.nullcontext()
    )
    with trace_ctx, timed(sync=lambda: pcl) as t:
        for _ in range(args.repeats):
            pcl, covs, labels, mask, state = ndt_downsample(
                pts, args.target, None, cls,
                num_class_slots=args.n_classes + 1,
            )
    dt = t["seconds"] / args.repeats
    print(f"Downsampling took {dt} seconds. ({1.0 / dt} Hz)")  # viz.py:106-107
    if args.trace:
        print(f"profiler trace written to {args.trace}")

    os.makedirs(args.out_dir, exist_ok=True)
    kept = np.asarray(mask)
    write_ply(
        os.path.join(args.out_dir, "downsampled.ply"),
        np.asarray(pcl)[kept],
        colors=paint_classes(np.asarray(labels)[kept]),
        classes=np.asarray(labels)[kept],
    )
    print(f"wrote {args.out_dir}/downsampled.ply "
          f"({int(kept.sum())} NDs, voxel {float(state.voxel_size):.4f})")

    if args.target1:
        with timed(sync=lambda: pcl1) as t:
            for _ in range(args.repeats):
                pcl1, covs1, labels1, mask1 = ndt_prune(state, args.target1)
        dt = t["seconds"] / args.repeats
        print(f"Pruning took {dt} seconds. ({1.0 / dt} Hz)")  # viz.py:127-129
        kept1 = np.asarray(mask1)
        write_ply(
            os.path.join(args.out_dir, "pruned.ply"),
            np.asarray(pcl1)[kept1],
            colors=paint_classes(np.asarray(labels1)[kept1]),
            classes=np.asarray(labels1)[kept1],
        )
        print(f"wrote {args.out_dir}/pruned.ply ({int(kept1.sum())} NDs)")


if __name__ == "__main__":
    main()
