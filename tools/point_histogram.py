"""Dataset cloud-size histogram.

Equivalent of the reference `tools/point_histogram.py:19-43`, headless:
vertex counts come from the PLY headers (O(1) per file vs. counting body
lines) and the matplotlib figure is saved to a PNG.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ndtpu.data.ply import count_ply_points


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--path", type=str, required=True)
    p.add_argument("--out", type=str, default="out/point_histogram.png")
    p.add_argument("--bins", type=int, default=50)
    args = p.parse_args()

    counts = []
    for name in sorted(os.listdir(args.path)):
        if not name.endswith(".ply"):
            continue
        counts.append(count_ply_points(os.path.join(args.path, name)))
    counts = np.asarray(counts)
    if counts.size == 0:
        print("no .ply files found")
        return
    print(f"{counts.size} files; min={counts.min()} max={counts.max()} "
          f"mean={counts.mean():.1f} median={np.median(counts):.0f}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.hist(counts, bins=args.bins)
    plt.xlabel("points per cloud")
    plt.ylabel("files")
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    plt.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
