"""Segmentation inference visualization (headless).

Equivalent of the reference `tools/seg_viz.py:74-152`: load a trained
NDTNetSegmentation checkpoint, NDT-preprocess one sample, predict classes,
paint with the 29-color palette (seg_viz.py:17-46) and write a colored PLY
instead of opening an Open3D window.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tools._common import make_dataset, paint_classes
from ndtpu.models import NDTNetSegmentation
from ndtpu.preprocessing.batch import ndt_preprocessing_with_state
from ndtpu.data.ply import write_ply
from ndtpu.train.state import create_train_state, restore_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, default=None,
                   help="checkpoint dir (random weights when omitted)")
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--sample", type=int, default=0)
    p.add_argument("--n_desired_nds", type=int, default=2080)
    p.add_argument("--n_samples", type=int, default=70000)
    p.add_argument("--n_classes", type=int, default=28)
    p.add_argument("--feature_dim", type=int, default=768)
    p.add_argument("--out", type=str, default="out/seg_viz.ply")
    args = p.parse_args()

    ds = make_dataset(args.n_classes, args.n_samples, args.data_path)
    points, gt = ds[args.sample]

    model = NDTNetSegmentation(
        num_classes=args.n_classes, feature_dim=args.feature_dim
    )
    state = create_train_state(
        model, optax.adam(1e-3), jax.random.PRNGKey(0),
        jnp.zeros((1, args.n_desired_nds, 3)),
        jnp.zeros((1, args.n_desired_nds, 9)),
        init_kwargs={"train": False},
    )
    if args.model_path:
        state = restore_checkpoint(state, args.model_path)  # seg_viz.py:100-107

    pcl, covs, _, mask, _ = ndt_preprocessing_with_state(
        args.n_desired_nds, jnp.asarray(points)[None], None, args.n_classes
    )
    logp = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        pcl, covs, train=False,
    )
    pred = np.asarray(jnp.argmax(logp, axis=-1))[0]  # seg_viz.py argmax
    kept = np.asarray(mask)[0]

    write_ply(
        args.out,
        np.asarray(pcl)[0][kept],
        colors=paint_classes(pred[kept]),
        classes=pred[kept],
    )
    print(f"wrote {args.out} ({int(kept.sum())} NDs)")


if __name__ == "__main__":
    main()
