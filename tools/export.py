#!/usr/bin/env python
"""Export an ndtpu checkpoint to a torch reference state dict.

The reverse of the checkpoint-migration path: restore a trainer
checkpoint (tools/train.py --out_path/--save_every output), load the
weights into the torch reference model (ndnet/models/ndtnet.py:166-243 /
pointnet.py:137-214) via ndtpu.interop.export_*, and `torch.save` its
state_dict — plus the backbone-only state dict, mirroring the
reference trainer's save layout (/root/reference/tools/train.py:186-194).

    python tools/export.py \
        --checkpoint out/<run>/ndtnet_segmentation_10 \
        --task segmentation --n_classes 28 --feature_dim 768 \
        --out ndtnet_seg.pt
"""
import argparse
import os

import _common  # noqa: F401  (sys.path + NDTPU_PLATFORM pinning)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint directory written by the trainers")
    ap.add_argument("--task", default="segmentation",
                    choices=["segmentation", "classification"])
    ap.add_argument("--arch", default="ndtnet",
                    choices=["ndtnet", "pointnet"])
    ap.add_argument("--n_classes", type=int, required=True)
    ap.add_argument("--feature_dim", type=int, default=768)
    ap.add_argument("--n_desired_nds", type=int, default=1000,
                    help="only shapes the template init; any value works")
    ap.add_argument("--out", required=True, help="output .pt path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    import torch

    from ndtpu.interop import (
        export_ndtnet_classification,
        export_ndtnet_segmentation,
        export_pointnet_classification,
        export_pointnet_segmentation,
    )
    from ndtpu.interop.reference_loader import load_reference_module
    from ndtpu.models import (
        NDTNetClassification,
        NDTNetSegmentation,
        PointNetClassification,
        PointNetSegmentation,
    )
    from ndtpu.train.loop import make_lr_schedule
    from ndtpu.train.state import create_train_state, restore_checkpoint

    seg = args.task == "segmentation"
    if args.arch == "ndtnet":
        model = (NDTNetSegmentation if seg else NDTNetClassification)(
            num_classes=args.n_classes, feature_dim=args.feature_dim
        )
        example = (jnp.zeros((1, args.n_desired_nds, 3)),
                   jnp.zeros((1, args.n_desired_nds, 9)))
    else:
        model = (PointNetSegmentation if seg else PointNetClassification)(
            num_classes=args.n_classes, feature_dim=args.feature_dim
        )
        example = (jnp.zeros((1, args.n_desired_nds, 3)),)
    # the tx only shapes the opt_state TEMPLATE for restore — a schedule
    # (as the trainers use) and a constant lr have different state trees,
    # so mirror the trainers' structure; the values are never used
    state = create_train_state(
        model, optax.adam(make_lr_schedule(1e-3, 1)),
        jax.random.PRNGKey(0), *example, init_kwargs={"train": False},
    )
    state = restore_checkpoint(state, args.checkpoint)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    ref = load_reference_module("ndtnet" if args.arch == "ndtnet"
                                else "pointnet")
    if args.arch == "ndtnet":
        t_model = (ref.NDTNetSegmentation if seg
                   else ref.NDTNetClassification)(
            3, args.n_classes, args.feature_dim
        )
        export = (export_ndtnet_segmentation if seg
                  else export_ndtnet_classification)
    else:
        t_model = (ref.PointNetSegmentation if seg
                   else ref.PointNetClassification)(
            3, args.n_classes, args.feature_dim
        )
        export = (export_pointnet_segmentation if seg
                  else export_pointnet_classification)
    export(variables, t_model)

    torch.save(t_model.state_dict(), args.out)
    base, ext = os.path.splitext(args.out)
    backbone_out = f"{base}_backbone{ext or '.pt'}"
    torch.save(t_model.feature_extractor.state_dict(), backbone_out)
    print(f"wrote {args.out} (+ backbone: {backbone_out}) "
          f"from step {int(state.step)}")


if __name__ == "__main__":
    main()
