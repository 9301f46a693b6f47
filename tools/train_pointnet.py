"""PointNet (FPS baseline) trainer CLI — equivalent of the reference
`tools/train_pointnet.py:12-240` with its flag defaults (:16-27:
n_samples=4160, save_every=10), minus its bugs (LR precedence :101,
CE-on-probabilities)."""
import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from tools._common import make_dataset
from tools.train import run_epoch
from ndtpu.data.loader import batch_iterator, prefetch_to_device
from ndtpu.models import PointNetSegmentation
from ndtpu.parallel.mesh import batch_sharding, make_data_mesh, replicate
from ndtpu.train.config import TrainConfig
from ndtpu.train.loop import make_lr_schedule, make_pointnet_seg_step
from ndtpu.train.metrics import MetricLogger
from ndtpu.train.state import create_train_state, restore_checkpoint, save_checkpoint


def main():
    cfg = TrainConfig.from_args(n_samples=4160, save_every=10)

    out_dir = os.path.join(
        cfg.out_path, datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    )
    train_set = make_dataset(cfg.n_classes, cfg.n_samples, cfg.train_path, seed=0)
    val_set = make_dataset(cfg.n_classes, cfg.n_samples, cfg.val_path, seed=1)
    test_set = make_dataset(cfg.n_classes, cfg.n_samples, cfg.test_path, seed=2)

    steps_per_epoch = max(1, len(train_set) // cfg.batch_size)
    tx = optax.adam(
        make_lr_schedule(cfg.learning_rate, steps_per_epoch,
                         cfg.lr_decay_epochs, cfg.lr_decay_rate)
    )
    model = PointNetSegmentation(
        num_classes=cfg.n_classes, feature_dim=cfg.feature_dim,
        dtype=jnp.dtype(cfg.compute_dtype),
    )
    state = create_train_state(
        model, tx, jax.random.PRNGKey(cfg.seed),
        jnp.zeros((cfg.batch_size, cfg.n_samples, 3)),
        init_kwargs={"train": False},
    )
    if cfg.resume:
        state = restore_checkpoint(state, cfg.resume)

    mesh = make_data_mesh(cfg.batch_size, cfg.data_axis)
    state = replicate(mesh, state)
    sharding = batch_sharding(mesh, cfg.data_axis)
    step_fn, eval_fn = make_pointnet_seg_step()

    logger = MetricLogger(use_wandb=cfg.wandb, project=cfg.wandb_project,
                          config=vars(cfg))
    for epoch in range(cfg.epochs):
        loader = prefetch_to_device(
            batch_iterator(train_set, cfg.batch_size, shuffle=True, seed=epoch),
            sharding,
        )
        state, m = run_epoch(step_fn, state, loader, train=True)
        logger.log({f"train_{k}": v for k, v in m.items()}, step=epoch + 1)

        loader = prefetch_to_device(
            batch_iterator(val_set, cfg.batch_size, shuffle=False), sharding
        )
        _, m = run_epoch(eval_fn, state, loader, train=False)
        logger.log({f"val_{k}": v for k, v in m.items()}, step=epoch + 1)

        if (epoch + 1) % cfg.save_every == 0:
            save_checkpoint(
                state, os.path.join(out_dir, f"pointnet_{cfg.task}_{epoch + 1}")
            )

    loader = prefetch_to_device(
        batch_iterator(test_set, cfg.batch_size, shuffle=False), sharding
    )
    _, m = run_epoch(eval_fn, state, loader, train=False)
    logger.log({f"test_{k}": v for k, v in m.items()})
    logger.finish()
    print("Done.")


if __name__ == "__main__":
    main()
