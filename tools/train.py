"""NDT-Net trainer CLI — TPU-native equivalent of the reference
`tools/train.py:95-208` with the same flag names (:99-112).

Differences by design:
- NDT preprocessing runs inside the jitted step on device (the reference
  loops the batch on the host per step, ndtnet_preprocessing.py:27-63);
- loss is computed from logits (the reference's CE-on-softmax bug is not
  replicated);
- LR halves every 20 epochs as intended (train.py:53-57 precedence bug
  fixed);
- checkpoints carry optimizer state + step and can resume (--resume);
- runs data-parallel over all local devices automatically;
- classification task is implemented (the reference raises
  NotImplementedError, train.py:122-123).
"""
import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tools._common import make_dataset
from ndtpu.data.loader import batch_iterator, prefetch_to_device
from ndtpu.models import NDTNetClassification, NDTNetSegmentation
from ndtpu.parallel.mesh import batch_sharding, init_distributed, make_data_mesh, replicate
from ndtpu.train.config import TrainConfig
from ndtpu.train.loop import make_classification_step, make_lr_schedule, make_ndt_seg_step
from ndtpu.train.metrics import MetricLogger
from ndtpu.train.state import create_train_state, restore_checkpoint, save_checkpoint


def run_epoch(step_fn, state, loader, train: bool):
    """One epoch with ON-DEVICE metric accumulation: metrics stay device
    scalars summed lazily per step and are read back ONCE at epoch end.
    The reference host-syncs every batch (train.py:84-90); on a tunneled
    TPU a per-step `float()` costs a ~25 ms round trip against a ~15 ms
    step, so the readback must be hoisted out of the hot loop."""
    total = {"loss": jnp.float32(0.0), "accuracy": jnp.float32(0.0)}
    n = 0
    metrics = total
    for batch in loader:
        if train:
            state, metrics = step_fn(state, *batch)
        else:
            metrics = step_fn(state, *batch)
        n += 1
        total = {k: total[k] + metrics[k] for k in total}
    mean = {k: (float(v) / max(n, 1)) for k, v in total.items()}
    return state, {**{f"last_{k}": float(v) for k, v in metrics.items()},
                   **{f"mean_{k}": v for k, v in mean.items()}}


class _OneHotCls:
    """Adapter: classification dataset (points, label) ->
    (points, onehot [num_classes])."""

    def __init__(self, ds, num_classes):
        self.ds, self.num_classes = ds, num_classes

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        pts, label = self.ds[i]
        oh = np.zeros((self.num_classes,), np.float32)
        oh[label] = 1.0
        return pts, oh


class _WithVoxelSizes:
    """Adapter appending a precomputed per-sample voxel size to each
    sample: batches become (points, gt, sizes [B] f32) and the seg
    steps skip the voxel-size search (streaming regime)."""

    def __init__(self, ds, sizes):
        self.ds, self.sizes = ds, sizes

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        return (*self.ds[i], self.sizes[i])


def precompute_voxel_sizes(ds, cfg):
    """One searched preprocessing pass over the dataset: per-sample
    accepted voxel sizes, reused for every subsequent epoch."""
    from ndtpu.preprocessing.batch import ndt_preprocessing_with_state

    n, B = len(ds), cfg.batch_size
    sizes = np.empty((n,), np.float32)
    for s in range(0, n, B):
        idx = list(range(s, min(s + B, n)))
        pts = np.stack([np.asarray(ds[i][0]) for i in idx])
        if len(idx) < B:  # pad to the compiled batch shape
            pts = np.concatenate([pts, np.repeat(pts[-1:], B - len(idx), 0)])
        _, _, _, _, st = ndt_preprocessing_with_state(
            cfg.n_desired_nds, jnp.asarray(pts), None, cfg.n_classes,
            cfg.resolve_use_pallas(), cfg.search,
        )
        sizes[s:s + len(idx)] = np.asarray(st.voxel_size)[:len(idx)]
    return _WithVoxelSizes(ds, sizes)


def make_cls_dataset(cfg, split, seed):
    from ndtpu.data.classification import ModelNetCls, SyntheticCls

    path = {"train": cfg.train_path, "val": cfg.val_path,
            "test": cfg.test_path}[split]
    if path:
        # Model selection must not happen on the test split: when the val
        # root is the train root (ModelNet trees ship only train/ + test/
        # dirs), ModelNetCls carves a deterministic 10% holdout out of the
        # train split ("val") and excludes it from training.
        carve = bool(cfg.val_path) and cfg.val_path == cfg.train_path
        ds_split = {
            "train": "train+holdout" if carve else "train",
            "val": "val",
            "test": "test",
        }[split]
        ds = ModelNetCls(path, split=ds_split, n_points=cfg.n_samples,
                         seed=seed)
        if ds.n_classes > cfg.n_classes:
            # fail fast: the model head is built with cfg.n_classes slots;
            # silently truncating labels would corrupt the loss
            raise ValueError(
                f"dataset at {path} has {ds.n_classes} classes but "
                f"--n_classes is {cfg.n_classes}; pass --n_classes "
                f">= {ds.n_classes}"
            )
        return _OneHotCls(ds, cfg.n_classes)
    ds = SyntheticCls(n_points=cfg.n_samples, length=cfg.synthetic_length,
                      seed=seed)
    return _OneHotCls(ds, cfg.n_classes)


def main():
    cfg = TrainConfig.from_args()
    # multi-host DP (SURVEY.md §2.3 / §7 step 8): must run before any
    # device access so every process sees the global device set
    init_distributed(cfg.coordinator, cfg.num_processes, cfg.process_id)
    is_host0 = jax.process_index() == 0
    out_dir = os.path.join(
        cfg.out_path, datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    )

    if "classification" in cfg.task:
        if cfg.streaming:
            raise SystemExit(
                "--streaming supports the segmentation task only"
            )
        train_set = make_cls_dataset(cfg, "train", 0)
        val_set = make_cls_dataset(cfg, "val", 1)
        test_set = make_cls_dataset(cfg, "test", 2)
    else:
        train_set = make_dataset(cfg.n_classes, cfg.n_samples, cfg.train_path,
                                 synthetic_length=cfg.synthetic_length,
                                 seed=0, int_labels=cfg.int_labels)
        val_set = make_dataset(cfg.n_classes, cfg.n_samples, cfg.val_path,
                               synthetic_length=cfg.synthetic_length,
                               seed=1, int_labels=cfg.int_labels)
        test_set = make_dataset(cfg.n_classes, cfg.n_samples, cfg.test_path,
                                synthetic_length=cfg.synthetic_length,
                                seed=2, int_labels=cfg.int_labels)
        if cfg.streaming:
            # streaming regime: search voxel sizes once, train with them
            # fixed (one voxelization per cloud per step)
            train_set = precompute_voxel_sizes(train_set, cfg)
            val_set = precompute_voxel_sizes(val_set, cfg)
            test_set = precompute_voxel_sizes(test_set, cfg)

    if cfg.cache_dataset:
        from ndtpu.data.loader import CachedDataset

        train_set = CachedDataset(train_set)
        val_set = CachedDataset(val_set)
        test_set = CachedDataset(test_set)

    mesh = make_data_mesh(cfg.batch_size, cfg.data_axis)
    steps_per_epoch = max(1, len(train_set) // cfg.batch_size)
    sched = make_lr_schedule(
        cfg.learning_rate, steps_per_epoch, cfg.lr_decay_epochs, cfg.lr_decay_rate
    )
    tx = optax.adam(sched)

    if "classification" in cfg.task:
        model = NDTNetClassification(
            num_classes=cfg.n_classes, feature_dim=cfg.feature_dim,
            dtype=jnp.dtype(cfg.compute_dtype),
            param_dtype=jnp.dtype(cfg.param_dtype),
        )
        step_fn, eval_fn = make_classification_step(
            cfg.n_desired_nds, cfg.n_classes, cfg.resolve_use_pallas(),
            cfg.search, mesh, cfg.data_axis,
        )
    else:
        model = NDTNetSegmentation(
            num_classes=cfg.n_classes, feature_dim=cfg.feature_dim,
            dtype=jnp.dtype(cfg.compute_dtype),
            param_dtype=jnp.dtype(cfg.param_dtype),
        )
        step_fn, eval_fn = make_ndt_seg_step(
            cfg.n_desired_nds, cfg.n_classes, cfg.resolve_use_pallas(),
            cfg.search, mesh, cfg.data_axis,
        )

    state = create_train_state(
        model, tx, jax.random.PRNGKey(cfg.seed),
        jnp.zeros((cfg.batch_size, cfg.n_desired_nds, 3)),
        jnp.zeros((cfg.batch_size, cfg.n_desired_nds, 9)),
        init_kwargs={"train": False},
    )
    if cfg.resume:
        state = restore_checkpoint(state, cfg.resume)
        print(f"resumed from {cfg.resume} at step {int(state.step)}")

    state = replicate(mesh, state)
    sharding = batch_sharding(mesh, cfg.data_axis)

    logger = MetricLogger(
        use_wandb=cfg.wandb, project=cfg.wandb_project,
        run_name=f"{cfg.task}_{datetime.datetime.now():%Y%m%d_%H%M%S}",
        config=vars(cfg),
    )

    if cfg.device_cache:
        multiproc = jax.process_count() > 1
        if multiproc and not cfg.epoch_scan:
            # without the compiled epoch there is no jitted program to
            # gather from the sharded global arrays
            raise SystemExit(
                "multi-process --device_cache requires --epoch_scan"
            )
        from ndtpu.data.loader import DeviceCachedDataset

        ds_sharding = sharding if multiproc else None
        train_set = DeviceCachedDataset(train_set, ds_sharding)
        val_set = DeviceCachedDataset(val_set, ds_sharding)
        test_set = DeviceCachedDataset(test_set, ds_sharding)

        def make_loader(dataset, shuffle, seed=0):
            return dataset.loader(cfg.batch_size, shuffle=shuffle,
                                  seed=seed, sharding=sharding)
    else:
        def make_loader(dataset, shuffle, seed=0):
            # every process iterates the same global batch schedule and
            # loads only its slice; the prefetcher assembles the global
            # sharded array
            return prefetch_to_device(
                batch_iterator(
                    dataset, cfg.batch_size, shuffle=shuffle, seed=seed,
                    process_id=jax.process_index(),
                    num_processes=jax.process_count(),
                ),
                sharding,
            )

    import time as _time

    use_scan = cfg.device_cache and cfg.epoch_scan
    if use_scan:
        from ndtpu.train.loop import make_epoch_scan, run_epoch_scan

        train_ep = make_epoch_scan(step_fn, True, sharding)
        eval_ep = make_epoch_scan(eval_fn, False, sharding)

    def train_epoch(state, seed):
        if use_scan:
            return run_epoch_scan(train_ep, state, train_set,
                                  cfg.batch_size, shuffle=True, seed=seed)
        loader = make_loader(train_set, shuffle=True, seed=seed)
        return run_epoch(step_fn, state, loader, train=True)

    def eval_epoch(state, dataset):
        if use_scan:
            _, m = run_epoch_scan(eval_ep, state, dataset,
                                  cfg.batch_size, shuffle=False)
            return m
        loader = make_loader(dataset, shuffle=False)
        _, m = run_epoch(eval_fn, state, loader, train=False)
        return m

    for epoch in range(cfg.epochs):
        t_ep = _time.perf_counter()
        state, m = train_epoch(state, epoch)
        ep_s = _time.perf_counter() - t_ep
        clouds = steps_per_epoch * cfg.batch_size
        logger.log({**{f"train_{k}": v for k, v in m.items()},
                    "epoch_seconds": round(ep_s, 3),
                    "clouds_per_s": round(clouds / max(ep_s, 1e-9), 2)},
                   step=epoch + 1)

        m = eval_epoch(state, val_set)
        logger.log({f"val_{k}": v for k, v in m.items()}, step=epoch + 1)

        if (epoch + 1) % cfg.save_every == 0 and is_host0:
            path = save_checkpoint(
                state, os.path.join(out_dir, f"ndtnet_{cfg.task}_{epoch + 1}")
            )
            print(f"saved checkpoint to {path}")

    m = eval_epoch(state, test_set)
    logger.log({f"test_{k}": v for k, v in m.items()})
    logger.finish()
    if is_host0:
        print("Done.")


if __name__ == "__main__":
    main()
