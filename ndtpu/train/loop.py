"""Jitted train/eval steps.

The reference's per-batch loop (tools/train.py:16-92) does host-side NDT
preprocessing (:67), forward, CE loss (:72), Adam step, and argmax accuracy
(:84-87). Here each step is a single jitted function containing the on-device
NDT preprocessing + model + loss + grads + Adam update; under a Mesh, the
batch axis is sharded and XLA inserts the gradient/BatchNorm collectives
(pure data parallelism — SURVEY.md §2.3).

Loss: softmax cross-entropy from *logits*. The reference feeds probabilities
(already softmax-ed model output) into torch cross_entropy — a documented
bug (SURVEY.md §2.4); the intent, standard CE, is what trains here.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ndtpu.preprocessing.batch import ndt_preprocessing_with_state


def _make_prep(n_desired_nds, n_classes, use_pallas, search, mesh, data_axis):
    """Preprocessing stage of a step, optionally under shard_map.

    The NDT preprocessing is embarrassingly parallel per cloud; shard_map
    pins the whole stage to the data axis — zero collectives by
    construction. Historically load-bearing: until r3 plain GSPMD hit a
    partitioner replicate fallback on the segment-starts `top_k` then in
    `_build_state` ([B, N] batch all-gather + replicated compute,
    4.5 MB/step at N=70000, measured via scripts/collectives.py). That
    top_k is gone (tag columns in the moment reduction) and the plain
    path is now clean too (tests/test_collectives.py); the pinning stays
    as defense in depth against partitioner regressions."""

    def prep(points, gt_onehot, voxel_sizes=None):
        return ndt_preprocessing_with_state(
            n_desired_nds, points, gt_onehot, n_classes, use_pallas, search,
            fixed_voxel_sizes=voxel_sizes,
        )

    if mesh is None:
        return prep

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def sharded_prep(points, gt_onehot, voxel_sizes=None):
        args, specs = (points,), [P(data_axis)]
        if gt_onehot is not None:
            args += (gt_onehot,)
            specs.append(P(data_axis))
        if voxel_sizes is not None:
            args += (voxel_sizes,)
            specs.append(P(data_axis))

        def inner(*a):
            it = iter(a[1:])
            gt = next(it) if gt_onehot is not None else None
            vs = next(it) if voxel_sizes is not None else None
            return prep(a[0], gt, vs)

        return shard_map(
            inner, mesh=mesh, in_specs=tuple(specs),
            out_specs=P(data_axis), check_vma=False,
        )(*args)

    return sharded_prep


def make_lr_schedule(base_lr: float, steps_per_epoch: int,
                     decay_epochs: int = 20, decay_rate: float = 0.5):
    """Staircase halving every `decay_epochs` epochs — the intended
    semantics of train.py:53-57 (its `epoch+1 % 20` precedence bug is not
    replicated)."""
    return optax.exponential_decay(
        init_value=base_lr,
        transition_steps=max(1, decay_epochs * steps_per_epoch),
        decay_rate=decay_rate,
        staircase=True,
    )


def cross_entropy_loss(logits, onehot, mask=None):
    """Mean softmax CE over (optionally masked) rows."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(onehot * logp, axis=-1)
    if mask is None:
        return jnp.mean(ce)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, ce, 0.0)) / denom


def accuracy(logits_or_probs, onehot, mask=None):
    """argmax match fraction (train.py:84-87)."""
    pred = jnp.argmax(logits_or_probs, axis=-1)
    gt = jnp.argmax(onehot, axis=-1)
    hit = (pred == gt).astype(jnp.float32)
    if mask is None:
        return jnp.mean(hit)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, hit, 0.0)) / denom


def make_ndt_seg_step(n_desired_nds: int, n_classes: int,
                      use_pallas: bool = False, search: str = "fast",
                      mesh=None, data_axis: str = "data"):
    """Train step for NDTNetSegmentation: on-device NDT preprocessing fused
    into the step (deletes the host loop of ndtnet_preprocessing.py:27-63).

    batch = (points [B, N, 3], gt_onehot [B, N, C+1]) — or int class tags
    [B, N] in place of the one-hot (the production input path: C+1 times
    less host->device traffic, bit-equivalent results; see
    preprocessing.batch). Pass the data Mesh to pin the preprocessing
    stage with shard_map (see _make_prep).

    Streaming regime: both steps optionally take a trailing [B] f32 of
    per-cloud voxel sizes and then skip the voxel-size search entirely
    (one voxelization per cloud — the production frame-stream regime;
    sizes come from one searched pass, see tools/train.py --streaming).
    With sizes produced by the search at identical points, results are
    bit-identical (tested in tests/test_train.py).
    """
    prep = _make_prep(n_desired_nds, n_classes, use_pallas, search,
                      mesh, data_axis)

    @jax.jit
    def step(state, points, gt_onehot, *voxel_sizes):
        pcl, covs, gt, mask, _ = prep(points, gt_onehot, *voxel_sizes)

        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                pcl, covs, train=True, return_logits=True,
                mutable=["batch_stats"],
            )
            loss = cross_entropy_loss(logits, gt, mask)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        acc = accuracy(logits, gt, mask)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, {"loss": loss, "accuracy": acc}

    @jax.jit
    def eval_step(state, points, gt_onehot, *voxel_sizes):
        pcl, covs, gt, mask, _ = prep(points, gt_onehot, *voxel_sizes)
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            pcl, covs, train=False, return_logits=True,
        )
        return {
            "loss": cross_entropy_loss(logits, gt, mask),
            "accuracy": accuracy(logits, gt, mask),
        }

    return step, eval_step


def make_epoch_scan(step_fn, train: bool = True, sharding=None):
    """Compile a WHOLE epoch as one XLA program: `lax.scan` over per-step
    index rows, each gathering its batch from device-resident dataset
    arrays (ndtpu.data.loader.DeviceCachedDataset) — zero host round
    trips between steps.

    Motivation (r4 TPU session, BASELINE.md): with the dataset on device
    the epoch cost is dominated by per-step dispatch (one tunnel round
    trip ≈ 25 ms against a ~12 ms step on this image); scanning the epoch
    on device pays ONE dispatch per epoch. This is also the idiomatic
    XLA structure — the epoch loop is compiler-visible, so weight
    donation holds state in place across steps.

    Returns epoch(state, order [steps, B] i32, *arrays) ->
    (state, mean_metrics, last_metrics); for eval steps (train=False) the
    state passes through unchanged.
    """
    zero = {"loss": jnp.float32(0.0), "accuracy": jnp.float32(0.0)}

    def epoch(state, order, *arrays):
        def body(carry, idx):
            st, tot = carry
            batch = tuple(a[idx] for a in arrays)
            if sharding is not None:
                batch = tuple(
                    jax.lax.with_sharding_constraint(b, sharding)
                    for b in batch
                )
            if train:
                st, m = step_fn(st, *batch)
            else:
                m = step_fn(st, *batch)
            return (st, {k: tot[k] + m[k] for k in tot}), m

        (state, tot), ms = jax.lax.scan(body, (state, zero), order)
        n = order.shape[0]
        mean = {k: v / n for k, v in tot.items()}
        last = {k: v[-1] for k, v in ms.items()}
        return state, mean, last

    if train:
        return jax.jit(epoch, donate_argnums=(0,))
    return jax.jit(epoch)


def run_epoch_scan(epoch_fn, state, dataset, batch_size: int,
                   shuffle: bool = True, seed: int = 0):
    """Drive make_epoch_scan over a DeviceCachedDataset: builds the epoch's
    [steps, B] index matrix (same shuffle scheme as batch_iterator, so the
    batch schedule matches the host loader bit-for-bit) and returns
    (state, metrics) in run_epoch's reporting format."""
    import numpy as np

    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    steps = n // batch_size
    order = order[:steps * batch_size].reshape(steps, batch_size).astype(
        "int32")
    if jax.process_count() > 1:
        # multi-process: every host computed the same order (shared seed);
        # assemble it as a replicated global array so the jitted epoch
        # accepts it alongside the row-sharded dataset arrays
        from jax.sharding import NamedSharding, PartitionSpec

        from ndtpu.parallel.mesh import put_with_sharding

        mesh = dataset.arrays[0].sharding.mesh
        order = put_with_sharding(order,
                                  NamedSharding(mesh, PartitionSpec()))
    else:
        order = jnp.asarray(order)
    state, mean, last = epoch_fn(state, order, *dataset.arrays)
    # ONE host transfer for all metric scalars (each float() would pay a
    # full device round trip on the tunneled backend)
    mean, last = jax.device_get((mean, last))
    return state, {**{f"last_{k}": float(v) for k, v in last.items()},
                   **{f"mean_{k}": float(v) for k, v in mean.items()}}


def make_pointnet_seg_step(n_classes: int | None = None):
    """Train step for PointNetSegmentation (train_pointnet.py:82-182):
    batch = (points [B, N, 3], gt_onehot [B, N, C+1]), no NDT anywhere.
    With ``n_classes`` given, int class tags [B, N] are also accepted and
    one-hot-encoded on device (the production input path — C+1x less
    host->device traffic)."""

    def _gt(gt):
        if n_classes is not None and gt.ndim == 2:  # int tags [B, N]
            return jax.nn.one_hot(gt, n_classes + 1, dtype=jnp.float32)
        return gt

    @jax.jit
    def step(state, points, gt_onehot):
        gt_onehot = _gt(gt_onehot)

        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                points, train=True, return_logits=True,
                mutable=["batch_stats"],
            )
            loss = cross_entropy_loss(logits, gt_onehot)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        acc = accuracy(logits, gt_onehot)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, {"loss": loss, "accuracy": acc}

    @jax.jit
    def eval_step(state, points, gt_onehot):
        gt_onehot = _gt(gt_onehot)
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            points, train=False, return_logits=True,
        )
        return {
            "loss": cross_entropy_loss(logits, gt_onehot),
            "accuracy": accuracy(logits, gt_onehot),
        }

    return step, eval_step


def make_multiscale_seg_step(fine_res: int, coarse_res: int, n_classes: int,
                             use_pallas: bool = False, search: str = "fast",
                             mesh=None, data_axis: str = "data"):
    """Train step for NDTNetPPSegmentation (the working version of the
    broken reference trainer, tools/train_multiscale.py — SURVEY.md §2.4):
    fine + coarse NDT preprocessing on device, fine state threaded into the
    model for its mid-forward prune, loss on the fine-resolution GT."""

    prep_fine = _make_prep(fine_res, n_classes, use_pallas, search,
                           mesh, data_axis)
    prep_coarse = _make_prep(coarse_res, n_classes, use_pallas, search,
                             mesh, data_axis)

    def _prep(points, gt_onehot):
        p1, c1, gt1, m1, state1 = prep_fine(points, gt_onehot)
        p2, c2, _, _, _ = prep_coarse(points, gt_onehot)
        return p1, c1, gt1, m1, state1, p2, c2

    @jax.jit
    def step(state, points, gt_onehot):
        p1, c1, gt1, m1, state1, p2, c2 = _prep(points, gt_onehot)

        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                p1, c1, state1, p2, c2, train=True, return_logits=True,
                mutable=["batch_stats"],
            )
            loss = cross_entropy_loss(logits, gt1, m1)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        acc = accuracy(logits, gt1, m1)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, {"loss": loss, "accuracy": acc}

    @jax.jit
    def eval_step(state, points, gt_onehot):
        p1, c1, gt1, m1, state1, p2, c2 = _prep(points, gt_onehot)
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            p1, c1, state1, p2, c2, train=False, return_logits=True,
        )
        return {
            "loss": cross_entropy_loss(logits, gt1, m1),
            "accuracy": accuracy(logits, gt1, m1),
        }

    return step, eval_step


def make_classification_step(n_desired_nds: int, n_classes: int,
                             use_pallas: bool = False, search: str = "fast",
                             mesh=None, data_axis: str = "data"):
    """Train step for NDTNetClassification: batch = (points [B, N, 3],
    label_onehot [B, num_classes])."""
    prep = _make_prep(n_desired_nds, n_classes, use_pallas, search,
                      mesh, data_axis)

    @jax.jit
    def step(state, points, label_onehot):
        pcl, covs, _, mask, _ = prep(points, None)

        def loss_fn(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                pcl, covs, train=True, return_logits=True,
                mutable=["batch_stats"],
            )
            loss = cross_entropy_loss(logits, label_onehot)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        acc = accuracy(logits, label_onehot)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        return new_state, {"loss": loss, "accuracy": acc}

    @jax.jit
    def eval_step(state, points, label_onehot):
        pcl, covs, _, mask, _ = prep(points, None)
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            pcl, covs, train=False, return_logits=True,
        )
        return {
            "loss": cross_entropy_loss(logits, label_onehot),
            "accuracy": accuracy(logits, label_onehot),
        }

    return step, eval_step
