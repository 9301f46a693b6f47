"""Host-side input pipeline: batching + device prefetch.

Replaces the reference's torch DataLoader(num_workers=4, pin_memory)
(tools/train.py:135-137) with a thread-pooled batch iterator and a
one-batch-ahead device prefetcher, so host IO/parsing overlaps device
compute. Under a Mesh the prefetcher places each batch with the given
sharding; under multiple processes (jax.distributed) every host loads only
its slice of each *global* batch and the prefetcher assembles the global
sharded array via `jax.make_array_from_process_local_data` — the SURVEY.md
§2.3 per-host input sharding recipe.
"""
from __future__ import annotations

import collections
import concurrent.futures as cf
from typing import Iterable, Iterator

import numpy as np


def batch_iterator(dataset, batch_size: int, shuffle: bool = True,
                   seed: int = 0, drop_last: bool = True,
                   num_workers: int = 4, process_id: int = 0,
                   num_processes: int = 1) -> Iterator:
    """Yields tuples of stacked numpy arrays from an indexable dataset.

    `batch_size` is the GLOBAL batch size. With num_processes > 1 the
    shuffle order derives from the same seed on every host, so all hosts
    agree on the global batch composition; each yields only its
    `batch_size / num_processes` slice (strided, so any global batch
    size divisible by num_processes works).
    """
    if batch_size % num_processes:
        raise ValueError(
            f"global batch_size {batch_size} must divide by "
            f"num_processes {num_processes}"
        )
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)

    def fetch(i):
        return dataset[int(i)]

    with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
        for start in range(0, n, batch_size):
            idxs = order[start:start + batch_size]
            if len(idxs) < batch_size:
                if drop_last or num_processes > 1:
                    # multi-process: a partial global batch would give
                    # hosts unequal (possibly zero) shard sizes, which
                    # breaks the global-array assembly — always drop it
                    return
            local = idxs[process_id::num_processes]
            samples = list(pool.map(fetch, local))
            yield tuple(
                np.stack([s[k] for s in samples]) for k in range(len(samples[0]))
            )


class CachedDataset:
    """In-memory sample cache around an indexable dataset.

    The r4 TPU training session (BASELINE.md) measured the trainer
    host-bound on dataset __getitem__: synthetic generation (and the
    reference's PLY text parsing, CARLA_Seg.py:97-137) re-runs for every
    sample every epoch, costing seconds per epoch against ~50 ms of
    device compute. Samples are deterministic per index, so caching the
    first epoch's fetches removes the recurring cost (64 canonical
    70k-point clouds ≈ 53 MB — far under host RAM; disable for datasets
    that don't fit)."""

    def __init__(self, ds):
        self.ds = ds
        self._cache = {}

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        hit = self._cache.get(i)
        if hit is None:
            hit = self._cache[i] = self.ds[i]
        return hit


class DeviceCachedDataset:
    """Whole-dataset device residency: ONE host->device upload at
    construction, then per-batch on-device gathers (zero per-step wire
    traffic).

    Motivation (r4 TPU session, BASELINE.md): this image's tunneled TPU
    moves host->device data at ~10 MB/s, so shipping the canonical
    13.4 MB point batch costs ~1.3 s against a ~12 ms train step; any
    dataset that fits HBM (64 canonical clouds ≈ 54 MB vs 16 GB) should
    live on device and be indexed there. On a real (PCIe-attached) host
    the same structure still saves the per-step copy.

    Multi-process (r5, VERDICT r4 item 7): pass the data-axis `sharding`
    — each host materializes only its contiguous 1/P block of samples
    and the global [n, ...] jax.Arrays are assembled row-sharded over the
    mesh, so global row i == dataset index i and the epoch scan's batch
    gathers (`a[idx]`) see the same global batch composition as the
    strided per-step loader; XLA inserts the cross-host gathers inside
    the one compiled epoch. Use with make_epoch_scan (the host-side
    ``loader()`` stays single-process)."""

    def __init__(self, ds, sharding=None):
        import jax

        n = len(ds)
        nproc = jax.process_count()
        if nproc > 1:
            if sharding is None:
                raise ValueError(
                    "multi-process DeviceCachedDataset needs the data-axis "
                    "sharding to assemble global arrays"
                )
            if n % nproc:
                raise ValueError(
                    f"dataset length {n} must divide by process count "
                    f"{nproc} for block sharding"
                )
            from ndtpu.parallel.mesh import put_with_sharding

            p = jax.process_index()
            block = n // nproc
            samples = [ds[i] for i in range(p * block, (p + 1) * block)]
            self.arrays = put_with_sharding(
                tuple(np.stack([s[k] for s in samples])
                      for k in range(len(samples[0]))),
                sharding,
            )
            return
        samples = [ds[i] for i in range(n)]
        self.arrays = tuple(
            jax.device_put(np.stack([s[k] for s in samples]),
                           *(() if sharding is None else (sharding,)))
            for k in range(len(samples[0]))
        )

    def __len__(self):
        return self.arrays[0].shape[0]

    def loader(self, batch_size: int, shuffle: bool = True, seed: int = 0,
               sharding=None):
        import jax
        import jax.numpy as jnp

        n = len(self)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for start in range(0, n - batch_size + 1, batch_size):
            idx = jnp.asarray(order[start:start + batch_size])
            batch = tuple(a[idx] for a in self.arrays)
            if sharding is not None:
                batch = tuple(jax.device_put(b, sharding) for b in batch)
            yield batch


def put_global(batch, sharding=None):
    """Place one (possibly process-local) batch on device.

    Single-process: a plain (sharded) device_put. Multi-process: each leaf
    is this host's shard of the global batch; the global jax.Array is
    assembled so jitted SPMD steps see the full batch dimension.
    """
    import jax

    if sharding is None:
        return jax.tree_util.tree_map(jax.device_put, batch)
    from ndtpu.parallel.mesh import put_with_sharding

    return put_with_sharding(batch, sharding)


def prefetch_to_device(it: Iterable, sharding=None, size: int = 2):
    """Keep `size` batches in flight on device (double buffering)."""
    queue = collections.deque()
    it = iter(it)
    try:
        for _ in range(size):
            queue.append(put_global(next(it), sharding))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put_global(next(it), sharding))
        except StopIteration:
            pass
        yield out
