"""Host-side input pipeline: batching + device prefetch.

Replaces the reference's torch DataLoader(num_workers=4, pin_memory)
(tools/train.py:135-137) with a thread-pooled batch iterator and a
one-batch-ahead device prefetcher, so host IO/parsing overlaps device
compute. Under a Mesh the prefetcher places each batch with the given
sharding (per-host batch sharding for multi-host DP).
"""
from __future__ import annotations

import collections
import concurrent.futures as cf
import itertools
from typing import Iterable, Iterator, Optional

import numpy as np


def batch_iterator(dataset, batch_size: int, shuffle: bool = True,
                   seed: int = 0, drop_last: bool = True,
                   num_workers: int = 4) -> Iterator:
    """Yields tuples of stacked numpy arrays from an indexable dataset."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)

    def fetch(i):
        return dataset[int(i)]

    with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
        for start in range(0, n, batch_size):
            idxs = order[start:start + batch_size]
            if len(idxs) < batch_size and drop_last:
                return
            samples = list(pool.map(fetch, idxs))
            yield tuple(
                np.stack([s[k] for s in samples]) for k in range(len(samples[0]))
            )


def prefetch_to_device(it: Iterable, sharding=None, size: int = 2):
    """Keep `size` batches in flight on device (double buffering)."""
    import jax

    def put(batch):
        if sharding is None:
            return jax.tree_util.tree_map(jax.device_put, batch)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch
        )

    queue = collections.deque()
    it = iter(it)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
