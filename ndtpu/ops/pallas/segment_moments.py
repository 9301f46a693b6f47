"""Fused sorted-segment-sum Pallas kernel (scatter-as-matmul).

The hot op of the NDT sampler is the per-voxel moment accumulation — the
role played by the reference's 8 pthreads + per-voxel mutexes
(`core_legacy/src/normal_distributions.c:28-137`). On TPU the idiomatic
formulation is scatter-as-matmul: for a block of points sorted by segment
id, the update is

    out[s0 : s0+W, :] += onehotᵀ @ feats_block        (an MXU contraction)

where `onehot[i, j] = (seg_ids[i] - s0 == j)` is built on the fly in VMEM
(never materialized in HBM — the XLA segment_sum path scatters row-by-row
instead).

Precondition: ids must be *dense sorted ranks* — non-decreasing and
incrementing by at most 1 between consecutive rows (exactly what the NDT
pipeline's cumsum-of-boundary-flags produces, ndtpu/core/ndt.py). Density
bounds the id span of any block by the block length, so a block-sized
output window always suffices. The single allowed exception is a trailing
jump to an invalid-id sentinel: sentinel rows either land in the window's
tail row (the caller's designated drop row) or fall outside it and
contribute an all-zero one-hot row — dropped either way, which is their
semantic.

The TPU grid is sequential over point blocks, so accumulating into the
output ref across grid steps is race-free by construction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(seg_ref, feats_ref, out_ref, *, block_n, rows):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    seg = seg_ref[:]  # [block_n] int32, sorted non-decreasing
    feats = feats_ref[:]  # [block_n, F]

    start = jnp.minimum(seg[0], rows - block_n)  # clamp window into out
    local = seg - start  # in [0, block_n) for every valid row (sorted)
    onehot = (
        local[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (block_n, block_n), 1)
    ).astype(feats.dtype)

    contrib = jax.lax.dot_general(
        onehot, feats,
        dimension_numbers=(((0,), (0,)), ((), ())),  # onehot^T @ feats
        preferred_element_type=jnp.float32,
    )  # [block_n, F]
    out_ref[pl.ds(start, block_n), :] += contrib


@functools.partial(jax.jit, static_argnames=("num_segments", "block_n"))
def segment_sum_sorted(feats, seg_ids, num_segments: int, block_n: int = 512):
    """Segment-sum of `feats` [N, F] by dense sorted rank `seg_ids` [N]
    into [num_segments, F]. Ids must be non-decreasing with unit steps
    (see module docstring); ids >= num_segments are dropped. Matches
    jax.ops.segment_sum(indices_are_sorted=True) under that precondition."""
    n, f = feats.shape
    block_n = min(block_n, max(8, n))
    rows = max(num_segments, block_n)

    pad_n = (-n) % block_n
    if pad_n:
        feats = jnp.pad(feats, ((0, pad_n), (0, 0)))
        # padded rows get an id beyond every window -> zero one-hot rows
        seg_ids = jnp.pad(
            seg_ids, (0, pad_n), constant_values=jnp.iinfo(jnp.int32).max // 2
        )
    grid = (feats.shape[0] // block_n,)

    out = pl.pallas_call(
        functools.partial(_kernel, block_n=block_n, rows=rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n,), lambda i: (i,)),
            pl.BlockSpec((block_n, f), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rows, f), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, f), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(seg_ids, feats.astype(jnp.float32))
    return out[:num_segments]
