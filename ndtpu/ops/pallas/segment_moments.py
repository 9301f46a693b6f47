"""Fused sorted-segment-sum Pallas kernel (scatter-as-matmul).

The hot op of the NDT sampler is the per-voxel moment accumulation — the
role played by the reference's 8 pthreads + per-voxel mutexes
(`core_legacy/src/normal_distributions.c:28-137`). XLA lowers segment_sum
to scatter-add, which serializes on TPU; the idiomatic formulation is
scatter-as-matmul: for a block of points sorted by segment id, the update is

    out[s0 : s0+W, :] += onehotᵀ @ feats_block        (an MXU contraction)

where `onehot[i, j] = (seg_ids[i] - s0 == j)` is built on the fly in VMEM
and never materialized in HBM. The TPU grid is sequential over point
blocks, so accumulating into the output ref across grid steps is race-free
by construction.

Precondition: ids must be *dense sorted ranks* — non-decreasing with unit
steps (exactly what the NDT pipeline's cumsum-of-boundary-flags produces).
Density bounds the id span of any block by the block length, so a
block-sized output window always suffices. Ids >= num_segments (the
invalid-point sentinel) either land in the caller's designated drop row or
fall outside every window and contribute all-zero one-hot rows.

Batching: a jax.custom_batching rule flattens [B, N] inputs into one kernel
call — each batch element gets its own block-aligned id range (so no point
block ever mixes batches) and its own row region of the accumulator. This
is what makes the kernel usable inside the vmapped ndt_downsample.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = jnp.iinfo(jnp.int32).max // 2


def _kernel(seg_ref, feats_ref, out_ref, *, block_n, rows):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    seg = seg_ref[:, 0]  # [block_n] int32, sorted non-decreasing
    feats = feats_ref[:]  # [block_n, F]

    start = jnp.minimum(seg[0], rows - block_n)  # clamp window into out
    local = seg - start  # in [0, block_n) for every valid row (dense sorted)
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


def _call_kernel(feats_flat, seg_flat, rows: int, block_n: int):
    """feats [M, F] f32, seg [M] i32 (M % block_n == 0) -> [rows, F]."""
    m, f = feats_flat.shape
    grid = (m // block_n,)
    return pl.pallas_call(
        functools.partial(_kernel, block_n=block_n, rows=rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_n, f), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rows, f), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, f), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(seg_flat[:, None], feats_flat.astype(jnp.float32))


def _pad(feats, seg_ids, block_n):
    n = feats.shape[-2]
    pad_n = (-n) % block_n
    if pad_n:
        widths = [(0, 0)] * (feats.ndim - 2) + [(0, pad_n), (0, 0)]
        feats = jnp.pad(feats, widths)
        seg_ids = jnp.pad(
            seg_ids, [(0, 0)] * (seg_ids.ndim - 1) + [(0, pad_n)],
            constant_values=_BIG,
        )
    return feats, seg_ids


@functools.lru_cache(maxsize=None)
def _make_fn(num_segments: int, block_n: int):
    rows = max(num_segments, block_n)

    @jax.custom_batching.custom_vmap
    def f(feats, seg_ids):
        feats_p, seg_p = _pad(feats, seg_ids, block_n)
        out = _call_kernel(feats_p, seg_p, rows, block_n)
        return out[:num_segments]

    @f.def_vmap
    def rule(axis_size, in_batched, feats, seg_ids):
        b = axis_size
        if not in_batched[0]:
            feats = jnp.broadcast_to(feats, (b,) + feats.shape)
        if not in_batched[1]:
            seg_ids = jnp.broadcast_to(seg_ids, (b,) + seg_ids.shape)
        feats_p, seg_p = _pad(feats, seg_ids, block_n)
        n_p = feats_p.shape[1]
        # give each batch element its own row region; sentinels stay huge
        offs = (jnp.arange(b, dtype=jnp.int32) * rows)[:, None]
        seg_flat = jnp.where(
            seg_p >= num_segments, _BIG, seg_p + offs
        ).reshape(b * n_p)
        feats_flat = feats_p.reshape(b * n_p, feats_p.shape[-1])
        out = _call_kernel(feats_flat, seg_flat, b * rows, block_n)
        out = out.reshape(b, rows, feats_p.shape[-1])[:, :num_segments]
        return out, True

    return f


def segment_sum_sorted(feats, seg_ids, num_segments: int,
                       block_n: int | None = None):
    """Segment-sum of `feats` [..., N, F] by dense sorted rank `seg_ids`
    [..., N] into [..., num_segments, F]. Ids must be non-decreasing with
    unit steps (see module docstring); ids >= num_segments are dropped.
    Matches jax.ops.segment_sum(indices_are_sorted=True) under that
    precondition, and vmaps (one fused kernel call for the whole batch).

    block_n trades onehot-matmul FLOPs (block_n^2 * F per block) against
    grid-step count; overridable via NDTPU_PALLAS_BLOCK for tuning."""
    if block_n is None:
        import os

        block_n = int(os.environ.get("NDTPU_PALLAS_BLOCK", "512"))
    n = feats.shape[-2]
    block_n = min(block_n, max(8, ((n + 7) // 8) * 8))
    fn = _make_fn(int(num_segments), int(block_n))
    return fn(feats, seg_ids.astype(jnp.int32))
