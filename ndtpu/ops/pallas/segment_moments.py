"""Fused sorted-segment-sum Pallas kernel (scatter-as-matmul).

The hot op of the NDT sampler is the per-voxel moment accumulation — the
role played by the reference's 8 pthreads + per-voxel mutexes
(`core_legacy/src/normal_distributions.c:28-137`). XLA lowers segment_sum
to scatter-add, which serializes on TPU; the idiomatic formulation is
scatter-as-matmul: for a block of points sorted by segment id, the update is

    out[s0 : s0+W, :] += onehotᵀ @ feats_block        (an MXU contraction)

where `onehot[s, i] = (seg_ids[i] - s0 == s)` is built on the fly in VMEM
and never materialized in HBM. The TPU grid is sequential over point
blocks, so accumulating into the output ref across grid steps is race-free
by construction.

Layout notes (these dominated the kernel's runtime before being fixed):
- seg ids ship as one [1, block_n] row per grid step (lane-major), not a
  [block_n, 1] column — a column of int32 occupies one valid lane per
  (8, 128) tile, inflating its DMA 128×.
- the output window start is aligned down to the f32 sublane count (8), so
  the read-modify-write of out_ref hits whole tiles; the onehot matrix gets
  8 extra rows of headroom to compensate.

Precondition: ids must be *dense sorted ranks* — non-decreasing with unit
steps (exactly what the NDT pipeline's cumsum-of-boundary-flags produces).
Density bounds the id span of any block by the block length, so a
block-sized (+ alignment headroom) output window always suffices. Ids >=
num_segments (the invalid-point sentinel) either land in the caller's
designated drop row or fall outside every window and contribute all-zero
one-hot rows.

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
from jax.experimental.pallas import tpu as pltpu  # noqa: F401

from ndtpu.utils.platform import is_tpu

_BIG = jnp.iinfo(jnp.int32).max // 2
_SUBLANE = 8  # f32 sublane count; window starts align to this


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(seg_ref, feats_ref, out_ref, *, block_n, sub_n, rows, bf16x3):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # One grid step DMAs block_n points but contracts them in sub_n-point
    # sub-blocks, each against its own small one-hot window: per-grid-step
    # fixed costs (DMA issue, control) amortize over block_n while the
    # onehot-matmul FLOPs stay ~(sub_n + 8) * F per point. Dense sorted
    # ids bound any sub-block's id span by sub_n, so the sub-window always
    # suffices — same argument as the original whole-block window.
    for j in range(block_n // sub_n):
        seg = seg_ref[0, 0, pl.ds(j * sub_n, sub_n)]
        feats = feats_ref[pl.ds(j * sub_n, sub_n), :]

        window = sub_n + _SUBLANE
        # clamp window into out, then align down to a sublane boundary
        start = jnp.minimum(seg[0], rows - window)
        start = pl.multiple_of((start // _SUBLANE) * _SUBLANE, _SUBLANE)
        local = seg - start  # in [0, window) for every valid row
        iota = jax.lax.broadcasted_iota(jnp.int32, (window, sub_n), 0)
        hit = iota == local[None, :]

        if bf16x3:
            # The one-hot matrix is exact in bf16, so the contraction can
            # run at the MXU's bf16 rate if feats is split into three bf16
            # mantissa chunks (hi + mid + lo reconstructs >= f32's 24
            # mantissa bits; each residual subtraction below is exact in
            # f32). The chunks pack along lanes (F -> 3F; for the NDT
            # feature width 3*42 = 126 <= 128 this is free under lane
            # padding) so ONE matmul computes all three partial sums,
            # folded back in f32 afterwards.
            f = feats.shape[1]
            hi = feats.astype(jnp.bfloat16)
            r1 = feats - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            packed = jnp.concatenate([hi, mid, lo], axis=1)
            p = jax.lax.dot_general(
                hit.astype(jnp.bfloat16), packed,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [window, 3F] f32
            contrib = p[:, :f] + p[:, f:2 * f] + p[:, 2 * f:]
        else:
            contrib = jax.lax.dot_general(
                hit.astype(jnp.float32), feats,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [window, F]
        out_ref[pl.ds(start, window), :] += contrib


def _bf16x3_enabled() -> bool:
    """Opt-in (NDTPU_PALLAS_PRECISION=bf16x3): run the one-hot contraction
    at the MXU's bf16 rate via a 3-way mantissa split. Measured neutral on
    the canonical workload (the kernel is bandwidth/step-bound, not
    matmul-bound), differs from the f32 path in low-order bits, and
    overflows for |values| above bf16 max — so f32 stays the default, in
    line with the repo's f32-for-parity convention."""
    import os

    return os.environ.get("NDTPU_PALLAS_PRECISION", "f32") == "bf16x3"


def _call_kernel(feats_flat, seg_flat, rows: int, block_n: int, sub_n: int):
    """feats [M, F] f32, seg [M] i32 (M % block_n == 0) -> [rows, F]."""
    m, f = feats_flat.shape
    grid = (m // block_n,)
    return pl.pallas_call(
        functools.partial(
            _kernel, block_n=block_n, sub_n=sub_n, rows=rows,
            bf16x3=_bf16x3_enabled(),
        ),
        grid=grid,
        in_specs=[
            # (1, 1, block_n) row blocks: lane-major ids, one contiguous DMA
            # per step (a [block_n, 1] column would waste 127/128 lanes)
            pl.BlockSpec((1, 1, block_n), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_n, f), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rows, f), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, f), jnp.float32),
        interpret=not is_tpu(),
    )(seg_flat.reshape(grid[0], 1, block_n), feats_flat.astype(jnp.float32))


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
def _make_fn(num_segments: int, block_n: int, sub_n: int):
    rows = _round_up(max(num_segments, sub_n + _SUBLANE), _SUBLANE)

    @jax.custom_batching.custom_vmap
    def f(feats, seg_ids):
        feats_p, seg_p = _pad(feats, seg_ids, block_n)
        out = _call_kernel(feats_p, seg_p, rows, block_n, sub_n)
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
        out = _call_kernel(feats_flat, seg_flat, b * rows, block_n, sub_n)
        out = out.reshape(b, rows, feats_p.shape[-1])[:, :num_segments]
        return out, True

    return f


def _moments_kernel(seg_ref, xt_ref, yt_ref, zt_ref, v_ref, cls_ref,
                    *tag_and_out_refs, block_n, sub_n, rows, slots, n_tags,
                    bf16x3):
    """Fused NDT-moment accumulation: builds the 13(+slots)(+tags)-row
    feature matrix in VMEM from compact 1-D inputs, then contracts it with
    the block one-hot on the MXU. Never materializes [N, F] in HBM.

    Tag rows (see moments.segment_moments_soa) are sparse per-segment
    constants — at most one nonzero row per segment — so their contraction
    result is a single exact f32 value, not an accumulated sum.

    Sub-blocking (see _kernel): one grid step DMAs block_n points but
    contracts sub_n at a time against a (sub_n + 8)-row one-hot window, so
    grid-step overhead amortizes over block_n while matmul FLOPs scale
    with sub_n."""
    *tag_refs, out_ref = tag_and_out_refs
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for j in range(block_n // sub_n):
        sl = pl.ds(j * sub_n, sub_n)
        seg = seg_ref[0, 0, sl]
        xt = xt_ref[0, 0, sl]
        yt = yt_ref[0, 0, sl]
        zt = zt_ref[0, 0, sl]
        v = v_ref[0, 0, sl]
        cls = cls_ref[0, 0, sl]

        window = sub_n + _SUBLANE
        start = jnp.minimum(seg[0], rows - window)
        start = pl.multiple_of((start // _SUBLANE) * _SUBLANE, _SUBLANE)
        local = seg - start
        hit = (
            jax.lax.broadcasted_iota(jnp.int32, (window, sub_n), 0)
            == local[None, :]
        )

        xx, xy, xz = xt * xt, xt * yt, xt * zt
        yy, yz, zz = yt * yt, yt * zt, zt * zt
        blocks = [jnp.stack(
            [v, xt, yt, zt, xx, xy, xz, xy, yy, yz, xz, yz, zz], axis=0
        )]
        if slots:
            # class-histogram rows as ONE broadcast compare against a
            # [slots, sub_n] iota (not a Python loop of per-class VPU
            # ops — at the trainers' 28(+1) slots the loop dominated the
            # tagged kernel's VPU time); v masks invalid rows to zero
            cls_hot = (
                jax.lax.broadcasted_iota(jnp.int32, (slots, sub_n), 0)
                == cls[None, :]
            ).astype(jnp.float32) * v[None, :]
            blocks.append(cls_hot)
        if tag_refs:
            blocks.append(
                jnp.stack([tr[0, 0, sl] for tr in tag_refs], axis=0)
            )
        feats = (
            jnp.concatenate(blocks, axis=0) if len(blocks) > 1 else blocks[0]
        )  # [F, sub_n] f32, VMEM only

        if bf16x3:
            f = feats.shape[0]
            hi = feats.astype(jnp.bfloat16)
            r1 = feats - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            packed = jnp.concatenate([hi, mid, lo], axis=0)  # [3F, sub_n]
            p = jax.lax.dot_general(
                hit.astype(jnp.bfloat16), packed,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [window, 3F]
            contrib = p[:, :f] + p[:, f:2 * f] + p[:, 2 * f:]
        else:
            contrib = jax.lax.dot_general(
                hit.astype(jnp.float32), feats,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [window, F]
        out_ref[pl.ds(start, window), :] += contrib


def _call_moments_kernel(seg, xt, yt, zt, v, cls, tags, rows: int,
                         block_n: int, sub_n: int, slots: int):
    """All inputs flat [M] (M % block_n == 0) -> [rows, 13 + slots + tags]."""
    m = seg.shape[0]
    grid = (m // block_n,)
    n_tags = len(tags)
    f = 13 + slots + n_tags

    def spec():
        return pl.BlockSpec((1, 1, block_n), lambda i: (i, 0, 0))

    def rs(a):
        return a.reshape(grid[0], 1, block_n)

    return pl.pallas_call(
        functools.partial(
            _moments_kernel, block_n=block_n, sub_n=sub_n, rows=rows,
            slots=slots, n_tags=n_tags, bf16x3=_bf16x3_enabled(),
        ),
        grid=grid,
        in_specs=[spec() for _ in range(6 + n_tags)],
        out_specs=pl.BlockSpec((rows, f), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, f), jnp.float32),
        interpret=not is_tpu(),
    )(
        rs(seg), rs(xt.astype(jnp.float32)), rs(yt.astype(jnp.float32)),
        rs(zt.astype(jnp.float32)), rs(v.astype(jnp.float32)), rs(cls),
        *[rs(t.astype(jnp.float32)) for t in tags],
    )


def _pad1(a, block_n, value=0):
    n = a.shape[-1]
    pad_n = (-n) % block_n
    if pad_n:
        a = jnp.pad(
            a, [(0, 0)] * (a.ndim - 1) + [(0, pad_n)], constant_values=value
        )
    return a


@functools.lru_cache(maxsize=None)
def _make_moments_fn(num_segments: int, slots: int, block_n: int,
                     n_tags: int, sub_n: int):
    rows = _round_up(max(num_segments, sub_n + _SUBLANE), _SUBLANE)
    f_out = 13 + slots + n_tags

    @jax.custom_batching.custom_vmap
    def f(xt, yt, zt, v, cls, seg_ids, *tags):
        seg_p = _pad1(seg_ids, block_n, value=_BIG)
        args = [_pad1(a, block_n) for a in (xt, yt, zt, v)]
        cls_p = _pad1(cls, block_n)
        tags_p = [_pad1(t, block_n) for t in tags]
        out = _call_moments_kernel(
            seg_p, *args, cls_p, tags_p, rows, block_n, sub_n, slots
        )
        return out[:num_segments]

    @f.def_vmap
    def rule(axis_size, in_batched, xt, yt, zt, v, cls, seg_ids, *tags):
        b = axis_size
        ops = [xt, yt, zt, v, cls, seg_ids, *tags]
        for i, (op, batched) in enumerate(zip(ops, in_batched)):
            if not batched:
                ops[i] = jnp.broadcast_to(op, (b,) + op.shape)
        xt, yt, zt, v, cls, seg_ids, *tags = ops
        seg_p = _pad1(seg_ids, block_n, value=_BIG)
        n_p = seg_p.shape[1]
        offs = (jnp.arange(b, dtype=jnp.int32) * rows)[:, None]
        seg_flat = jnp.where(
            seg_p >= num_segments, _BIG, seg_p + offs
        ).reshape(b * n_p)
        flat = [
            _pad1(a, block_n).reshape(b * n_p) for a in (xt, yt, zt, v, cls)
        ]
        tags_flat = [_pad1(t, block_n).reshape(b * n_p) for t in tags]
        out = _call_moments_kernel(
            seg_flat, *flat, tags_flat, b * rows, block_n, sub_n, slots
        )
        out = out.reshape(b, rows, f_out)[:, :num_segments]
        return out, True

    return f


def _block_config(block_n, n):
    """Resolve (block_n, sub_n) from args/env: block_n is the DMA grain
    per grid step (NDTPU_PALLAS_BLOCK), sub_n the one-hot matmul grain
    (NDTPU_PALLAS_SUBBLOCK, default = block_n i.e. no sub-blocking).
    sub_n must divide block_n; a non-divisor falls back to block_n."""
    import os

    # defaults from the r4 TPU sweep (BASELINE.md): the whole-block kernel
    # is grid-step-overhead-bound (probe trio: full 1.18 / no-matmul 1.09 /
    # empty 0.66 ms at block 256 on the 1.12M-point canonical batch), so
    # big DMA blocks + small matmul windows win — 2048/128 measured 0.6 ms
    # faster end-to-end than the r3 256/whole-block default
    if block_n is None:
        block_n = int(os.environ.get("NDTPU_PALLAS_BLOCK", "2048"))
    block_n = min(block_n, max(_SUBLANE, _round_up(n, _SUBLANE)))
    sub_n = int(os.environ.get("NDTPU_PALLAS_SUBBLOCK", "128")) or block_n
    sub_n = min(sub_n, block_n)
    if block_n % sub_n:
        sub_n = block_n
    return block_n, sub_n


def fused_moments_sorted(xt, yt, zt, v, cls, seg_ids, num_segments: int,
                         slots: int, block_n: int | None = None, tags=None):
    """NDT Gaussian-moment accumulation from compact 1-D inputs.

    xt/yt/zt: [..., N] f32 voxel-center-shifted coordinates, pre-masked
    (invalid rows zero). v: [..., N] f32 validity. cls: [..., N] i32 class
    tags. seg_ids: [..., N] i32 dense sorted ranks (ids >= num_segments
    dropped). tags: optional tuple of [..., N] f32 sparse per-segment
    constants (at most one nonzero row per segment — extracted exactly, see
    moments.segment_moments_soa). Returns
    [..., num_segments, 13 + slots + len(tags)] f32 accumulator rows
    [count, Σx̃, Σx̃x̃ᵀ(9), class histogram(slots), tag values]."""
    block_n, sub_n = _block_config(block_n, seg_ids.shape[-1])
    tags = tuple(tags) if tags else ()
    fn = _make_moments_fn(
        int(num_segments), int(slots), int(block_n), len(tags), int(sub_n)
    )
    return fn(xt, yt, zt, v, cls.astype(jnp.int32),
              seg_ids.astype(jnp.int32), *tags)


def _tags_kernel(seg_ref, *tag_and_out_refs, block_n, sub_n, rows, n_tags):
    """Tags-only variant of _moments_kernel: contracts just the sparse
    per-segment tag rows (no coordinate moments, no class histogram) — the
    light entry the point-sharded distinct-run tables need (ADVICE r3: the
    previous route through fused_moments_sorted carried 13 dead feature
    rows and 13 dead output columns per block)."""
    *tag_refs, out_ref = tag_and_out_refs
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    for j in range(block_n // sub_n):
        sl = pl.ds(j * sub_n, sub_n)
        seg = seg_ref[0, 0, sl]
        window = sub_n + _SUBLANE
        start = jnp.minimum(seg[0], rows - window)
        start = pl.multiple_of((start // _SUBLANE) * _SUBLANE, _SUBLANE)
        local = seg - start
        hit = (
            jax.lax.broadcasted_iota(jnp.int32, (window, sub_n), 0)
            == local[None, :]
        )
        feats = jnp.stack(
            [tr[0, 0, sl] for tr in tag_refs], axis=0
        )  # [n_tags, sub_n], VMEM only
        contrib = jax.lax.dot_general(
            hit.astype(jnp.float32), feats,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[pl.ds(start, window), :] += contrib


@functools.lru_cache(maxsize=None)
def _make_tags_fn(num_segments: int, n_tags: int, block_n: int, sub_n: int):
    rows = _round_up(max(num_segments, sub_n + _SUBLANE), _SUBLANE)

    def f(seg_ids, *tags):
        seg_p = _pad1(seg_ids, block_n, value=_BIG)
        tags_p = [_pad1(t, block_n) for t in tags]
        m = seg_p.shape[0]
        grid = (m // block_n,)

        def rs(a):
            return a.reshape(grid[0], 1, block_n)

        out = pl.pallas_call(
            functools.partial(
                _tags_kernel, block_n=block_n, sub_n=sub_n, rows=rows,
                n_tags=n_tags,
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_n), lambda i: (i, 0, 0))
                for _ in range(1 + n_tags)
            ],
            out_specs=pl.BlockSpec((rows, n_tags), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, n_tags), jnp.float32),
            interpret=not is_tpu(),
        )(rs(seg_p), *[rs(t.astype(jnp.float32)) for t in tags_p])
        return out[:num_segments]

    return f


def segment_tags_sorted(seg_ids, tags, num_segments: int,
                        block_n: int | None = None):
    """Extract sparse per-segment tag columns (at most one nonzero entry
    per segment, exact in f32) by dense sorted rank `seg_ids` [N] into
    [num_segments, len(tags)]. 1-D/unbatched (the point-sharded tables
    call this per shard inside shard_map); same id contract as
    segment_sum_sorted."""
    block_n, sub_n = _block_config(block_n, seg_ids.shape[-1])
    fn = _make_tags_fn(int(num_segments), len(tags), int(block_n),
                       int(sub_n))
    return fn(seg_ids.astype(jnp.int32), *tags)


def segment_sum_sorted(feats, seg_ids, num_segments: int,
                       block_n: int | None = None):
    """Segment-sum of `feats` [..., N, F] by dense sorted rank `seg_ids`
    [..., N] into [..., num_segments, F]. Ids must be non-decreasing with
    unit steps (see module docstring); ids >= num_segments are dropped.
    Matches jax.ops.segment_sum(indices_are_sorted=True) under that
    precondition, and vmaps (one fused kernel call for the whole batch).

    block_n trades DMA grain against grid-step count and sub_n (see
    _block_config) bounds the onehot-matmul FLOPs (~sub_n^2 * F per
    sub-block); overridable via NDTPU_PALLAS_BLOCK / NDTPU_PALLAS_SUBBLOCK
    for tuning."""
    block_n, sub_n = _block_config(block_n, feats.shape[-2])
    fn = _make_fn(int(num_segments), int(block_n), int(sub_n))
    return fn(feats, seg_ids.astype(jnp.int32))
