"""Pallas segment-sum kernel vs. the XLA path (interpret mode on CPU;
the same code compiles with Mosaic on TPU — exercised by bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndtpu.core.ndt import ndt_downsample
from ndtpu.ops.pallas.segment_moments import segment_sum_sorted


def dense_ranks(n, k, rng):
    """Non-decreasing ids with unit steps (the kernel's precondition —
    what cumsum-of-boundary-flags produces in the NDT pipeline)."""
    steps = np.zeros(n, np.int32)
    pos = rng.choice(n - 1, size=min(k - 1, n - 1), replace=False) + 1
    steps[pos] = 1
    return np.cumsum(steps).astype(np.int32)


@pytest.mark.parametrize("n,k,f,block", [
    (1000, 37, 16, 128),
    (513, 5, 42, 256),     # non-divisible N -> padding path
    (64, 40, 8, 512),      # tiny input, block clamped to N
])
def test_segment_sum_matches_xla(n, k, f, block):
    rng = np.random.default_rng(0)
    seg = dense_ranks(n, k, rng)
    feats = rng.normal(size=(n, f)).astype(np.float32)
    out = segment_sum_sorted(jnp.asarray(feats), jnp.asarray(seg), k, block_n=block)
    ref = jax.ops.segment_sum(
        jnp.asarray(feats), jnp.asarray(seg), num_segments=k,
        indices_are_sorted=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_sentinel_rows_dropped():
    rng = np.random.default_rng(1)
    n, k = 300, 20
    seg = dense_ranks(n, k, rng)
    seg[-40:] = k  # trailing jump to the invalid-id sentinel
    feats = rng.normal(size=(n, 4)).astype(np.float32)
    out = segment_sum_sorted(jnp.asarray(feats), jnp.asarray(seg), k, block_n=64)
    ref = jax.ops.segment_sum(
        jnp.asarray(feats[:-40]), jnp.asarray(seg[:-40]), num_segments=k
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_full_pipeline_pallas_parity():
    rng = np.random.default_rng(2)
    centers = rng.uniform(-5, 5, size=(30, 3))
    pts = (
        (centers[:, None, :] + rng.normal(scale=0.3, size=(30, 20, 3)))
        .reshape(-1, 3)
        .astype(np.float32)
    )
    a = ndt_downsample(jnp.asarray(pts), 16, use_pallas=False)
    b = ndt_downsample(jnp.asarray(pts), 16, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(b[3]))


@pytest.mark.parametrize("n,k,slots,block", [
    (1000, 37, 5, 128),
    (513, 5, 1, 256),      # non-divisible N -> padding path
    (64, 40, 3, 512),      # tiny input, block clamped
    (4096, 64, 29, 1024),  # trainers' 28+1 slots, sub-blocked (sub 128)
])
def test_fused_moments_matches_xla(n, k, slots, block):
    from ndtpu.core.moments import segment_moments_soa

    rng = np.random.default_rng(3)
    seg = dense_ranks(n, k, rng)
    seg[-7:] = k  # some dropped sentinel rows
    v = (rng.random(n) > 0.1).astype(np.float32)
    xt = (rng.normal(size=n) * v).astype(np.float32)
    yt = (rng.normal(size=n) * v).astype(np.float32)
    zt = (rng.normal(size=n) * v).astype(np.float32)
    cls = rng.integers(0, slots, size=n).astype(np.int32)

    kw = dict(classes=jnp.asarray(cls), num_class_slots=slots)
    a = segment_moments_soa(
        jnp.asarray(xt), jnp.asarray(yt), jnp.asarray(zt), jnp.asarray(v),
        jnp.asarray(seg), k, use_pallas=False, **kw,
    )
    import ndtpu.ops.pallas.segment_moments as sm
    try:  # force the fused kernel's block size via the env knob
        import os
        os.environ["NDTPU_PALLAS_BLOCK"] = str(block)
        sm._make_moments_fn.cache_clear()
        b = segment_moments_soa(
            jnp.asarray(xt), jnp.asarray(yt), jnp.asarray(zt), jnp.asarray(v),
            jnp.asarray(seg), k, use_pallas=True, **kw,
        )
    finally:
        os.environ.pop("NDTPU_PALLAS_BLOCK", None)
        sm._make_moments_fn.cache_clear()
    np.testing.assert_array_equal(np.asarray(a["counts"]), np.asarray(b["counts"]))
    np.testing.assert_allclose(
        np.asarray(a["sum_shift"]), np.asarray(b["sum_shift"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(a["sum_outer"]), np.asarray(b["sum_outer"]), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(a["class_hist"]), np.asarray(b["class_hist"])
    )


def test_fused_moments_batched():
    from ndtpu.core.moments import segment_moments_soa

    rng = np.random.default_rng(4)
    B, n, k, slots = 3, 200, 11, 4
    seg = np.stack([dense_ranks(n, k, rng) for _ in range(B)])
    v = np.ones((B, n), np.float32)
    xt = rng.normal(size=(B, n)).astype(np.float32)
    yt = rng.normal(size=(B, n)).astype(np.float32)
    zt = rng.normal(size=(B, n)).astype(np.float32)
    cls = rng.integers(0, slots, size=(B, n)).astype(np.int32)

    def one(args, use_pallas):
        return segment_moments_soa(
            *args[:4], args[5], k, classes=args[4],
            num_class_slots=slots, use_pallas=use_pallas,
        )

    args = tuple(map(jnp.asarray, (xt, yt, zt, v, cls, seg)))
    a = jax.vmap(lambda *a: one(a, False))(*args)
    b = jax.vmap(lambda *a: one(a, True))(*args)
    np.testing.assert_array_equal(np.asarray(a["counts"]), np.asarray(b["counts"]))
    np.testing.assert_allclose(
        np.asarray(a["sum_outer"]), np.asarray(b["sum_outer"]), atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(a["class_hist"]), np.asarray(b["class_hist"])
    )


def test_segment_tags_sorted_matches_segment_sum():
    """The tags-only kernel (point-sharded distinct-run tables) must match
    jax.ops.segment_sum on sparse tag columns, across sub-block configs."""
    import os

    import ndtpu.ops.pallas.segment_moments as sm
    from ndtpu.ops.pallas.segment_moments import segment_tags_sorted

    rng = np.random.default_rng(11)
    n, k = 2000, 77
    seg = dense_ranks(n, k, rng)
    seg[-5:] = k  # dropped sentinels
    new = np.ones(n, bool)
    new[1:] = seg[1:] != seg[:-1]
    t0 = np.where(new, rng.integers(0, 1 << 12, n), 0).astype(np.float32)
    t1 = np.where(new, rng.integers(0, 1 << 12, n), 0).astype(np.float32)
    want = np.zeros((k, 2), np.float32)
    np.add.at(want[:, 0], seg[seg < k], t0[seg < k])
    np.add.at(want[:, 1], seg[seg < k], t1[seg < k])
    for blk, sub in [(256, 0), (512, 128), (1024, 256)]:
        try:
            os.environ["NDTPU_PALLAS_BLOCK"] = str(blk)
            os.environ["NDTPU_PALLAS_SUBBLOCK"] = str(sub)
            sm._make_tags_fn.cache_clear()
            got = segment_tags_sorted(
                jnp.asarray(seg), (jnp.asarray(t0), jnp.asarray(t1)), k
            )
        finally:
            os.environ.pop("NDTPU_PALLAS_BLOCK", None)
            os.environ.pop("NDTPU_PALLAS_SUBBLOCK", None)
            sm._make_tags_fn.cache_clear()
        np.testing.assert_array_equal(np.asarray(got), want, err_msg=f"{blk}/{sub}")


def test_fused_moments_subblock_matches_whole_block():
    """Sub-blocked contraction must agree with whole-block: counts (and
    any sparse-tag extraction) are exact; float sums may differ in low
    bits because sub-blocking re-associates the within-segment reduction
    (the same effect block boundaries already have)."""
    import os

    import ndtpu.ops.pallas.segment_moments as sm
    from ndtpu.core.moments import segment_moments_soa

    rng = np.random.default_rng(5)
    n, k = 3000, 99
    seg = dense_ranks(n, k, rng)
    v = np.ones(n, np.float32)
    xt = rng.normal(size=n).astype(np.float32)
    yt = rng.normal(size=n).astype(np.float32)
    zt = rng.normal(size=n).astype(np.float32)

    def run(blk, sub):
        try:
            os.environ["NDTPU_PALLAS_BLOCK"] = str(blk)
            os.environ["NDTPU_PALLAS_SUBBLOCK"] = str(sub)
            sm._make_moments_fn.cache_clear()
            return segment_moments_soa(
                jnp.asarray(xt), jnp.asarray(yt), jnp.asarray(zt),
                jnp.asarray(v), jnp.asarray(seg), k, use_pallas=True,
            )
        finally:
            os.environ.pop("NDTPU_PALLAS_BLOCK", None)
            os.environ.pop("NDTPU_PALLAS_SUBBLOCK", None)
            sm._make_moments_fn.cache_clear()

    whole = run(512, 0)
    subbed = run(512, 128)
    np.testing.assert_array_equal(
        np.asarray(whole["counts"]), np.asarray(subbed["counts"])
    )
    for key in ("sum_shift", "sum_outer"):
        np.testing.assert_allclose(
            np.asarray(whole[key]), np.asarray(subbed[key]),
            atol=1e-4, err_msg=key,
        )
