"""Communication-volume accounting from compiled HLO (VERDICT r2 item 4).

The BASELINE.md scaling claims must rest on measured collectives, not
estimates. These tests lower + compile the production sharded programs on
the 8-virtual-device CPU mesh and assert the collective ops and their byte
volumes extracted from the optimized HLO (ndtpu/utils/hlo.py). The
full-size numbers are produced by scripts/collectives.py and recorded in
BASELINE.md; here tiny dims keep compile time test-friendly while pinning
the structure exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ndtpu.parallel.mesh import batch_sharding, make_mesh, replicate
from ndtpu.train.loop import make_ndt_seg_step
from ndtpu.train.state import create_train_state
from ndtpu.utils.hlo import jit_collectives, parse_collectives, shape_bytes


def test_shape_bytes_parsing():
    assert shape_bytes("f32[16,4096]") == 16 * 4096 * 4
    assert shape_bytes("(f32[8], s32[2,3])") == 32 + 24
    assert shape_bytes("bf16[128]") == 256
    assert shape_bytes("pred[]") == 1  # scalar

    txt = "%x = f32[64]{0} all-reduce(%y), replica_groups={}\n"
    out = parse_collectives(txt)
    assert out == {
        "all-reduce": {"count": 1, "bytes": 256, "shapes": [256]}
    }


def _dp_step_summary(mesh_arg):
    B, N, M, C, F = 8, 256, 16, 4, 32
    model_mesh = make_mesh(("data",))
    from ndtpu.models import NDTNetSegmentation

    model = NDTNetSegmentation(num_classes=C, feature_dim=F)
    state = create_train_state(
        model, optax.adam(1e-3), jax.random.PRNGKey(0),
        jnp.zeros((B, M, 3)), jnp.zeros((B, M, 9)),
        init_kwargs={"train": False},
    )
    state = replicate(model_mesh, state)
    sh = batch_sharding(model_mesh)
    pts = jax.device_put(jnp.zeros((B, N, 3)), sh)
    gt = jax.device_put(jnp.zeros((B, N, C + 1)), sh)
    step_fn, _ = make_ndt_seg_step(
        M, C, False, "fast", mesh=model_mesh if mesh_arg else None
    )
    param_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(state.params)
    )
    return jit_collectives(step_fn, state, pts, gt), param_bytes


def test_dp_train_step_collectives_production():
    """The production DP step (shard_map preprocessing): gradient allreduce
    equals the parameter bytes plus a small BN-stat/metric term, and NO
    other collective kind appears — preprocessing contributes zero
    communication."""
    summary, param_bytes = _dp_step_summary(mesh_arg=True)
    assert set(summary) == {"all-reduce"}
    ar = summary["all-reduce"]["bytes"]
    # grads are reduced exactly once per parameter; BN batch-stat and
    # loss/accuracy reductions add ~1% on top
    assert ar >= param_bytes
    assert ar <= param_bytes * 1.15 + 4096


def test_dp_train_step_gspmd_no_fallback():
    """Plain GSPMD (no mesh passed): r2 measured a [B, N] batch all-gather
    here — the partitioner's replicate fallback on the segment-starts
    `top_k`. In r3 that top_k was replaced by sparse tag columns
    riding the moment reduction (ndt._build_state), and the fallback
    disappeared with it: the unpinned step compiles to the same
    all-reduce-only collective set as the shard_map production path. The
    shard_map pinning in `_make_prep` stays as defense in depth (zero
    collectives by construction, immune to partitioner regressions)."""
    summary, param_bytes = _dp_step_summary(mesh_arg=False)
    assert set(summary) == {"all-reduce"}
    assert summary["all-reduce"]["bytes"] >= param_bytes


def test_point_sharded_collectives():
    """The giant-cloud pipeline's communication structure: per search
    iteration ONE table all-gather; in the moment pass one table
    all-gather plus ONE psum of the [k_max, 14] accumulator — nothing
    else (no all-to-all, no reduce-scatter, no hidden gathers of the
    [N]-sized point data)."""
    from ndtpu.core.ndt import max_segments
    from ndtpu.parallel.point_sharded import make_point_sharded_downsample
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_points, n_desired = 4096, 64
    k_max = max_segments(n_desired)
    mesh = make_mesh(("points",))
    d = mesh.devices.size
    fn = make_point_sharded_downsample(mesh, n_desired)
    sh = NamedSharding(mesh, P("points"))
    pts = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).normal(size=(n_points, 3), scale=10.0)
            .astype(np.float32)
        ),
        sh,
    )
    mask = jax.device_put(jnp.ones((n_points,), bool), sh)
    classes = jax.device_put(jnp.zeros((n_points,), jnp.int32), sh)
    summary = jit_collectives(fn, pts, mask, classes)

    assert set(summary) <= {"all-reduce", "all-gather"}
    # two all-gathers: the (zy, x) pair table in the search body (runs per
    # iteration) and the packed-key table in the moment pass (runs once)
    assert summary["all-gather"]["count"] == 2
    assert sorted(summary["all-gather"]["shapes"]) == sorted(
        [d * 2 * k_max * 4, d * k_max * 4]
    )
    # the moment psum: one [k_max, 1+3+9+1] f32 accumulator; the remaining
    # all-reduces are the tiny global min/max/count scalars
    psum_bytes = k_max * 14 * 4
    assert psum_bytes in summary["all-reduce"]["shapes"]
    others = [b for b in summary["all-reduce"]["shapes"] if b != psum_bytes]
    assert sum(others) < 1024
    # nothing ever moves O(N) point data between devices
    assert summary["all-gather"]["bytes"] + summary["all-reduce"]["bytes"] \
        < n_points * 3 * 4
