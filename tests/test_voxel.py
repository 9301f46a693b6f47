"""Voxel-space math tests.

Ports the semantic cases of the reference gtest suite
(`core_legacy/tests/test_voxel.cpp`). The metric<->voxel cases there predate
the offset parameters and assume a grid centered on the origin, so the
centered offsets are passed explicitly here.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ndtpu.core import voxel as vx


def centered_offsets(lens, size):
    return -np.asarray(lens) * size / 2.0


# test_voxel.cpp:4-66 — (n, mins, maxs, expected size, expected lens)
SIZE_CASES = [
    (12, (-2.0, -1.5, -0.5), (2.0, 1.5, 0.5), 1.0, (4, 3, 1)),
    (32, (-2.0, -2.0, -1.0), (2.0, 2.0, 1.0), 1.0, (4, 4, 2)),
    (256, (-2.0, -2.0, -1.0), (2.0, 2.0, 1.0), 0.5, (8, 8, 4)),
    (8, (-1.0, -1.0, -1.0), (1.0, 1.0, 1.0), 1.0, (2, 2, 2)),
]


@pytest.mark.parametrize("n,mins,maxs,exp_size,exp_lens", SIZE_CASES)
def test_estimate_voxel_size(n, mins, maxs, exp_size, exp_lens):
    size, lens, offsets = vx.estimate_voxel_size(
        n, jnp.array(mins), jnp.array(maxs)
    )
    assert float(size) == pytest.approx(exp_size, rel=1e-5)
    assert tuple(np.asarray(lens)) == exp_lens
    np.testing.assert_allclose(np.asarray(offsets), mins, rtol=1e-6)


# test_voxel.cpp:68-105 — centered grid, voxel size 1
M2V_CASES = [
    ((0.0, 0.0, 0.0), (5, 3, 1), (2, 1, 0)),
    ((0.0, 1.0, 0.0), (5, 3, 1), (2, 2, 0)),
    ((0.0, 1.49999, 0.0), (5, 3, 1), (2, 2, 0)),
]


@pytest.mark.parametrize("point,lens,expected", M2V_CASES)
def test_metric_to_voxel_space(point, lens, expected):
    offs = centered_offsets(lens, 1.0)
    coords, ok = vx.metric_to_voxel_space(
        jnp.array([point]), 1.0, jnp.array(lens), jnp.array(offs, jnp.float32)
    )
    assert bool(ok[0])
    assert tuple(np.asarray(coords[0])) == expected


# test_voxel.cpp:107-150
V2M_CASES = [
    ((2, 1, 0), (5, 3, 1), (0.0, 0.0, 0.0)),
    ((2, 2, 0), (5, 3, 1), (0.0, 1.0, 0.0)),
    ((2, 2, 1), (5, 3, 2), (0.0, 1.0, 0.5)),
]


@pytest.mark.parametrize("voxel,lens,expected", V2M_CASES)
def test_voxel_to_metric_space(voxel, lens, expected):
    offs = centered_offsets(lens, 1.0)
    pt = vx.voxel_to_metric_space(
        jnp.array([voxel]), 1.0, jnp.array(offs, jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(pt[0]), expected, atol=1e-6)


def test_linearization_roundtrip():
    lens = jnp.array([5, 3, 2])
    coords = jnp.stack(
        jnp.meshgrid(
            jnp.arange(5), jnp.arange(3), jnp.arange(2), indexing="ij"
        ),
        axis=-1,
    ).reshape(-1, 3)
    idx = vx.voxel_pos_to_index(coords, lens)
    assert len(set(np.asarray(idx).tolist())) == 30
    back = vx.index_to_voxel_pos(idx, lens)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(coords))
    # x-fastest convention (voxel.c:186): idx = z*lx*ly + y*lx + x
    assert int(vx.voxel_pos_to_index(jnp.array([1, 2, 1]), lens)) == 1 * 15 + 2 * 5 + 1


# test_voxel.cpp:152-180 — neighbor linear indices on known grids
def test_neighbor_indices():
    lens = jnp.array([5, 3, 2])
    nidx, valid = vx.neighbor_indices(jnp.array(7), lens)
    nidx, valid = np.asarray(nidx), np.asarray(valid)
    # order: X_POS, X_NEG, Y_POS, Y_NEG, Z_POS, Z_NEG
    assert valid[0] and nidx[0] == 8      # X_POS (test:172-180)
    assert valid[2] and nidx[2] == 12     # Y_POS (test:162-170)
    assert valid[4] and nidx[4] == 22     # Z_POS (test:152-160)

    # corner voxel: negative-direction neighbors out of grid
    nidx, valid = vx.neighbor_indices(jnp.array(0), lens)
    valid = np.asarray(valid)
    assert valid[0] and valid[2] and valid[4]
    assert not valid[1] and not valid[3] and not valid[5]


# test_pointclouds.cpp:5-67 semantics, incl. the all-negative cloud that the
# reference's DBL_MIN bug (pointclouds.c:44-48) gets wrong
def test_pointcloud_limits():
    pts = jnp.array(
        [[1.0, 2.0, 3.0], [-1.0, 5.0, -2.0], [0.5, -4.0, 0.0]], jnp.float32
    )
    mins, maxs = vx.pointcloud_limits(pts)
    np.testing.assert_allclose(np.asarray(mins), [-1.0, -4.0, -2.0])
    np.testing.assert_allclose(np.asarray(maxs), [1.0, 5.0, 3.0])

    neg = jnp.array([[-5.0, -6.0, -7.0], [-1.0, -2.0, -3.0]], jnp.float32)
    mins, maxs = vx.pointcloud_limits(neg)
    np.testing.assert_allclose(np.asarray(maxs), [-1.0, -2.0, -3.0])


def test_pointcloud_limits_masked():
    pts = jnp.array(
        [[0.0, 0.0, 0.0], [100.0, 100.0, 100.0], [1.0, 2.0, 3.0]], jnp.float32
    )
    mask = jnp.array([True, False, True])
    mins, maxs = vx.pointcloud_limits(pts, mask)
    np.testing.assert_allclose(np.asarray(maxs), [1.0, 2.0, 3.0])
