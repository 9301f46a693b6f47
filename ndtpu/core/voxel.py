"""Voxel-space math, fully vectorized in JAX.

Semantics mirror the reference C core (`core_legacy/src/voxel.c`), which is
the authoritative implementation (the Python twin at
`ndnet/preprocessing/core/voxel.py:44-68` has a known volume/n sizing bug;
the C geometric-mean formula at `voxel.c:42-43` is the spec):

- grid sizing:      ``estimate_voxel_grid``   (voxel.c:61-81)
- sizing heuristic: ``estimate_voxel_size``   (voxel.c:28-59)
- metric→voxel:     ``metric_to_voxel_space`` (voxel.c:83-103)
- voxel→metric:     ``voxel_to_metric_space`` (voxel.c:105-114, voxel centers)
- linearization:    ``voxel_pos_to_index`` / ``index_to_voxel_pos``
                    (voxel.c:177-203, x-fastest: idx = z*lx*ly + y*lx + x)
- neighbors:        ``get_neighbor_index``    (voxel.c:116-175, 6-connected)

Everything operates on arrays of points/indices at once; scalar semantics of
the reference (bounds checks returning error codes) become masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 6-connected neighborhood, same order as the reference's `enum direction_t`
# (core_legacy/include/ndnet_core/voxel.h: X_POS, X_NEG, Y_POS, Y_NEG,
#  Z_POS, Z_NEG). Kept as a NumPy constant: eagerly-committed jax arrays
# captured as jit constants trigger pathological compile-time transfers on
# some multi-device configs.
NEIGHBOR_OFFSETS = np.array(
    [
        [1, 0, 0],
        [-1, 0, 0],
        [0, 1, 0],
        [0, -1, 0],
        [0, 0, 1],
        [0, 0, -1],
    ],
    dtype=np.int32,
)
DIRECTION_LEN = 6


def estimate_voxel_size(n_desired_voxels, mins, maxs):
    """Geometric-mean voxel sizing (voxel.c:28-59).

    size = exp((log dx + log dy + log dz - log n) / 3), i.e. the cube root
    of volume / n. Returns (voxel_size, lens[3], offsets[3]).
    """
    dims = maxs - mins
    log_size = (jnp.sum(jnp.log(dims)) - jnp.log(n_desired_voxels)) / 3.0
    size = jnp.exp(log_size)
    lens = jnp.ceil(dims / size).astype(jnp.int32)
    return size, lens, mins


def estimate_voxel_grid(mins, maxs, voxel_size):
    """Grid dims + offsets for a given voxel size (voxel.c:61-81).

    lens = ceil((max-min)/size) per axis (clamped to >= 1 so degenerate
    axes still form a grid), offset = min corner.
    """
    dims = maxs - mins
    lens = jnp.maximum(jnp.ceil(dims / voxel_size), 1.0).astype(jnp.int32)
    return lens, mins


def metric_to_voxel_space(points, voxel_size, lens, offsets):
    """Map points [..., 3] to integer voxel coords (voxel.c:83-103).

    Returns (coords [..., 3] int32, in_bounds [...] bool). Out-of-grid
    points (the reference errors on them) are reported via the mask;
    coords are clamped into the grid so downstream gathers stay safe.
    """
    raw = jnp.floor((points - offsets) / voxel_size).astype(jnp.int32)
    in_bounds = jnp.all((raw >= 0) & (raw < lens), axis=-1)
    coords = jnp.clip(raw, 0, lens - 1)
    return coords, in_bounds


def voxel_to_metric_space(coords, voxel_size, offsets):
    """Voxel coords [..., 3] to voxel-center points (voxel.c:105-114)."""
    return (coords.astype(jnp.float32) + 0.5) * voxel_size + offsets


def metric_to_voxel_axis(p, voxel_size, length, offset):
    """Per-axis metric→voxel coordinate — the structure-of-arrays form of
    `metric_to_voxel_space` (voxel.c:83-103 semantics: floor + clamp into
    the grid). The single source for the hot paths, which keep coordinates
    as compact 1-D component vectors (see ndt._voxel_keys)."""
    raw = jnp.floor((p - offset) / voxel_size).astype(jnp.int32)
    return jnp.clip(raw, 0, length - 1)


def voxel_to_metric_axis(c, voxel_size, offset):
    """Per-axis voxel-center — the SoA form of `voxel_to_metric_space`
    (voxel.c:105-114)."""
    return (c.astype(jnp.float32) + 0.5) * voxel_size + offset


def voxel_pos_to_index(coords, lens):
    """Linearize voxel coords, x-fastest (voxel.c:177-189):
    idx = z*lx*ly + y*lx + x.

    int32 range limits this to grids under 2^31 voxels; the NDT pipeline
    (core/ndt.py) sorts on this same packed key and keeps grids inside the
    int32 envelope by clamping the voxel size (ndt._min_packable_voxel_size).
    """
    lx, ly = lens[0], lens[1]
    return (
        coords[..., 2].astype(jnp.int32) * (lx * ly)
        + coords[..., 1].astype(jnp.int32) * lx
        + coords[..., 0].astype(jnp.int32)
    )


def index_to_voxel_pos(index, lens):
    """Inverse linearization (voxel.c:191-203). Returns [..., 3] int32."""
    lx, ly = lens[0], lens[1]
    z = index // (lx * ly)
    y = (index % (lx * ly)) // lx
    x = index % lx
    return jnp.stack([x, y, z], axis=-1)


def neighbor_indices(index, lens):
    """All 6 neighbor linear indices of `index` (voxel.c:116-175).

    Works on arrays: index [...] -> (neighbor_idx [..., 6] int32,
    valid [..., 6] bool). Out-of-grid neighbors are masked invalid
    (the reference's -4 return code) with index clamped in-grid.
    """
    pos = index_to_voxel_pos(index, lens)  # [..., 3]
    npos = pos[..., None, :] + NEIGHBOR_OFFSETS  # [..., 6, 3]
    valid = jnp.all((npos >= 0) & (npos < lens), axis=-1)  # [..., 6]
    npos = jnp.clip(npos, 0, lens - 1)
    nidx = voxel_pos_to_index(npos, lens)
    return nidx, valid


def pointcloud_limits(points, mask=None):
    """Per-axis min/max of a (masked) cloud.

    Replaces `get_pointcloud_limits` (pointclouds.c:40-66) and fixes its
    DBL_MIN bug: correct limits for all-negative clouds. Invalid rows
    (mask False) are ignored.
    """
    if mask is None:
        return jnp.min(points, axis=0), jnp.max(points, axis=0)
    big = jnp.asarray(jnp.finfo(points.dtype).max, points.dtype)
    m = mask[:, None]
    mins = jnp.min(jnp.where(m, points, big), axis=0)
    maxs = jnp.max(jnp.where(m, points, -big), axis=0)
    return mins, maxs
