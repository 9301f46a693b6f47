"""Farthest point sampling in JAX.

The reference outsources FPS to Open3D on the host
(`ndnet/datasets/CARLA_NDT_Seg.py:146`). This is the on-device equivalent:
a `lax.scan` of n_samples argmax steps over the running min-distance field —
each step is one fused [N] VPU pass, so the whole thing stays on device and
vmaps over batches.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_samples",))
def farthest_point_sampling(points, n_samples: int, mask=None, start: int = 0):
    """Select n_samples indices by iterative farthest-point criterion.

    Args:
      points: [N, 3]. mask: optional [N] bool (invalid rows never selected).
      start: index of the seed point (Open3D seeds with index 0 as well).

    Returns indices [n_samples] int32.
    """
    n = points.shape[0]
    big = jnp.asarray(jnp.finfo(points.dtype).max, points.dtype)
    if mask is None:
        min_d = jnp.full((n,), big, points.dtype)
    else:
        min_d = jnp.where(mask, big, -big)

    def body(carry, _):
        min_d, last = carry
        d = jnp.sum((points - points[last]) ** 2, axis=-1)
        if mask is not None:
            d = jnp.where(mask, d, -big)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d).astype(jnp.int32)
        return (min_d, nxt), nxt

    seed = jnp.asarray(start, jnp.int32)
    (_, _), idxs = jax.lax.scan(body, (min_d, seed), None, length=n_samples - 1)
    return jnp.concatenate([seed[None], idxs])
