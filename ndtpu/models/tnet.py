"""T-Net: the PointNet spatial/feature transform regressor.

Mirrors the torch reference (`ndnet/models/pointnet.py:7-62`, identical copy
in `ndnet/models/ndtnet.py:7-62`): three 1x1 convs (64, 128, 1024) with
BN+ReLU, global max-pool over points, FCs 512 → 256 → in_dim², plus the
identity matrix. Layout here is channels-last; convs become Dense.
"""
from __future__ import annotations

import flax.linen as nn

import jax.numpy as jnp

from ndtpu.models.norm import BatchNorm


class TNet(nn.Module):
    in_dim: int = 64
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, N, in_dim] -> transform [B, in_dim, in_dim]."""
        norm = lambda: BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        dense = lambda f: nn.Dense(f, dtype=self.dtype, param_dtype=self.param_dtype)  # noqa: E731

        h = nn.relu(norm()(dense(64)(x)))          # pointnet.py:45
        h = nn.relu(norm()(dense(128)(h)))         # pointnet.py:46
        h = nn.relu(norm()(dense(1024)(h)))        # pointnet.py:47
        h = jnp.max(h, axis=1)                     # pointnet.py:50, [B, 1024]
        h = nn.relu(norm()(dense(512)(h)))         # pointnet.py:54
        h = nn.relu(norm()(dense(256)(h)))         # pointnet.py:55
        h = dense(self.in_dim * self.in_dim)(h)    # pointnet.py:56
        eye = jnp.eye(self.in_dim, dtype=h.dtype).reshape(-1)
        h = h + eye                                # pointnet.py:59
        return h.reshape(-1, self.in_dim, self.in_dim)
