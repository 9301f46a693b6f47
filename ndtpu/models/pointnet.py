"""PointNet backbone + heads (the FPS baseline family).

Mirrors `ndnet/models/pointnet.py:65-214`. Faithful quirks kept on purpose:
- the backbone MLP applies BatchNorm *without* ReLU (pointnet.py:120,131-132);
- the classification head ends in softmax (:165), segmentation in
  log_softmax (:210) — set ``return_logits=True`` for a numerically sane
  training loss (the reference feeds probabilities to cross_entropy, a
  known bug; SURVEY.md §2.4).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ndtpu.models.tnet import TNet

from ndtpu.models.norm import BatchNorm


class PointNet(nn.Module):
    """Backbone: returns (features [B, N, feature_dim], x_t2 [B, N, 64])."""

    point_dim: int = 3
    feature_dim: int = 768
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        # input transform (pointnet.py:114-117)
        t = TNet(in_dim=self.point_dim, dtype=self.dtype, param_dtype=self.param_dtype)(x, train)
        x = jnp.einsum("bij,bnj->bni", t, x)
        x = jnp.nan_to_num(x)

        x = norm()(nn.Dense(64, dtype=self.dtype, param_dtype=self.param_dtype)(x))      # :120, no ReLU

        # feature transform (pointnet.py:123-126)
        t2 = TNet(in_dim=64, dtype=self.dtype, param_dtype=self.param_dtype)(x, train)
        x = jnp.einsum("bnj,bji->bni", x, t2)
        x_t2 = x

        x = norm()(nn.Dense(128, dtype=self.dtype, param_dtype=self.param_dtype)(x))     # :131, no ReLU
        x = norm()(nn.Dense(self.feature_dim, dtype=self.dtype, param_dtype=self.param_dtype)(x))  # :132
        return x, x_t2


class PointNetClassification(nn.Module):
    """pointnet.py:137-167. Output [B, num_classes]."""

    point_dim: int = 3
    num_classes: int = 512
    feature_dim: int = 768
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool = False, return_logits: bool = False):
        x, _ = PointNet(self.point_dim, self.feature_dim, self.dtype,
                 self.param_dtype)(
            points, train
        )
        x = jnp.max(x, axis=1)  # global max-pool (:157)
        x = nn.relu(nn.Dense(512, dtype=self.dtype, param_dtype=self.param_dtype)(x))
        x = nn.relu(nn.Dense(256, dtype=self.dtype, param_dtype=self.param_dtype)(x))
        x = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        if return_logits:
            return x
        return nn.softmax(x, axis=-1)  # :165


class PointNetSegmentation(nn.Module):
    """pointnet.py:169-214. Output [B, N, num_classes+1] log-probs."""

    point_dim: int = 3
    num_classes: int = 16
    feature_dim: int = 768
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, train: bool = False, return_logits: bool = False):
        norm = lambda: BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        x, x_t2 = PointNet(self.point_dim, self.feature_dim, self.dtype,
                 self.param_dtype)(
            points, train
        )
        pooled = jnp.max(x, axis=1, keepdims=True)            # :195
        pooled = jnp.broadcast_to(
            pooled, (x.shape[0], x.shape[1], x.shape[2])
        )                                                      # :198
        x = jnp.concatenate([x_t2, pooled], axis=-1)           # :201
        x = nn.relu(norm()(nn.Dense(512, dtype=self.dtype, param_dtype=self.param_dtype)(x)))
        x = nn.relu(norm()(nn.Dense(256, dtype=self.dtype, param_dtype=self.param_dtype)(x)))
        x = nn.relu(norm()(nn.Dense(128, dtype=self.dtype, param_dtype=self.param_dtype)(x)))
        x = nn.Dense(self.num_classes + 1, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        if return_logits:
            return x
        return nn.log_softmax(x, axis=-1)  # :210
