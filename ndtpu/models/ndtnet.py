"""NDT-Net: PointNet on 12-D points (mean ⊕ flattened covariance).

Mirrors `ndnet/models/ndtnet.py:65-243`. The input transform applies the
regressed 3x3 to the means *and* rotates each covariance as t·Σ
(ndtnet.py:138-143 — the reference deliberately applies t on the left only,
not t·Σ·tᵀ; replicated as-is). ``AdditionalFeatures`` mirrors
ndtnet.py:70-98; for FEATURE_VECTOR the extra feature block rides along
untransformed (the reference's own view() of 1033 dims as 3x3 is one of its
documented bugs — SURVEY.md §2.4 — so the intent, rotate-the-9-covariance-
dims-only, is implemented).
"""
from __future__ import annotations

import enum

import flax.linen as nn
import jax.numpy as jnp

from ndtpu.models.tnet import TNet

from ndtpu.models.norm import BatchNorm


class AdditionalFeatures(enum.Enum):
    NONE = "none"
    COVARIANCES = "covariances"
    FEATURE_VECTOR = "feature_vector"


class NDTNet(nn.Module):
    """Backbone: (points [B,N,3], covs [B,N,9][, features]) ->
    (features [B, N, feature_dim], x_t2 [B, N, 64])."""

    point_dim: int = 3
    feature_dim: int = 768
    extra_type: AdditionalFeatures = AdditionalFeatures.COVARIANCES
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, covariances=None, features=None,
                 train: bool = False):
        norm = lambda: BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        b, n, d = points.shape

        # input transform on the means (ndtnet.py:133-136)
        t = TNet(in_dim=self.point_dim, dtype=self.dtype, param_dtype=self.param_dtype)(points, train)
        p = jnp.einsum("bij,bnj->bni", t, points)

        parts = [p]
        if self.extra_type != AdditionalFeatures.NONE:
            # rotate covariances: t · Σ per point (ndtnet.py:138-143)
            cov = covariances.reshape(b, n, 3, 3)
            cov = jnp.einsum("bij,bnjk->bnik", t, cov).reshape(b, n, 9)
            parts.append(cov)
        if self.extra_type == AdditionalFeatures.FEATURE_VECTOR:
            parts.append(features)
        x = jnp.concatenate(parts, axis=-1)  # [B, N, 3(+9)(+F)]

        x = norm()(nn.Dense(64, dtype=self.dtype, param_dtype=self.param_dtype)(x))  # ndtnet.py:149, no ReLU

        # feature transform (ndtnet.py:152-155)
        t2 = TNet(in_dim=64, dtype=self.dtype, param_dtype=self.param_dtype)(x, train)
        x = jnp.einsum("bnj,bji->bni", x, t2)
        x_t2 = x

        x = norm()(nn.Dense(128, dtype=self.dtype, param_dtype=self.param_dtype)(x))             # :160
        x = norm()(nn.Dense(self.feature_dim, dtype=self.dtype, param_dtype=self.param_dtype)(x))  # :161
        return x, x_t2


class NDTNetClassification(nn.Module):
    """ndtnet.py:166-196. Output [B, num_classes]."""

    point_dim: int = 3
    num_classes: int = 512
    feature_dim: int = 768
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, covariances, train: bool = False,
                 return_logits: bool = False):
        x, _ = NDTNet(
            self.point_dim, self.feature_dim, dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(points, covariances, train=train)
        x = jnp.max(x, axis=1)  # :186
        x = nn.relu(nn.Dense(512, dtype=self.dtype, param_dtype=self.param_dtype)(x))
        x = nn.relu(nn.Dense(256, dtype=self.dtype, param_dtype=self.param_dtype)(x))
        x = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        if return_logits:
            return x
        return nn.softmax(x, axis=-1)  # :194


class NDTNetSegmentation(nn.Module):
    """ndtnet.py:198-243. Output [B, N, num_classes+1] log-probs."""

    point_dim: int = 3
    num_classes: int = 16
    feature_dim: int = 1024
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, covariances, train: bool = False,
                 return_logits: bool = False):
        norm = lambda: BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        x, x_t2 = NDTNet(
            self.point_dim, self.feature_dim, dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(points, covariances, train=train)
        pooled = jnp.max(x, axis=1, keepdims=True)       # :224
        pooled = jnp.broadcast_to(
            pooled, (x.shape[0], x.shape[1], x.shape[2])
        )                                                # :227
        x = jnp.concatenate([x_t2, pooled], axis=-1)     # :230 (feat+64)
        x = nn.relu(norm()(nn.Dense(512, dtype=self.dtype, param_dtype=self.param_dtype)(x)))
        x = nn.relu(norm()(nn.Dense(256, dtype=self.dtype, param_dtype=self.param_dtype)(x)))
        x = nn.relu(norm()(nn.Dense(128, dtype=self.dtype, param_dtype=self.param_dtype)(x)))
        x = nn.Dense(self.num_classes + 1, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        if return_logits:
            return x
        return nn.log_softmax(x, axis=-1)  # :239
