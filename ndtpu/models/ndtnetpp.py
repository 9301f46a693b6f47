"""Multiscale NDT-Net++ with the mid-forward prune on device.

Mirrors `ndnet/models/ndtnetpp.py` with its documented bugs fixed
(SURVEY.md §2.4: dead duplicate forward :44-53, ``super().__init()`` typo
:143, 2-tuple treated as tensor :124, branch-2 feature-vector shape
mismatch). The reference's architecturally-defining move — pruning the fine
NDT state to the coarse resolution *inside* the forward pass
(ndtnetpp.py:109 → sampler.prune, a device→host→C round trip) — becomes a
pure on-device `ndt_prune` on the carried `NDTResult` pytree, so the whole
multiscale forward jits as one XLA program.
"""
from __future__ import annotations

import functools
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ndtpu.core.ndt import NDTResult, ndt_prune
from ndtpu.models.ndtnet import AdditionalFeatures, NDTNet

from ndtpu.models.norm import BatchNorm


class ResidualConnection(nn.Module):
    """Resize the number of point rows with a dense map over the points axis
    (ndtnetpp.py:8-41: Conv1d over channels=points + BN + ReLU)."""

    in_points: int
    out_points: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, in_points, F] -> [B, out_points, F]."""
        h = jnp.swapaxes(x, 1, 2)  # [B, F, in_points]
        h = nn.Dense(self.out_points, dtype=self.dtype, param_dtype=self.param_dtype)(h)
        h = BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(h)  # normalizes each output point-row over (B, F), like BN1d(:19)
        h = nn.relu(h)
        return jnp.swapaxes(h, 1, 2)  # [B, out_points, F]


class NDTNetPP(nn.Module):
    """Two-branch multiscale feature extractor (`ndnet`, ndtnetpp.py:55-134).

    __call__(points1 [B,N1,3], covs1 [B,N1,9], state1: batched NDTResult,
             points2 [B,N2,3], covs2 [B,N2,9]) ->
        (feat [B, N2, F], feat1 [B, N1, F])
    """

    point_dim: int = 3
    fine_res: int = 8160
    coarse_res: int = 4080
    feature_dim: int = 1024
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points1, covariances1, state1: NDTResult,
                 points2, covariances2, train: bool = False):
        ndtnet1 = NDTNet(
            self.point_dim, self.feature_dim,
            AdditionalFeatures.COVARIANCES, self.dtype, self.param_dtype,
        )
        ndtnet2 = NDTNet(
            self.point_dim, self.feature_dim,
            AdditionalFeatures.FEATURE_VECTOR, self.dtype, self.param_dtype,
        )
        residual = ResidualConnection(self.fine_res, self.coarse_res, self.dtype,
                                       self.param_dtype)

        # BRANCH 1: fine resolution (ndtnetpp.py:106)
        feat1, _ = ndtnet1(points1, covariances1, train=train)  # [B, N1, F]

        # on-device prune of the fine NDT state to the coarse count (:109)
        prune = functools.partial(ndt_prune, n_out=self.coarse_res)
        down1, downcov1, _, _ = jax.vmap(prune)(state1)
        down1 = down1.astype(self.dtype)
        downcov1 = downcov1.astype(self.dtype)

        # reduce feature rows fine -> coarse (:114) and re-extract (:116-119)
        feat1_ = residual(feat1, train)  # [B, N2, F]
        feat1_, _ = ndtnet2(down1, downcov1, features=feat1_, train=train)

        # BRANCH 2: coarse resolution (:124). The reference passes no feature
        # vector to a FEATURE_VECTOR-typed net (a shape bug); the minimal
        # consistent completion is a zero feature block.
        zeros = jnp.zeros(
            points2.shape[:2] + (self.feature_dim,), self.dtype
        )
        feat2, _ = ndtnet2(points2, covariances2, features=zeros, train=train)

        # MERGE (:129-132)
        feat = feat1_ + feat2
        feat = BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(nn.Dense(self.feature_dim, dtype=self.dtype, param_dtype=self.param_dtype)(feat))
        return feat, feat1


class NDTNetPPClassification(nn.Module):
    """ndtnetpp.py:136-178 (with the __init typo fixed). [B, num_classes]."""

    point_dim: int = 3
    num_classes: int = 512
    fine_res: int = 8160
    coarse_res: int = 4080
    feature_dim: int = 1024
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points1, covariances1, state1, points2, covariances2,
                 train: bool = False, return_logits: bool = False):
        x, _ = NDTNetPP(
            self.point_dim, self.fine_res, self.coarse_res,
            self.feature_dim, self.dtype, self.param_dtype,
        )(points1, covariances1, state1, points2, covariances2, train)
        x = jnp.max(x, axis=1)  # :168
        x = nn.relu(nn.Dense(512, dtype=self.dtype, param_dtype=self.param_dtype)(x))
        x = nn.relu(nn.Dense(256, dtype=self.dtype, param_dtype=self.param_dtype)(x))
        x = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        if return_logits:
            return x
        return nn.softmax(x, axis=-1)  # :176


class NDTNetPPSegmentation(nn.Module):
    """ndtnetpp.py:180-240. Output [B, N1, num_classes+1] probabilities
    (the reference's multiscale seg head uses plain softmax, :236)."""

    point_dim: int = 3
    num_classes: int = 16
    fine_res: int = 8160
    coarse_res: int = 4080
    feature_dim: int = 1024
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points1, covariances1, state1, points2, covariances2,
                 train: bool = False, return_logits: bool = False):
        norm = lambda: BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        x, x1 = NDTNetPP(
            self.point_dim, self.fine_res, self.coarse_res,
            self.feature_dim, self.dtype, self.param_dtype,
        )(points1, covariances1, state1, points2, covariances2, train)

        # upsample coarse features back to the fine resolution (:225)
        x = ResidualConnection(self.coarse_res, self.fine_res, self.dtype,
                               self.param_dtype)(
            x, train
        )
        x = x + x1  # :228

        x = nn.relu(norm()(nn.Dense(512, dtype=self.dtype, param_dtype=self.param_dtype)(x)))
        x = nn.relu(norm()(nn.Dense(256, dtype=self.dtype, param_dtype=self.param_dtype)(x)))
        x = nn.relu(norm()(nn.Dense(128, dtype=self.dtype, param_dtype=self.param_dtype)(x)))
        x = nn.Dense(self.num_classes + 1, dtype=self.dtype, param_dtype=self.param_dtype)(x)
        if return_logits:
            return x
        return nn.softmax(x, axis=-1)  # :236
