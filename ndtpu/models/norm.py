"""BatchNorm with the torch reference's running-statistics semantics.

The reference models use torch `nn.BatchNorm1d` throughout
(ndnet/models/pointnet.py, ndtnet.py, ndtnetpp.py). Two conventions differ
from `flax.linen.BatchNorm` and matter for accuracy parity after training:

  1. torch updates `running_var` with the UNBIASED batch variance
     (Bessel's n/(n-1)) while normalizing the batch itself with the biased
     one. For the TNet FC BatchNorms the reduction count is just the batch
     size (e.g. 8), so flax's biased running var sits ~12% low — a
     systematic train/eval skew vs. the reference.
  2. torch's `momentum=0.1` means `running = 0.9*running + 0.1*batch`;
     this module's `momentum` is the decay (0.9), matching that.

The class is deliberately named `BatchNorm` so flax auto-naming yields the
same `BatchNorm_N` parameter paths as before — torch-checkpoint migration
(ndtpu.interop) and existing ndtpu checkpoints stay compatible
(params: scale/bias; batch_stats: mean/var).

Cross-replica behavior: batch statistics are plain `jnp.mean` over the
leading axes, so under pjit/GSPMD with a batch-sharded input XLA computes
the GLOBAL batch statistics (collectives inserted automatically) — the
cross-replica BN that SURVEY.md §7 calls for, with no axis_name plumbing.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BatchNorm(nn.Module):
    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        # statistics are computed at least in f32; under x64 (f64 inputs)
        # they stay f64 so cross-device reductions carry f64 precision
        # (the multi-host lr>0 equality test depends on this)
        sdt = jnp.promote_types(x.dtype, jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), self.param_dtype)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), self.param_dtype)
        )
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          self.param_dtype)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(sdt)
            mean = jnp.mean(xf, axes)
            # biased variance normalizes the batch (torch does the same).
            # Two-pass form E[(x-μ)²], NOT E[x²]-E[x]²: the one-pass form
            # cancels catastrophically in f32 for activations with
            # |mean| >> std. The clamp is still REQUIRED: XLA's algebraic
            # simplifier may reassociate the reduction (especially in the
            # grad program), reintroducing enough cancellation to push a
            # near-zero variance below -eps — rsqrt then NaNs the backward
            # while the forward stays finite (observed on the transplanted
            # parity run; flax BatchNorm clamps for the same reason).
            var = jnp.maximum(jnp.mean(jnp.square(xf - mean), axes), 0.0)
            if not self.is_initializing():
                n = int(np.prod([x.shape[a] for a in axes]))
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (
                    m * ra_mean.value + (1.0 - m) * mean
                ).astype(self.param_dtype)
                ra_var.value = (
                    m * ra_var.value + (1.0 - m) * unbiased
                ).astype(self.param_dtype)

        # divide by sqrt rather than multiply by lax.rsqrt: the rsqrt
        # backward miscompiles in this composition on the CPU backend
        # (finite forward, NaN cotangents in ~20 feature columns of the
        # preceding Dense kernel, eager grads fine — reproduced and
        # bisected on the transplanted parity config). sqrt+divide is
        # numerically equivalent and XLA lowers it efficiently on TPU.
        y = (x.astype(sdt) - mean) / jnp.sqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)
