"""ndtpu — TPU-native NDT-Net.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
carlostojal/NDT-Net (reference mounted at /root/reference): NDT-based
point-cloud downsampling (per-voxel Gaussian estimation + KL-divergence
pruning) feeding PointNet-style backbones with classification and
segmentation heads, plus multiscale NDT-Net++.

Design stance (vs. the reference's C/pthreads/GSL + PyTorch stack):
- the entire NDT sampler is a pure, jittable, vmappable function of
  fixed-shape arrays (no dense voxel grids, no per-voxel locks);
- per-voxel Gaussian moments are associative segment reductions
  (sorting + segment-sum / scatter-as-matmul on the MXU);
- KL divergences use closed-form analytic 3x3 determinants/inverses
  (no LU decomposition);
- the sequential "remove lowest-KL one at a time, skip already-removed"
  prune loop is proven equivalent to a per-segment min-KL ranking and
  is fully vectorized;
- multi-chip scaling is expressed with jax.sharding Mesh + jit
  (batch-sharded) and shard_map (point-sharded moment psum).
"""

__version__ = "0.1.0"

from ndtpu.core.ndt import NDTResult, NDTSampler, ndt_downsample, ndt_prune  # noqa: F401
