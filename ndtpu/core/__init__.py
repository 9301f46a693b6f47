"""Core NDT sampler: voxel math, Gaussian moments, KL divergence, pipeline."""
