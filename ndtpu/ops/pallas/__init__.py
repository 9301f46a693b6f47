"""Pallas TPU kernels."""
from ndtpu.ops.pallas.segment_moments import segment_sum_sorted  # noqa: F401
