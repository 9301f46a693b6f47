"""Custom ops: farthest point sampling, Pallas kernels."""
from ndtpu.ops.fps import farthest_point_sampling  # noqa: F401
