"""Utilities: profiling hooks, logging, array debug printing."""
from ndtpu.utils.profiling import profile_trace, timed  # noqa: F401
from ndtpu.utils.logging import get_logger, print_matrix  # noqa: F401
