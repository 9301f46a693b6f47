"""Single source of truth for "are we compiling for TPU?".

Used by the Pallas kernels (compile with Mosaic vs interpret), the
use_pallas=auto resolution in trainers, and bench.py — these must agree,
or an auto-enabled kernel could silently run interpreted.
"""
from __future__ import annotations


def is_tpu() -> bool:
    import jax

    return jax.default_backend() == "tpu"
