"""Profiling hooks.

The reference's only instrumentation is wall-clock deltas around
downsample/prune (tools/viz.py:100-107,119-129). This adds the TPU-native
equivalents SURVEY.md §5 calls for: jax.profiler trace capture and a
block_until_ready-aware timer.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/ndtpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "", sync=None):
    """Wall-clock timer that blocks on `sync` before stopping the clock, so
    async dispatch doesn't lie. `sync` may be an array/pytree, or a
    zero-arg callable resolved at exit (for values produced inside the
    block). On the tunneled TPU backend block_until_ready itself returns
    early (CLAUDE.md) — there, prefer a scalar float() readback as the
    last statement of the block; this timer is exact on CPU/GPU/real-TPU."""
    import jax

    t0 = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        target = sync() if callable(sync) else sync
        if target is not None:
            jax.block_until_ready(target)
        box["seconds"] = time.perf_counter() - t0
        if label:
            print(f"[timed] {label}: {box['seconds']:.4f}s "
                  f"({1.0 / box['seconds']:.2f} Hz)")
