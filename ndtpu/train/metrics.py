"""Metrics logging: host-0-only printing + optional wandb shim.

The reference logs per-epoch loss/accuracy to wandb (train.py:154-165,
train_pointnet.py:140,182,235) and prints per-sample progress (train.py:90).
wandb is optional here (not installed in this image) behind a flag.
"""
from __future__ import annotations

import json
import sys
import time
from typing import Optional


def is_host_zero() -> bool:
    import jax

    return jax.process_index() == 0


class MetricLogger:
    def __init__(self, use_wandb: bool = False, project: str = "ndnet",
                 run_name: Optional[str] = None, config: Optional[dict] = None):
        self._wandb = None
        self._t0 = time.time()
        if use_wandb and is_host_zero():
            try:
                import wandb

                wandb.init(project=project, name=run_name, config=config or {})
                self._wandb = wandb
            except Exception as e:  # wandb absent or offline
                print(f"[metrics] wandb unavailable ({e}); logging to stdout",
                      file=sys.stderr)

    def log(self, metrics: dict, step: Optional[int] = None):
        if not is_host_zero():
            return
        payload = {k: float(v) for k, v in metrics.items()}
        if step is not None:
            payload["step"] = step
        payload["t"] = round(time.time() - self._t0, 3)
        print(json.dumps(payload), flush=True)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
