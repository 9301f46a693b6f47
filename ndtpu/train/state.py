"""Train state and checkpointing.

The reference saves bare `model.state_dict()` every N epochs and never
restores optimizer state or the epoch counter (tools/train.py:186-194;
load only in seg_viz.py:107). This is the strict superset SURVEY.md §5
calls for: params + batch_stats + opt_state + step, with restore, via
Orbax (msgpack fallback via flax.serialization if Orbax is unavailable).
"""
from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=params,
            opt_state=opt_state,
            batch_stats=(
                self.batch_stats if new_batch_stats is None else new_batch_stats
            ),
        )


def create_train_state(model, tx, rng, *example_inputs, init_kwargs=None):
    variables = model.init(rng, *example_inputs, **(init_kwargs or {}))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict({}))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def _ckpt_tree(state: TrainState):
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_checkpoint(state: TrainState, path: str):
    """Write params+batch_stats+opt_state+step to `path` (a directory)."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, _ckpt_tree(state), force=True)
    except Exception:
        from flax import serialization

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(_ckpt_tree(state)))
    return path


def restore_checkpoint(state: TrainState, path: str) -> TrainState:
    """Restore into an existing (template) TrainState."""
    path = os.path.abspath(path)
    template = _ckpt_tree(state)
    msgpack = os.path.join(path, "state.msgpack")
    if os.path.exists(msgpack):
        from flax import serialization

        with open(msgpack, "rb") as f:
            tree = serialization.from_bytes(template, f.read())
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        tree = ckptr.restore(path, item=template)
    return state.replace(
        step=jnp.asarray(tree["step"]),
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
    )
