"""Compiled-HLO collective-communication accounting.

BASELINE.md's scaling-efficiency claim rests on communication volumes;
estimating them is not good enough (VERDICT r2 missing #3). These helpers
lower+compile a jitted function with its real input shardings and extract
every collective op (all-reduce / all-gather / reduce-scatter /
collective-permute / all-to-all) with its byte volume straight from the
optimized HLO text — what XLA will actually put on the interconnect.

Note: ops inside a `while` body appear once in the text but execute once
per loop iteration — callers report per-iteration volumes for loops (the
voxel-size search) and per-step volumes for straight-line code.
"""
from __future__ import annotations

import re
from typing import Dict

_COLLECTIVE_RE = re.compile(
    r"= (\([^)]*\)|\S+) (all-reduce|all-gather|reduce-scatter|"
    r"collective-permute|all-to-all)(?:-start)?\("
)
_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|s32|u32|s8|u8|pred)\[([0-9,]*)\]")
_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1}


def shape_bytes(shape_text: str) -> int:
    """Total bytes of an HLO shape string (tuples summed)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_text):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def parse_collectives(hlo_text: str) -> Dict[str, Dict[str, object]]:
    """{op: {"count": N, "bytes": total, "shapes": [bytes,...]}} over the
    optimized HLO module text."""
    out: Dict[str, Dict[str, object]] = {}
    for m in _COLLECTIVE_RE.finditer(hlo_text):
        shape, op = m.groups()
        b = shape_bytes(shape)
        d = out.setdefault(op, {"count": 0, "bytes": 0, "shapes": []})
        d["count"] += 1
        d["bytes"] += b
        d["shapes"].append(b)
    return out


def jit_collectives(jitted_fn, *args, **kwargs):
    """Compile `jitted_fn` for the given (sharded) args and return the
    collective summary of the optimized module."""
    compiled = jitted_fn.lower(*args, **kwargs).compile()
    return parse_collectives(compiled.as_text())
