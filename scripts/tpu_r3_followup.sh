#!/bin/bash
# Follow-up TPU measurements: the main r3 suite's canonical-f32 run
# predates the tag-column optimization (segment starts via the moment
# kernel instead of top_k over N); re-measure it on the new tree for a
# direct A/B, plus the per-stage build split and the cost of the removed
# top_k pass. Serialized, one client at a time, each run ends with a
# real readback (CLAUDE.md).
set -u
LOG=${1:-tpu_r3_batch4.log}
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 $(date -u) ===" | tee -a "$LOG"; }

stamp "canonical f32 (tag-column tree)"
python bench.py --skip_cpu_baseline >> "$LOG" 2>&1

stamp "topk micro (the removed pass, standalone)"
python - >> "$LOG" 2>&1 <<'EOF'
import functools, time, sys
import numpy as np, jax, jax.numpy as jnp
from bench import measure_rtt
rtt = measure_rtt()
x = jnp.asarray(np.random.default_rng(0).integers(0, 70000, size=(16, 70000)).astype(np.int32))

@functools.partial(jax.jit, static_argnames=("inner",))
def rep(a, inner: int):
    def body(c, _):
        out = -jax.lax.top_k(-(a + c), 2504)[0]
        return jnp.sum(out), None
    tot, _ = jax.lax.scan(body, jnp.int32(0), None, length=inner)
    return tot

inner, iters = 32, 3
float(rep(x, inner))
t0 = time.perf_counter()
for _ in range(iters):
    float(rep(x, inner))
dt = (time.perf_counter() - t0) / iters / inner - rtt / inner
print(f"[micro] top_k([16,70000] i32, k=2504): {dt*1000:.2f} ms", file=sys.stderr)
import json; print(json.dumps({"metric": "topk_16x70000_k2504_ms", "value": round(dt*1000, 2)}))
EOF

stamp "stage_timing"
python scripts/stage_timing.py --use_pallas >> "$LOG" 2>&1

stamp "roofline (RTT-corrected sort micro numbers)"
python bench.py --roofline --skip_cpu_baseline >> "$LOG" 2>&1

stamp "ALL DONE"
