#!/bin/bash
# Serialized TPU measurement suite — one client at a time, each run ends
# with real readbacks (see CLAUDE.md: concurrent clients or abandoned
# in-flight work wedge the tunnel).
set -u
OUT=${1:-/tmp/tpu_measure}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "=== canonical (fast search, 2-key sort) ===" | tee "$OUT/canonical.log"
python bench.py --iters 3 --inner 4 --skip_cpu_baseline >> "$OUT/canonical.log" 2>&1
tail -2 "$OUT/canonical.log"

echo "=== streaming ===" | tee "$OUT/streaming.log"
python bench.py --streaming --iters 3 --inner 4 --skip_cpu_baseline >> "$OUT/streaming.log" 2>&1
tail -2 "$OUT/streaming.log"

echo "=== stress 90k->24 ===" | tee "$OUT/stress.log"
python bench.py --stress >> "$OUT/stress.log" 2>&1
tail -2 "$OUT/stress.log"

echo "=== entry compile check ===" | tee "$OUT/entry.log"
python - >> "$OUT/entry.log" 2>&1 <<'EOF'
import jax, numpy as np
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn)(*args)
print("entry ok:", out.shape, float(np.asarray(out).sum()))
EOF
tail -1 "$OUT/entry.log"

echo "ALL DONE"
