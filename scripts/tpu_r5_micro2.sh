#!/bin/bash
# Round-5 session 2: payload-sort operand costs, KL-stage decomposition
# (VERDICT r5 item 5), multiscale/giant re-bench on the r5 tree (item 3),
# and the canonical driver-entry compile (item 6).
# Serialized, background-to-completion, real readbacks (CLAUDE.md).
set -u
LOG=${1:-tpu_r5_micro2.log}
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 $(date -u) ===" | tee -a "$LOG"; }

stamp "sort micro: [16, 70000] 1 key + 3 payload"
python scripts/kernel_micro.py --mode sort4 --n 70000 >> "$LOG" 2>&1

stamp "sort micro: [16, 70000] 1 key + 4 payload"
python scripts/kernel_micro.py --mode sort5 --n 70000 >> "$LOG" 2>&1

for m in kl_full kl_sorts kl_evals kl_gathers kl_scatter kl_payload; do
  stamp "kl micro: $m (K=1208, B=16)"
  python scripts/kernel_micro.py --mode $m >> "$LOG" 2>&1
done

stamp "multiscale re-bench (search=fast, r5 tree)"
python bench.py --multiscale --skip_cpu_baseline >> "$LOG" 2>&1

stamp "multiscale re-bench (search=probe)"
python bench.py --multiscale --search probe --skip_cpu_baseline >> "$LOG" 2>&1

stamp "giant point-sharded re-bench (r5 tree)"
python bench.py --giant --skip_cpu_baseline >> "$LOG" 2>&1

stamp "canonical driver entry compile (NDTPU_ENTRY_CANONICAL=1)"
NDTPU_ENTRY_CANONICAL=1 python __graft_entry__.py >> "$LOG" 2>&1

stamp "ALL DONE (r5 micro2)"
