#!/bin/bash
# Round-5 FINAL quiet-host TPU measurement suite, reordered so the
# headline rows land first (giant — the longest program — last).
# The r5 tree = probe-seeded cold search + payload-mode KL + secant
# point-sharded search, measured with no concurrent CPU jobs.
# Directly comparable to the r4 final rows (RTT-corrected protocol).
# Serialized: one TPU client at a time; real readbacks (CLAUDE.md).
set -u
LOG=${1:-tpu_r5_final.log}
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 $(date -u) ===" | tee -a "$LOG"; }

stamp "canonical f32 (r5 tree, search=probe default)"
python bench.py --skip_cpu_baseline >> "$LOG" 2>&1

stamp "canonical driver entry (probe, compile-cached from the bench row)"
NDTPU_ENTRY_CANONICAL=1 python __graft_entry__.py >> "$LOG" 2>&1

stamp "canonical, search=fast (quiet A/B reference)"
python bench.py --search fast --skip_cpu_baseline >> "$LOG" 2>&1

stamp "streaming"
python bench.py --streaming --skip_cpu_baseline >> "$LOG" 2>&1

stamp "warm-start"
python bench.py --warm_start --skip_cpu_baseline >> "$LOG" 2>&1

stamp "training step (searched probe, int GT)"
python bench.py --train --skip_cpu_baseline >> "$LOG" 2>&1

stamp "training step (streaming, int GT)"
python bench.py --train --streaming --skip_cpu_baseline >> "$LOG" 2>&1

stamp "multiscale (search=probe default)"
python bench.py --multiscale --skip_cpu_baseline >> "$LOG" 2>&1

stamp "stress 90k->24 (viz.py Hz protocol)"
python bench.py --stress --skip_cpu_baseline >> "$LOG" 2>&1

stamp "stage split (tagged path, fast-search protocol — r3/r4 comparable)"
python scripts/stage_timing.py --use_pallas >> "$LOG" 2>&1

stamp "component split (search / preprocess / model)"
python bench.py --components --skip_cpu_baseline >> "$LOG" 2>&1

stamp "giant point-sharded (secant search via --search probe)"
python bench.py --giant --skip_cpu_baseline >> "$LOG" 2>&1

stamp "ALL DONE (r5 final quiet)"
