#!/bin/bash
# Round-5 sort-stage probe session (VERDICT r5 item 1).
#
# Part A: lax.sort cost structure at the canonical shapes — key-only vs
# +payload operands, and vs N (the probe sort is [16, 17500] key-only).
# Part B: canonical A/B, search=fast (2 cold payload sorts) vs
# search=probe (Chao1-probe-seeded: ~1 cold payload sort + 1/4 key probe).
#
# Serialized: one TPU client at a time; every run ends with a real scalar
# readback (CLAUDE.md). NOTE: run during the r5 parity sweeps -> rows are
# *(contended)*; the A/B pairs are back-to-back so contention cancels.
set -u
LOG=${1:-tpu_r5_sorts.log}
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 $(date -u) ===" | tee -a "$LOG"; }

stamp "sort micro: [16, 70000] key-only"
python scripts/kernel_micro.py --mode sort1 --n 70000 >> "$LOG" 2>&1

stamp "sort micro: [16, 70000] 1 key + 3 payload (untagged search operands)"
python scripts/kernel_micro.py --mode sort4 --n 70000 >> "$LOG" 2>&1

stamp "sort micro: [16, 70000] 1 key + 4 payload (tagged search operands)"
python scripts/kernel_micro.py --mode sort5 --n 70000 >> "$LOG" 2>&1

stamp "sort micro: [16, 35000] key-only"
python scripts/kernel_micro.py --mode sort1 --n 35000 >> "$LOG" 2>&1

stamp "sort micro: [16, 17500] key-only (the 1/4 probe shape)"
python scripts/kernel_micro.py --mode sort1 --n 17500 >> "$LOG" 2>&1

stamp "sort micro: [16, 8750] key-only"
python scripts/kernel_micro.py --mode sort1 --n 8750 >> "$LOG" 2>&1

stamp "canonical A/B control: search=fast"
python bench.py --skip_cpu_baseline >> "$LOG" 2>&1

stamp "canonical A/B: search=probe"
python bench.py --search probe --skip_cpu_baseline >> "$LOG" 2>&1

stamp "ALL DONE (r5 sorts)"
