#!/bin/bash
# Round-3 full TPU measurement suite with the corrected scan-timing
# protocol (RTT measured and subtracted — commit 24b2123). Serialized:
# one TPU client at a time, every run ends with a real scalar readback
# (CLAUDE.md: concurrent clients / abandoned in-flight work wedge the
# tunnel). Run on a QUIET host (no concurrent CPU jobs).
set -u
LOG=${1:-tpu_r3_batch3.log}
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 $(date -u) ===" | tee -a "$LOG"; }

stamp "canonical f32"
python bench.py --skip_cpu_baseline >> "$LOG" 2>&1

stamp "canonical bf16"
python bench.py --dtype bf16 --skip_cpu_baseline >> "$LOG" 2>&1

stamp "streaming"
python bench.py --streaming --skip_cpu_baseline >> "$LOG" 2>&1

stamp "components"
python bench.py --components --skip_cpu_baseline >> "$LOG" 2>&1

stamp "train"
python bench.py --train --skip_cpu_baseline >> "$LOG" 2>&1

stamp "multiscale"
python bench.py --multiscale --skip_cpu_baseline >> "$LOG" 2>&1

stamp "giant"
python bench.py --giant --skip_cpu_baseline >> "$LOG" 2>&1

stamp "stress"
python bench.py --stress --skip_cpu_baseline >> "$LOG" 2>&1

stamp "model_timing f32"
python scripts/model_timing.py --variants flat,fold >> "$LOG" 2>&1

stamp "model_timing bf16"
python scripts/model_timing.py --dtype bf16 >> "$LOG" 2>&1

stamp "ALL DONE"
