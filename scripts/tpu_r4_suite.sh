#!/bin/bash
# Round-4 FINAL quiet-host TPU measurement suite — CORE part (the rows
# BASELINE.md's r4 section promises "appended at the end of the round"):
# the final r4 tree = sub-blocked Pallas moment kernel (block 2048 /
# sub 128) + scatter-set KL inverse permutation + 2-sort emit, measured
# WITHOUT the CPU parity-sweep contention that marked the mid-round A/B
# rows. scripts/tpu_r4_suite_extra.sh holds the stretch measurements.
#
# Serialized: one TPU client at a time, every run ends with a real scalar
# readback (CLAUDE.md: concurrent clients / abandoned in-flight work wedge
# the tunnel). Run on a QUIET host.
set -u
LOG=${1:-tpu_r4_final.log}
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 $(date -u) ===" | tee -a "$LOG"; }

stamp "canonical f32 (final r4 tree)"
python bench.py --skip_cpu_baseline >> "$LOG" 2>&1

stamp "streaming"
python bench.py --streaming --skip_cpu_baseline >> "$LOG" 2>&1

stamp "warm-start"
python bench.py --warm_start --skip_cpu_baseline >> "$LOG" 2>&1

stamp "training step (streaming, int GT)"
python bench.py --train --streaming --skip_cpu_baseline >> "$LOG" 2>&1

stamp "TPU training session: 10 epochs, device-cache + epoch-scan"
rm -rf /tmp/tpu_train_r4_final
python tools/train.py --epochs 10 --synthetic_length 64 \
    --n_desired_nds 1000 --device_cache --save_every 5 \
    --out_path /tmp/tpu_train_r4_final --seed 0 >> "$LOG" 2>&1

stamp "ALL DONE (core)"
