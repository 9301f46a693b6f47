#!/bin/bash
# Round-5 session 3: canonical-length training on the chip (VERDICT r5
# item 4). 130 epochs (README.md:36) at the canonical shape with
# --device_cache/--epoch_scan, save_every=2, crossing the epoch-20/40/...
# LR-halving boundaries — run as 60 epochs + a --resume continuation to
# 130 so restartability is proven at realistic horizon with CLEAN process
# exits (a mid-flight SIGKILL of a TPU-attached process wedges this
# image's tunnel for ~10-40 min — CLAUDE.md; the reference semantics
# being proven, save/load + continue, are identical either way).
# Then a classification session — the capability the reference lacks
# (train.py:122-123 raises NotImplementedError) — on the chip.
set -u
LOG=${1:-tpu_r5_train.log}
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 $(date -u) ===" | tee -a "$LOG"; }

OUT=/tmp/tpu_train_r5
rm -rf "$OUT"

stamp "canonical bench, probe search + payload KL (A/B vs the 6.47 ms gather-KL row)"
python bench.py --skip_cpu_baseline >> "$LOG" 2>&1

stamp "training-step bench, probe search + payload KL (searched, int GT)"
python bench.py --train --skip_cpu_baseline >> "$LOG" 2>&1

stamp "canonical 130-epoch session, part 1: epochs 1-60"
python tools/train.py --epochs 60 --synthetic_length 64 \
    --n_desired_nds 1000 --device_cache --save_every 2 \
    --out_path "$OUT" --seed 0 >> "$LOG" 2>&1

CK=$(ls -d "$OUT"/*/ndtnet_segmentation_60 2>/dev/null | tail -1)
[ -n "$CK" ] || { echo "no epoch-60 checkpoint found" | tee -a "$LOG"; exit 1; }
stamp "canonical 130-epoch session, part 2: resume 61-130 from $CK"
# the epoch loop runs cfg.epochs MORE epochs from the restored step (the
# LR schedule and step counter continue from the checkpoint), so the
# continuation asks for the remaining 70
python tools/train.py --epochs 70 --synthetic_length 64 \
    --n_desired_nds 1000 --device_cache --save_every 2 \
    --out_path "$OUT" --seed 0 --resume "$CK" >> "$LOG" 2>&1

stamp "classification session: 12 epochs on the chip"
python tools/train.py --task classification --epochs 12 \
    --n_classes 8 --batch_size 8 --n_samples 70000 \
    --n_desired_nds 1000 --device_cache --save_every 6 \
    --out_path "$OUT"_cls --seed 0 >> "$LOG" 2>&1

stamp "ALL DONE (r5 train)"
