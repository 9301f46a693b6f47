#!/bin/bash
# Round-4 TPU suite — EXTRA part (run after tpu_r4_suite.sh if the round
# budget allows): stage split on the final tree, h2d wire probe, and a
# checkpoint resume cycle on device. Same serialization rules.
set -u
LOG=${1:-tpu_r4_final.log}
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 $(date -u) ===" | tee -a "$LOG"; }

stamp "training step (searched, int GT)"
python bench.py --train --skip_cpu_baseline >> "$LOG" 2>&1

stamp "stage split (post-sub-block tree)"
python scripts/stage_timing.py --use_pallas >> "$LOG" 2>&1

stamp "h2d wire probe"
python - >> "$LOG" 2>&1 <<'EOF'
# Direct host->device link probe backing the BASELINE r4 trainer-stall
# diagnosis (the tunneled link measured ~10 MB/s mid-round): time N
# sequential device_puts of the canonical point batch (16x70000x3 f32 =
# 13.44 MB), each synchronized by a scalar readback; subtract the
# readback-only RTT measured the same way.
import time
import numpy as np, jax, jax.numpy as jnp

batch = np.random.default_rng(0).normal(size=(16, 70000, 3)).astype(np.float32)
s = jax.jit(lambda x: jnp.sum(x))
small = np.zeros((1,), np.float32)
float(s(jax.device_put(small)))  # compile + warm
float(s(jax.device_put(batch)))  # compile big-shape sum
rtts = []
for _ in range(5):
    t0 = time.perf_counter(); float(s(jax.device_put(small)))
    rtts.append(time.perf_counter() - t0)
rtt = sorted(rtts)[len(rtts) // 2]
ts = []
for _ in range(5):
    t0 = time.perf_counter(); float(s(jax.device_put(batch)))
    ts.append(time.perf_counter() - t0)
t = sorted(ts)[len(ts) // 2] - rtt
mb = batch.nbytes / 1e6
print(f"h2d probe: {mb:.2f} MB in {t*1e3:.1f} ms -> {mb/t:.2f} MB/s "
      f"(rtt {rtt*1e3:.1f} ms; medians of 5)")
EOF

stamp "resume cycle: +2 epochs from the epoch-10 checkpoint"
CK=$(ls -d /tmp/tpu_train_r4_final/*/*_10 2>/dev/null | tail -1)
# empty CK would make --resume "" falsy in tools/train.py and silently
# train from scratch — the resume validation would be vacuous (ADVICE r4)
[ -n "$CK" ] || { echo "no epoch-10 checkpoint found" | tee -a "$LOG"; exit 1; }
echo "resuming from $CK" >> "$LOG"
python tools/train.py --epochs 12 --synthetic_length 64 \
    --n_desired_nds 1000 --device_cache --save_every 12 \
    --out_path /tmp/tpu_train_r4_final --seed 0 \
    --resume "$CK" >> "$LOG" 2>&1

stamp "ALL DONE (extra)"
