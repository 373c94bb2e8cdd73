#!/bin/bash
# Round-4 queue, leg e (relaunched): the R1 program variant at batch 8 +
# full-batch R1 is 23MB over the 15.75GB HBM ceiling even with the
# per-variant stream-batching fix (was 90MB over) — the Gmain spade
# encoder holds 2x 1GB remat buffers (batch-16 garment streams at 512²,
# 2x lane padding). r1_batch_shrink=2 is the documented single-chip
# memory knob (unbiased estimator, mirroring the reference's own
# pl_batch_shrink=2); measure the full pipeline there and the plain-step
# levers separately.
#
# Run SOLO — no concurrent CPU work.
#   setsid nohup bash scripts/tpu_queue_r4e.sh >/tmp/queue_r4e_driver.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp}

run() {
  local name=$1; shift
  echo "=== $name: $* (start $(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue_r4e.log"
  timeout 3000 "$@" >"$OUT/$name.log" 2>&1
  echo "rc=$?" >>"$OUT/$name.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/queue_r4e.log"
}

# Full pipeline (plain + R1) at the single-chip R1 operating point.
run r4e_train_b8_shrink2 python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --remat --rbg --steps 12 \
  --r1-batch-shrink 2

# reuse_g_fakes: skip the shared no-grad G forward (113 ms of the
# 1355 ms step per the r4d trace) — classic-GAN fake semantics, opt-in.
run r4e_train_reuse python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --remat --rbg --steps 12 \
  --r1-batch-shrink 2 --reuse-g-fakes

# d_remat off was +9% without R1 (r4d: 1259 vs 1375 ms); with shrink2
# does the R1 program still fit?
run r4e_train_nodremat python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --remat --no-d-remat --rbg \
  --steps 12 --r1-batch-shrink 2

run r4e_probe_stem python scripts/probe_stem_conv.py --batch 16

run r4e_serve_b48 python scripts/serve_ab.py 48,3,auto

run r4e_prof_serving python scripts/profile_serving.py \
  --batch 32 --trace-dir /tmp/pasta_trace_serve_r4e --top 30

echo "=== queue done $(date -u +%H:%M:%SZ)" | tee -a "$OUT/queue_r4e.log"
