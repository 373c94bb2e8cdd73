#!/bin/bash
# Round-4 queue, leg e: after the r4d findings —
#   * r4d_train_b8 R1 variant OOM'd by 90MB (the r4c Gmain stream
#     batching tipped the grad-of-grad peak over 15.75GB); the step now
#     disables stream batching in the R1 program variants. Re-measure.
#   * stem-conv layout probe (42x lane-padded input copy).
#   * serving batch-48 point (32 = 62.4, 64 OOMs; is 48 the peak?).
#   * fresh serving per-op profile after erosion+bf16-warp+spade fusion.
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

run r4e_train_b8 python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --remat --rbg --steps 12

# reuse_g_fakes: skip the shared no-grad G forward (113 ms of the
# 1355 ms step per the r4d trace) — classic-GAN fake semantics, opt-in.
run r4e_train_reuse python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --remat --rbg --steps 12 \
  --reuse-g-fakes

# d_remat off was +9% without R1 (r4d: 1259 vs 1375 ms); check it fits
# WITH the R1 program now that R1 variants run unbatched Gmain streams.
run r4e_train_nodremat python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --remat --no-d-remat --rbg \
  --steps 12

run r4e_probe_stem python scripts/probe_stem_conv.py --batch 16

run r4e_serve_b48 python scripts/serve_ab.py 48,3,auto

run r4e_prof_serving python scripts/profile_serving.py \
  --batch 32 --trace-dir /tmp/pasta_trace_serve_r4e --top 30

echo "=== queue done $(date -u +%H:%M:%SZ)" | tee -a "$OUT/queue_r4e.log"
