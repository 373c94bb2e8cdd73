#!/bin/bash
# Round-4 queue, leg d: finish what r4c started (it died with its parent
# session after capturing serve_ab 8/16/32 = 57.3/60.2/62.4 img/s/chip).
#
# Run SOLO — no concurrent CPU work (pytest beside a compile crashed
# r4b_train_noremat with tpu_compile_helper HTTP 500).
#
#   setsid nohup bash scripts/tpu_queue_r4d.sh >/tmp/queue_r4d_driver.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp}

run() {
  local name=$1; shift
  echo "=== $name: $* (start $(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue_r4d.log"
  timeout 3000 "$@" >"$OUT/$name.log" 2>&1
  echo "rc=$?" >>"$OUT/$name.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/queue_r4d.log"
}

# 1. Serving batch-64 point (r4c measured 8/16/32 before dying).
run r4d_serve_b64 python scripts/serve_ab.py 64,3,auto

# 2. Training step after spade fusion + grouped Pallas shift + interleaved
#    D/DP/VGG batching (the three round-4c train levers).
run r4d_train_b8 python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --remat --rbg --steps 12

# 3. Remat A/Bs (retry — r4b runs died on compile-helper env crashes).
run r4d_train_noremat python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --rbg --steps 12 --skip-r1
run r4d_train_nodremat python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --remat --no-d-remat --rbg \
  --steps 12 --skip-r1

# 4. Fresh per-op trace of the new step for the next attribution pass.
run r4d_prof_step python scripts/profile_step.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --rbg \
  --trace-dir /tmp/pasta_trace_r4d --top 5

# 5. Headline candidate: bench.py at batch 32 vs 8.
run r4d_bench_b32 env PASTA_BENCH_BATCH=32 python bench.py
run r4d_bench_b8 env PASTA_BENCH_BATCH=8 python bench.py

echo "=== queue done $(date -u +%H:%M:%SZ)" | tee -a "$OUT/queue_r4d.log"
