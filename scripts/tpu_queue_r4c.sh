#!/bin/bash
# Round-4 third-leg TPU queue: measure the fused-conv / grouped-shift /
# batched-D changes, retry the remat A/Bs that died on helper crashes.
#
# Run SOLO — no concurrent CPU work (pytest beside a compile crashed
# r4b_train_noremat with tpu_compile_helper HTTP 500).
#
#   bash scripts/tpu_queue_r4c.sh [outdir]   # default /tmp
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp}

run() {
  local name=$1; shift
  echo "=== $name: $* (start $(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue_r4c.log"
  timeout 3000 "$@" >"$OUT/$name.log" 2>&1
  echo "rc=$?" >>"$OUT/$name.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/queue_r4c.log"
}

# 1. Serving after the SpadeNormBlock gamma/beta conv fusion: the batch
#    ladder at the shipping warp (auto -> matmul_bf16 on TPU).
run r4c_serve_ab python scripts/serve_ab.py 8,3,auto 16,3,auto 32,3,auto 64,3,auto

# 2. Training step after spade fusion + grouped Pallas shift + interleaved
#    D/DP/VGG batching (the three round-4c train levers).
run r4c_train_b8 python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --remat --rbg --steps 12

# 3. Remat A/Bs (retry — r4b runs died on compile-helper env crashes).
run r4c_train_noremat python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --rbg --steps 12 --skip-r1
run r4c_train_nodremat python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --remat --no-d-remat --rbg \
  --steps 12 --skip-r1

# 4. Fresh per-op trace of the new step for the next attribution pass.
run r4c_prof_step python scripts/profile_step.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --rbg \
  --trace-dir /tmp/pasta_trace_r4c --top 5

# 5. Headline candidate: bench.py at batch 32.
run r4c_bench_b32 env PASTA_BENCH_BATCH=32 python bench.py
run r4c_bench_b8 env PASTA_BENCH_BATCH=8 python bench.py

echo "=== queue done $(date -u +%H:%M:%SZ)" | tee -a "$OUT/queue_r4c.log"
