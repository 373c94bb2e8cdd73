#!/bin/bash
# Round-4 (second leg) sequential TPU measurement queue.
#
# Run SOLO: this container has one host core; concurrent CPU work starves
# the tunnel RPC thread and turns real measurements into noise (round-4
# postmortem: a torch build running beside a bench probe produced a fake
# "device unreachable").
#
#   bash scripts/tpu_queue_r4b.sh [outdir]   # default /tmp
#
# Each step appends "rc=N" so a dead tunnel is visible per-log.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp}

run() {
  local name=$1; shift
  echo "=== $name: $* (start $(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue_r4b.log"
  timeout 3000 "$@" >"$OUT/$name.log" 2>&1
  echo "rc=$?" >>"$OUT/$name.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/queue_r4b.log"
}

# 1. Training FLOP/byte wall: is >=10 img/s/chip physically reachable at
#    the measured conv-emitter rate, or is 5.9 already near speed-of-light?
run r4b_cost_train python scripts/train_cost_audit.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7

# 2. Per-phase on-chip profile of the production bf16 step (where is the
#    non-conv time: rng/ada/layout copies/erode analogues?).
run r4b_prof_step python scripts/profile_step.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --rbg \
  --trace-dir /tmp/pasta_trace_r4b --top 40

# 2b. Straggler-fusion probe: conv+lrelu/add epilogue vs barriered.
run r4b_probe_epi python scripts/probe_epilogue.py --batch 8

# 3. Serving bench at the throughput-optimal batch with auto->matmul_bf16.
run r4b_bench_b32 env PASTA_BENCH_BATCH=32 python bench.py
run r4b_bench_b8 env PASTA_BENCH_BATCH=8 python bench.py

# 4. Training step A/B: grad-accum microbatch (2x8) vs plain b8 — does a
#    larger effective batch amortize anything at fixed per-image FLOPs?
run r4b_train_b8 python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --remat --rbg --steps 12
run r4b_train_accum2 python scripts/bench_train.py \
  --batch 8 --grad-accum 2 --g-bf16-res 7 --d-bf16-res 7 --remat --rbg --steps 8

# 5. Remat A/Bs: the G-backward recompute is ~1 extra G forward (~15% of
#    step FLOPs). Does bf16 b8 fit without remat / with big-res-only remat?
run r4b_train_noremat python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --rbg --steps 12 --skip-r1
run r4b_train_nodremat python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --remat --no-d-remat --rbg \
  --steps 12 --skip-r1

echo "=== queue done $(date -u +%H:%M:%SZ)" | tee -a "$OUT/queue_r4b.log"
