#!/bin/bash
# Round-4 queue, leg f: retry the shrink-2 baseline point (r4e's died on
# a mid-run source edit race, not a real failure) + the vgg_remat and
# remat_min_res A/Bs on the plain step.
#
# Run SOLO — no concurrent CPU work; do NOT edit pasta_tpu/ while this
# runs (bench_train imports the model modules AFTER device init).
#   setsid nohup bash scripts/tpu_queue_r4f.sh >/tmp/queue_r4f_driver.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp}

run() {
  local name=$1; shift
  echo "=== $name: $* (start $(date -u +%H:%M:%SZ))" | tee -a "$OUT/queue_r4f.log"
  timeout 3000 "$@" >"$OUT/$name.log" 2>&1
  echo "rc=$?" >>"$OUT/$name.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/queue_r4f.log"
}

# Baseline full pipeline (plain + R1) at the single-chip R1 operating
# point — the number the README train table leads with.
run r4f_train_b8_shrink2 python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --remat --rbg --steps 12 \
  --r1-batch-shrink 2

# vgg_remat off: store the fake-stream pyramids (~1GB), skip the
# backward's VGG recompute (2x ~44ms by the r4d trace).
run r4f_train_novggremat python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --remat --rbg --steps 12 \
  --r1-batch-shrink 2 --no-vgg-remat

# remat_min_res: skip remat below 128px now that bf16+shrink2 freed HBM.
run r4f_train_minres128 python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --remat --remat-min-res 128 \
  --rbg --steps 12 --r1-batch-shrink 2

# d_remat off now only applies to the plain program variant (the R1
# variants force D remat — 20.5GB without it); the +9% plain win should
# now compose with the full pipeline.
run r4f_train_nodremat python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --remat --no-d-remat --rbg \
  --steps 12 --r1-batch-shrink 2

# All levers together: reuse fakes + no d remat + no vgg remat +
# min-res 128 (reuse and d-remat-off auto-disable in the R1 variants).
run r4f_train_stacked python scripts/bench_train.py \
  --batch 8 --g-bf16-res 7 --d-bf16-res 7 --remat --remat-min-res 128 \
  --rbg --steps 12 --r1-batch-shrink 2 --reuse-g-fakes --no-vgg-remat \
  --no-d-remat

# Fresh serving per-op profile at the shipping batch-32 config
# (profile_serving reads the batch from PASTA_BENCH_BATCH).
run r4f_prof_serving env PASTA_BENCH_BATCH=32 python \
  scripts/profile_serving.py --trace-dir /tmp/pasta_trace_serve_r4f --top 30

echo "=== queue done $(date -u +%H:%M:%SZ)" | tee -a "$OUT/queue_r4f.log"
