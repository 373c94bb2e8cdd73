#!/bin/sh
# Canonical 512px fashion training invocation (reference train.sh:1-11
# semantics; --devices replaces --gpus, the data mesh spans the local
# chips). The device loader keeps the host out of the critical path.
python -m pasta_tpu.cli.train \
    --outdir ./training-runs-fullbody \
    --data "${1:?usage: train.sh <data-root-or-zip>}" \
    --cfg fashion \
    --batch 24 --l1weight 10 --seed 1 \
    --vgg_weight 20 --use_noise_const_branch True \
    --contextual_weight 0 --pl_weight 0 \
    --mask_weight 30 \
    --loader-impl device
