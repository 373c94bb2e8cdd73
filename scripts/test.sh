#!/bin/sh
# Canonical try-on inference over the fixture pairs (reference test.sh:1-23):
#   test.sh 1 <network>  -> upper    test.sh 2 <network> -> lower
#   test.sh 3 <network>  -> full
# <network> may be an orbax dir, .npz, or the reference snapshot .pkl;
# omit it to run a randomly initialized generator (data-path smoke).
PART=upper
[ "$1" = 2 ] && PART=lower
[ "$1" = 3 ] && PART=full
NET=${2:+--network $2}
python -m pasta_tpu.cli.test \
    --dataroot test_datas --testtxt test_pairs.txt \
    $NET \
    --outdir "test_results/$PART" \
    --batchsize 1 --testpart "$PART" \
    --use-sleeve-mask
