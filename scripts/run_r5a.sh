#!/bin/bash
# r5a: fill the long-context method grid (VERDICT r4 weak #2 / next #3):
# adakv, headkv (synthetic priors), think, cam, l2norm at 32k, caps 128
# and 2048, full depth d32, int4 weights + int4 lm_head (pad 4096) —
# the same config as the snapkv/pyramidkv 32k rows they join.
# Any OOM is captured per-row by run_generate and diagnosed after.
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
$P --methods adakv headkv think cam l2norm --caps 128 2048 \
   --ctx 32768 --max_new 128 --lm_head_pad 4096 --repeats 2 \
   --tag r5a_grid32k
echo "R5A ALL DONE"
