#!/bin/bash
# r4p: serving realism x prefix caching — mixed prompt lengths (16k/32k
# bucket ladder) with Poisson arrivals, every request sharing an 8k
# prefix; ctl vs cached in one process.
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
$P --serving 10 --methods snapkv --ctx 32768 --lanes 4 --prefill_chunk 8192 \
   --buckets 16384 32768 --prompt_lens 16383 32767 --arrival_rate 0.25 \
   --prefix_tokens 8192 --max_new 128 --tag r4p_poisson
echo "R4P ALL DONE"
