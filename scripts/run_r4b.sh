#!/bin/bash
# r4b: full-alloc-list OOM retakes — pyramidkv 128k (still OOM after the
# chunked compaction) and kivi8-pa 128k.  Error capture now extracts the
# "Largest program allocations" section.
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
$P --methods pyramidkv --ctx 131072 --max_new 32 --repeats 1 --tag r4b_128k_pyramidkv
$P --methods fullkv --ctx 131072 --prefill_chunk 8192 --max_new 32 \
   --lm_head_pad 4096 --quant_method kivi --nbits 8 --q_layout pa --tag r4b_k8pa_diag
echo "R4B ALL DONE"
