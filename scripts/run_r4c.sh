#!/bin/bash
# r4c: validate the two r4b OOM fixes.
#  (1) pyramidkv 128k with the token-chunked prefill MLP (7 GB gate-up
#      temp -> 0.875 GB) + chunked compaction: should now COMPILE AND RUN.
#  (2) kivi8-pa 128k with the hist-tile optimization_barrier (kills the
#      4 GB per-chunk code-buffer relayout copy).
#  (3) kivi4-pa 32k chunked control: barrier must not regress the known
#      5.63 s chunked-quant prefill / 88.8 tok/s decode row.
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
$P --methods pyramidkv --ctx 131072 --max_new 32 --repeats 1 --tag r4c_128k_pyramidkv
$P --methods fullkv --ctx 131072 --prefill_chunk 8192 --max_new 64 \
   --lm_head_pad 4096 --quant_method kivi --nbits 8 --q_layout pa --tag r4c_k8pa
$P --methods fullkv --ctx 32768 --prefill_chunk 8192 --max_new 64 \
   --lm_head_pad 4096 --quant_method kivi --nbits 4 --q_layout pa --tag r4c_k4pa_32k_ctl
echo "R4C ALL DONE"
