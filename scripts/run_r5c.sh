#!/bin/bash
# r5c: compose prefix caching INTO 64k chunked serving (VERDICT r4 weak
# #5 / next #6): 6 x 64k requests, 2 lanes, chunked 8k refills, fullkv
# kivi2-pa, 48k shared prefix — ctl leg then cached leg in ONE process.
# Comparator: r4o (snapkv bf16 refills, no prefix): wall 95.7 s, TTFT
# p50 54.8 s; r4q generate-mode cut was 2.66x on exactly this prefill.
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
$P --serving 6 --methods fullkv --quant_method kivi --nbits 2 \
   --q_layout pa --ctx 65536 --lanes 2 --prefill_chunk 8192 \
   --max_new 128 --prefix_tokens 49152 --tag r5c_srv64k_prefix
echo "R5C ALL DONE"
