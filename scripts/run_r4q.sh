#!/bin/bash
# r4q: 64k full-KV kivi2 with a 48k quantized prefix (handle 0.9 GB +
# state 1.2 GB: fits with room; completes the quant-prefix ctx ladder).
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
$P --methods fullkv --quant_method kivi --q_layout pa --nbits 2 \
   --lm_head_pad 4096 --prefill_chunk 8192 --ctx 65536 --max_new 128 \
   --prefix_tokens 49152 --repeats 1 --tag r4q_64k_k2
echo "R4Q ALL DONE"
