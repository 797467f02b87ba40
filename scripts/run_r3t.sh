#!/bin/bash
# r3t: 128k full-KV KIVI decode retake under the fused factored-dequant
# default (r3p/r3q flipped it; the r3g rows — kivi4 15.3, kivi2 18.4
# tok/s — predate it and 64k doubled).  Group + pa layouts; quantized
# chunk-carry prefill (8k chunks) as in r3g.
set -x
P="env PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/tpu_bench.py"
A="--methods fullkv --ctx 131072 --prefill_chunk 8192 --max_new 128 \
   --lm_head_pad 4096 --quant_method kivi"
$P $A --nbits 4 --tag r3t_k4g
$P $A --nbits 4 --q_layout pa --tag r3t_k4pa
$P $A --nbits 2 --q_layout pa --tag r3t_k2pa
$P $A --nbits 8 --q_layout pa --tag r3t_k8pa
