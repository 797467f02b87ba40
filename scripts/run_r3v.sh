#!/bin/bash
# r3v: continuation of the cut-off round-3 measurement queue.
#  (1) r3u legs — streaming factored-dequant Pallas kernel
#      (use_quant_fused_kernel) vs the XLA factored path on pa-layout
#      KIVI regions.  Controls: r3p (64k kivi4 65.1 / kivi8 71.4 /
#      kivi2 67.0, 32k kivi4 88.8) and r3t (128k kivi4 pa 35.8).
#  (2) the two r3t legs the round snapshot killed (128k kivi2/kivi8 pa,
#      factored default).
set -x
P="env PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/tpu_bench.py"
Q="--methods fullkv --quant_method kivi --max_new 64 --lm_head_pad 4096 \
   --q_layout pa --quant_fused_kernel"
A="--methods fullkv --ctx 131072 --prefill_chunk 8192 --max_new 128 \
   --lm_head_pad 4096 --quant_method kivi"
$P $Q --ctx 65536 --nbits 4 --tag r3u_64k4_fk
$P $Q --ctx 32768 --nbits 4 --tag r3u_32k4_fk
$P $Q --ctx 65536 --nbits 8 --tag r3u_64k8_fk
$P $Q --ctx 65536 --nbits 2 --tag r3u_64k2_fk
$P $Q --ctx 131072 --nbits 4 --prefill_chunk 8192 --max_new 128 \
    --tag r3u_128k4_fk
$P $A --nbits 2 --q_layout pa --tag r3t_k2pa
$P $A --nbits 8 --q_layout pa --tag r3t_k8pa
echo "R3V ALL DONE"
