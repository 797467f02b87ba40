#!/bin/bash
# r3x: remaining round-3 queue after cutting the losing streaming-kernel
# legs (r3v measured 64k kivi4 pa 52.1 / 32k 75.5 vs factored-XLA
# controls 65.1 / 88.8 — the kernel loses ~15-20%; negative result).
#  (1) the two 128k KIVI pa rows the r3t snapshot cut off (factored
#      default — these are BASELINE rows);
#  (2) r3w flash sub_k software-pipelining sweep at 32k.
set -x
P="env PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/tpu_bench.py"
A="--methods fullkv --ctx 131072 --prefill_chunk 8192 --max_new 128 \
   --lm_head_pad 4096 --quant_method kivi"
$P $A --nbits 2 --q_layout pa --tag r3t_k2pa
$P $A --nbits 8 --q_layout pa --tag r3t_k8pa
bash scripts/run_r3w.sh
echo "R3X ALL DONE"
