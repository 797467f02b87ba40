#!/bin/bash
# r3s: serving workload realism (d32 int4+lm4 snapkv, 4 lanes, chunked
# 8k refills).  Leg 1 = the historical batch-arrival 8x32k row with TTFT
# percentiles (control 23.4 tok/s wall, r3g).  Leg 2 = open-loop Poisson
# arrivals with a mixed prompt-length ladder (the realistic case).
set -x
P="env PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/tpu_bench.py"
$P --serving 8 --ctx 32768 --lanes 4 --prefill_chunk 8192 \
    --lm_head_pad 4096 --tag r3s_batch
$P --serving 16 --ctx 32768 --lanes 4 --prefill_chunk 8192 \
    --lm_head_pad 4096 --buckets 8192 16384 32768 \
    --prompt_lens 8191 16383 32767 --arrival_rate 0.5 --tag r3s_poisson
