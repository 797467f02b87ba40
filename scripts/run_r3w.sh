#!/bin/bash
# r3w: flash-prefill software pipelining (sub_k) sweep at 32k, d32
# int4+lm4-pad snapkv — does hoisting all sub-tile logit dots ahead of
# the online-softmax updates buy MXU/VPU overlap?  Control = the r3k
# 1024-tile floor (32k prefill 5.14 s).  Geometries:
#   ctl: bq=bk=1024, sub_k=1
#   a:   bq=512,  bk=1024, sk=512   (same fetch, finer updates)
#   b:   bq=1024, bk=2048, sk=1024  (VMEM-borderline: 2x4MB f32 s-parts)
#   c:   bq=512,  bk=2048, sk=512
set -x
P="env PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/tpu_bench.py"
Q="--methods snapkv --ctx 32768 --max_new 16 --lm_head_pad 4096 --repeats 2"
$P $Q --prefill_block 1024 --tag r3w_ctl
$P $Q --prefill_block 1024 --prefill_sub_k 2 --tag r3w_a
$P $Q --prefill_block 2048 --prefill_sub_k 2 --tag r3w_b
$P $Q --prefill_block 2048 --prefill_sub_k 4 --tag r3w_c
echo "R3W ALL DONE"
