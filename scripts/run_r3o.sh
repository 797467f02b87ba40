#!/bin/bash
# r3o: lm_head vocab-axis tile padding at the flagship config
# (d32 int4+lm4 snapkv@4k) — pad 0 (control) vs 2048 (129024=63*2048)
# vs 4096 (131072=32*4096).  One process, one engine per pad value.
set -x
P="env PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/tpu_bench.py"
$P --methods snapkv --ctx 4096 --lm_head_pad 0 2048 4096 --tag r3o
# int8 lm_head: pad also widens its streaming tiles (128256=128*1002)
$P --methods snapkv --ctx 4096 --lm_head_nbits 8 --lm_head_pad 0 2048 \
    --tag r3o_lm8
