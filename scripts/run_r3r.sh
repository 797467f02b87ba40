#!/bin/bash
# r3r: manual-DMA int4 matmul sweep at the flagship config (d32 int4+lm4
# pad4096 snapkv@4k; control 141.8 = auto-pipeline, r3o).  Window sizes
# bound the double-buffered copy granularity (2 x win x 2048 B of VMEM).
set -x
P="env PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/tpu_bench.py"
$P --methods snapkv --ctx 4096 --lm_head_pad 4096 \
    --int4_dma_wins 0 256 512 1024 2048 --tag r3r
