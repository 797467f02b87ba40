#!/bin/bash
set -x
P="env PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/tpu_bench.py"
# serving with the 1.25x prefill (wall was prefill-bound at 18.9)
$P --serving 8 --ctx 32768 --lanes 4 --quantum 16 --methods snapkv --tag r3l_ctl
$P --serving 8 --ctx 32768 --lanes 4 --quantum 16 --methods snapkv --prefill_chunk 8192 --tag r3l_chunk8k
# d8 geometry 64k: dense vs uniform sparse vs per-head config (VERDICT #5 row)
$P --methods minference --ctx 65536 --depth 8 --max_new 16 --repeats 1 --dense_below 100000000 --tag r3l_mi_dense64k
$P --methods minference --ctx 65536 --depth 8 --max_new 16 --repeats 1 --dense_below 0 --tag r3l_mi_uniform64k
$P --methods minference --ctx 65536 --depth 8 --max_new 16 --repeats 1 --dense_below 0 --minference_config configs/minference/llama3_8b_synthetic.json --tag r3l_mi_config64k
# 128k snapkv with the tile floor (was 45.3s prefill in r2bb)
$P --methods snapkv --ctx 131072 --max_new 32 --repeats 1 --tag r3l_128k_snapkv
