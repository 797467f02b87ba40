#!/bin/bash
set -x
P="env PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/tpu_bench.py"
# flash prefill block-size sweep at 32k (profile: attention 3.44s of 6.39s,
# VPU softmax + per-k-tile acc rescale bound; bigger tiles cut the rescale)
$P --methods snapkv --ctx 32768 --max_new 16 --repeats 1 --prefill_block 1024 --tag r3k_pb1024
$P --methods snapkv --ctx 32768 --max_new 16 --repeats 1 --prefill_block 2048 --tag r3k_pb2048
$P --methods snapkv --ctx 32768 --max_new 16 --repeats 1 --prefill_block 512 --tag r3k_pb512
# minference 32k: uniform online estimate vs per-head offline config, dense control
$P --methods minference --ctx 32768 --max_new 16 --repeats 1 --dense_below 0 --tag r3k_mi_uniform
$P --methods minference --ctx 32768 --max_new 16 --repeats 1 --dense_below 0 --minference_config configs/minference/llama3_8b_synthetic.json --tag r3k_mi_config
$P --methods minference --ctx 32768 --max_new 16 --repeats 1 --dense_below 100000000 --tag r3k_mi_dense
