#!/bin/bash
set -x
P="env PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/tpu_bench.py"
# serving retakes with the chunked-refill HBM budget fix
$P --serving 8 --ctx 32768 --lanes 4 --quantum 16 --methods snapkv --prefill_chunk 8192 --tag r3j_chunk8k
$P --serving 8 --ctx 32768 --lanes 4 --quantum 16 --methods snapkv --prefill_chunk 4096 --tag r3j_chunk4k
# 64k minference: uniform online estimate vs per-head offline config (VERDICT #5 bench)
$P --methods minference --ctx 65536 --max_new 64 --repeats 1 --tag r3j_mi_uniform
$P --methods minference --ctx 65536 --max_new 64 --repeats 1 --minference_config configs/minference/llama3_8b_synthetic.json --tag r3j_mi_config
# 32k prefill attribution
env PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/tpu_prefill_profile.py
