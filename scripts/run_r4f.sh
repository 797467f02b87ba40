#!/bin/bash
# r4f: segmented-decode cost attribution (r4e: pyramidkv 58 vs snapkv
# 140 tok/s at 32k max_new=128 — segmented x d32-int4 never measured
# before; r2af's healthy pyramidkv row was d8 bf16).
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
# does it reproduce at 4k? and does l2norm (2 segments) sit in between?
$P --methods pyramidkv snapkv l2norm --ctx 4096 --max_new 128 --repeats 2 --tag r4f_4k
# wall + device profile of the segmented decode at 4k
$P --methods pyramidkv --ctx 4096 --max_new 128 --repeats 1 \
   --profile /root/repo/logs/r4f_pyr4k_trace --tag r4f_pyr4k_prof
# snapkv control profile (same harness, same interpretation rules)
$P --methods snapkv --ctx 4096 --max_new 128 --repeats 1 \
   --profile /root/repo/logs/r4f_snap4k_trace --tag r4f_snap4k_prof
# 128k pyramidkv: r4c measured prefill 45.7s (max_new 32), r4e 140.9s
# (max_new 128, +12 commits) — bisect max_new vs code with repeats 2
$P --methods pyramidkv --ctx 131072 --max_new 32 --repeats 2 --tag r4f_128k_mn32
$P --methods pyramidkv --ctx 131072 --max_new 128 --repeats 2 --tag r4f_128k_mn128
echo "R4F ALL DONE"
