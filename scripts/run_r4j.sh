#!/bin/bash
# r4j: prefix-caching A/B retake with the fused init+scatter state build
# (r4i's cached legs RESOURCE_EXHAUSTED: the separate init jit kept a
# dead 4.3 GB zeros buffer live next to the 3.2 GB handle + weights).
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
$P --methods snapkv --ctx 32768 --max_new 128 --prefill_chunk 8192 \
   --prefix_tokens 24576 --repeats 2 --tag r4j_gen32k
$P --serving 8 --methods snapkv --ctx 32768 --lanes 4 --prefill_chunk 8192 \
   --prefix_tokens 24576 --max_new 128 --tag r4j_srv32k
echo "R4J ALL DONE"
