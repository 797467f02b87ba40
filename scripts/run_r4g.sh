#!/bin/bash
# r4g: pyramidkv/l2norm decode rates with the honest timing boundary
# (generate() now drains the whole prefill before the decode timer) —
# expected: segmented methods match snapkv's decode at every ctx.
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
$P --methods pyramidkv snapkv --ctx 32768 --max_new 128 --repeats 2 --tag r4g_32k
$P --methods pyramidkv --ctx 131072 --max_new 128 --repeats 1 --tag r4g_128k
echo "R4G ALL DONE"
