#!/bin/bash
# r4o: 64k chunked-refill serving — newly POSSIBLE after the refill-
# budget livelock fix (bucket 65536 > chunked_refill_tokens 32768
# admitted zero refills forever; now one refill is always admitted and
# the guard bounds concurrency).  One 8.6 GB refill state at a time
# next to weights + lane caches.
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
$P --serving 6 --methods snapkv --ctx 65536 --lanes 2 --prefill_chunk 8192 \
   --max_new 128 --tag r4o_srv64k
echo "R4O ALL DONE"
