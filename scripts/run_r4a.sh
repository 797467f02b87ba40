#!/bin/bash
# r4a: round-4 opening diagnostics.
#  (1) 128k pyramidkv with the CHUNKED compaction contraction
#      (ops/selection.py::_COMPACT_CHUNK fix for the r2bb compile OOM) +
#      snapkv control at the same budget (r3l row: 120.4 tok/s, 45.0 s).
#  (2) 128k kivi8-pa OOM retry with head-preserving error capture —
#      name the culprit allocation (VERDICT r3 missing #2).
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
$P --methods pyramidkv --ctx 131072 --max_new 32 --repeats 1 --tag r4a_128k_pyramidkv
$P --methods snapkv --ctx 131072 --max_new 32 --repeats 1 --tag r4a_128k_snapkv_ctl
$P --methods fullkv --ctx 131072 --prefill_chunk 8192 --max_new 128 \
   --lm_head_pad 4096 --quant_method kivi --nbits 8 --q_layout pa --tag r4a_k8pa_diag
echo "R4A ALL DONE"
