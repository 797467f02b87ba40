#!/bin/bash
# r4d:
#  (1) PROFILE the pyramidkv 128k decode anomaly (20.9 tok/s vs snapkv's
#      115 at the same ~100 MB cache — r4c) — perfetto over the tunnel.
#  (2) pyramidkv vs snapkv at 32k (does the anomaly scale with ctx?).
#  (3) kivi8-pa 128k retry under AUTO chunk-state layouts (the r4b 4 GB
#      relayout copy; barrier alone measured insufficient in r4c).
#  (4) kivi4-pa 32k chunked AUTO control (r4c barrier-only: 90.27 tok/s).
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
$P --methods pyramidkv --ctx 131072 --max_new 32 --repeats 1 \
   --profile /root/repo/logs/r4d_pyr128k_trace --tag r4d_pyr128k_prof
$P --methods pyramidkv snapkv --ctx 32768 --max_new 32 --repeats 1 --tag r4d_32k
$P --methods fullkv --ctx 131072 --prefill_chunk 8192 --max_new 64 \
   --lm_head_pad 4096 --quant_method kivi --nbits 8 --q_layout pa --tag r4d_k8pa_auto
$P --methods fullkv --ctx 32768 --prefill_chunk 8192 --max_new 64 \
   --lm_head_pad 4096 --quant_method kivi --nbits 4 --q_layout pa --tag r4d_k4pa_32k_auto
echo "R4D ALL DONE"
