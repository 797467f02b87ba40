#!/bin/bash
# r4h: K-codes SLOT-MAJOR layout flip validation (the r4 diagnosis: all
# big quant relayout copies traced to channel-major K codes vs the dots'
# D-minor preference; storage now matches preference natively).
#  Expectations: (a) every measured KIVI row holds or improves (the
#  per-generate-call relayout copies disappear); (b) kivi8 128k — the
#  capacity casualty — now FITS and runs.
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
Q="--methods fullkv --max_new 128 --lm_head_pad 4096 --quant_method kivi --q_layout pa --repeats 2"
$P $Q --ctx 32768 --nbits 4 --tag r4h_32k_k4            # ctl 88.8-90.3
$P $Q --ctx 65536 --nbits 4 --tag r4h_64k_k4            # ctl 65.1-67.0
$P $Q --ctx 65536 --nbits 8 --tag r4h_64k_k8            # ctl 71.4-73.3
$P $Q --ctx 131072 --prefill_chunk 8192 --nbits 4 --repeats 1 --tag r4h_128k_k4   # ctl 35.8
$P $Q --ctx 131072 --prefill_chunk 8192 --nbits 8 --repeats 1 --tag r4h_128k_k8   # THE UNLOCK (was OOM)
$P $Q --ctx 131072 --prefill_chunk 8192 --nbits 2 --repeats 1 --tag r4h_128k_k2   # ctl 35.05-35.15
# snapkv+kivi (compressed quant region) sanity
$P --methods snapkv --ctx 4096 --cap 2048 --max_new 128 --repeats 2 \
   --quant_method kivi --nbits 4 --q_layout pa --lm_head_pad 4096 --tag r4h_snap_k4
echo "R4H ALL DONE"
