#!/bin/bash
# r4n: 128k quant-prefix retake — kivi4 with a HOST handle (the device
# handle OOM'd: 3.4 GB next to the 4.6 GB carry + weights, r4m), and
# kivi2 with a device handle (1.9 GB fits).
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
Q="--methods fullkv --quant_method kivi --q_layout pa --lm_head_pad 4096 --prefill_chunk 8192 --ctx 131072 --max_new 128 --prefix_tokens 98304 --repeats 1"
$P $Q --nbits 4 --prefix_host --tag r4n_128k_k4_host
$P $Q --nbits 2 --tag r4n_128k_k2
echo "R4N ALL DONE"
