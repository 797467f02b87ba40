#!/bin/bash
# r4m: QUANT-carry prefix caching at long context (the path bf16 handles
# cannot reach: a 96k bf16 handle would be 12.9 GB; the kivi4 quant
# handle is ~3.3 GB).
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
Q="--methods fullkv --quant_method kivi --q_layout pa --lm_head_pad 4096 --prefill_chunk 8192"
$P $Q --ctx 32768 --nbits 4 --max_new 128 --prefix_tokens 24576 --repeats 2 --tag r4m_32k_k4
$P $Q --ctx 131072 --nbits 4 --max_new 128 --prefix_tokens 98304 --repeats 1 --tag r4m_128k_k4
echo "R4M ALL DONE"
