#!/bin/bash
# r5b: speculative x quantized ON-CHIP in the regime the compose was
# built for (VERDICT r4 weak #1): 64k + 32k fullkv kivi4-pa spec-vs-
# plain, random + repetitive prompts, and a ThinK leg.  Emits
# tokens/forward (GenerationOutput.spec_iterations).
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
Q="--spec_ab --max_new 128 --lm_head_pad 4096 --repeats 2"
$P $Q --methods fullkv --quant_method kivi --nbits 4 --q_layout pa \
   --ctx 65536 --tag r5b_spec64k_k4
$P $Q --methods fullkv --quant_method kivi --nbits 4 --q_layout pa \
   --ctx 32768 --tag r5b_spec32k_k4
$P $Q --methods think --ctx 32768 --cap 2048 --tag r5b_spec32k_think
echo "R5B ALL DONE"
