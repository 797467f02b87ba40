#!/bin/bash
# r3g: serving + long-context DONE-criteria measurements, one TPU process chain
set -x
P="env PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/tpu_bench.py"
# 1. serving control: 8x32k CB snapkv d32 int4+lm4 (r2ab was 18.0 tok/s wall at int4w/int8lm)
$P --serving 8 --ctx 32768 --lanes 4 --quantum 16 --methods snapkv --tag r3g_ctl
# 2. chunked-prefill serving (VERDICT #2 done-criterion)
$P --serving 8 --ctx 32768 --lanes 4 --quantum 16 --methods snapkv --prefill_chunk 8192 --tag r3g_chunk8k
# 3. chunked at finer grain
$P --serving 8 --ctx 32768 --lanes 4 --quantum 16 --methods snapkv --prefill_chunk 4096 --tag r3g_chunk4k
# 4. 128k fullkv kivi4 chunked prefill + decode (VERDICT #3 done-criterion)
timeout 5400 $P --methods fullkv --ctx 131072 --quant_method kivi --nbits 4 --prefill_chunk 8192 --max_new 32 --repeats 1 --tag r3h_128k
# 5. 128k int2
timeout 5400 $P --methods fullkv --ctx 131072 --quant_method kivi --nbits 2 --prefill_chunk 8192 --max_new 32 --repeats 1 --tag r3h_128k
# 6. flagship best-tiles row for BENCH provenance
$P --methods snapkv fullkv --ctx 32768 --blocks 2048 2048 --sub_in 512 --tag r3i_32k
