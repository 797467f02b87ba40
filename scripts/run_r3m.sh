#!/bin/bash
set -x
P="env PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/tpu_bench.py"
# 128k fullkv kivi4 with the flash-partials history attention (was 175.3s prefill)
timeout 5400 $P --methods fullkv --ctx 131072 --quant_method kivi --nbits 4 --prefill_chunk 8192 --max_new 32 --repeats 1 --tag r3m_128k_flash
# 32k quant chunked for the shorter-context row
$P --methods fullkv --ctx 32768 --quant_method kivi --nbits 4 --prefill_chunk 8192 --max_new 32 --repeats 1 --tag r3m_32k_kivi4_chunked
# 32k post-hoc quant for comparison (monolithic)
$P --methods fullkv --ctx 32768 --quant_method kivi --nbits 4 --max_new 32 --repeats 1 --tag r3m_32k_kivi4_posthoc
