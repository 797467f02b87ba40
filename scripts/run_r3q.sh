#!/bin/bash
# r3q: 128k full-KV with the factored fused decode (control r3m: kivi4
# 15.3 tok/s decode / 51.3 s chunked prefill), + short-region fused probe,
# + 32k group-layout fused row (apples-to-apples vs the 50.7 scan row).
set -x
P="env PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/tpu_bench.py"
Q="--methods fullkv --quant_method kivi --lm_head_pad 4096"
$P $Q --ctx 131072 --nbits 4 --prefill_chunk 8192 --max_new 32 --tag r3q_128k4_group
$P $Q --ctx 131072 --nbits 4 --prefill_chunk 8192 --max_new 32 --q_layout pa --tag r3q_128k4_pa
$P $Q --ctx 131072 --nbits 2 --prefill_chunk 8192 --max_new 32 --q_layout pa --tag r3q_128k2_pa
$P $Q --ctx 32768 --nbits 4 --max_new 64 --quant_fused --tag r3q_32k4_gfused
# short region: compressed cap-2048 snapkv + kivi4, default vs fused
$P --methods snapkv --quant_method kivi --nbits 4 --lm_head_pad 4096 \
    --ctx 32768 --cap 2048 --max_new 64 --tag r3q_short_ctl
$P --methods snapkv --quant_method kivi --nbits 4 --lm_head_pad 4096 \
    --ctx 32768 --cap 2048 --max_new 64 --quant_fused --tag r3q_short_fused
