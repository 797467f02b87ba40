#!/bin/bash
# r3p: factored dequant attention (quant_region_attention_fused) vs the
# chunked XLA scan on long KIVI regions (d32 int4+lm4 weights).
#   1. 64k fullkv kivi4: control (group/scan) vs group+fused vs pa
#   2. 64k kivi8 + kivi2 pa
#   3. 32k kivi4 pa (vs known 50.7 group control, r3m)
set -x
P="env PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/tpu_bench.py"
Q="--methods fullkv --quant_method kivi --max_new 64 --lm_head_pad 4096"
$P $Q --ctx 65536 --nbits 4 --tag r3p_64k4_ctl
$P $Q --ctx 65536 --nbits 4 --quant_fused --tag r3p_64k4_gfused
$P $Q --ctx 65536 --nbits 4 --q_layout pa --tag r3p_64k4_pa
$P $Q --ctx 65536 --nbits 8 --q_layout pa --tag r3p_64k8_pa
$P $Q --ctx 65536 --nbits 2 --q_layout pa --tag r3p_64k2_pa
$P $Q --ctx 32768 --nbits 4 --q_layout pa --tag r3p_32k4_pa
