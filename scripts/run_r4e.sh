#!/bin/bash
# r4e:
#  (1) pyramidkv 128k/32k at max_new=128: the r4c/r4d 20.9/37.1 readings
#      are a per-generate-call tunnel artifact on the 16-buffer segmented
#      cache (profiled decode loop runs 6.6 ms/step); max_new=128
#      amortizes it like every historical row.
#  (2) flash l-sum-on-MXU A/B (PKV_FLASH_LSUM_MXU) at 32k.
#  (3) factored-quant multiplane A/B (PKV_QUANT_MULTIPLANE) at 64k kivi4
#      and 128k kivi2 (per=4: most einsums saved).
#  (4) 32k prefill per-op profile + 64k kivi4-pa decode profile (closing
#      attributions for VERDICT #1/#4).
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
$P --methods pyramidkv snapkv --ctx 32768 --max_new 128 --repeats 1 --tag r4e_32k_mn128
$P --methods pyramidkv --ctx 131072 --max_new 128 --repeats 1 --tag r4e_128k_pyr_mn128
$P --methods snapkv --ctx 32768 --max_new 16 --repeats 2 --prefill_block 1024 --tag r4e_lsum_ctl
env PKV_FLASH_LSUM_MXU=1 PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py \
   --methods snapkv --ctx 32768 --max_new 16 --repeats 2 --prefill_block 1024 --tag r4e_lsum_mxu
Q="--methods fullkv --max_new 128 --lm_head_pad 4096 --quant_method kivi --q_layout pa --repeats 1"
$P $Q --ctx 65536 --nbits 4 --tag r4e_mp_ctl_64k4
env PKV_QUANT_MULTIPLANE=1 PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py \
   $Q --ctx 65536 --nbits 4 --tag r4e_mp_on_64k4
$P $Q --ctx 131072 --prefill_chunk 8192 --nbits 2 --tag r4e_mp_ctl_128k2
env PKV_QUANT_MULTIPLANE=1 PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py \
   $Q --ctx 131072 --prefill_chunk 8192 --nbits 2 --tag r4e_mp_on_128k2
# kivi8 128k: decode-entry relayout copy is the capacity blocker (r4d);
# the chunked-scan counterfactual relayouts slice-level only (GROUP
# layout: the pa scale shapes fit no path but the fused one)
$P --methods fullkv --max_new 128 --lm_head_pad 4096 --quant_method kivi \
   --repeats 1 --ctx 131072 --prefill_chunk 8192 --nbits 8 --quant_scan \
   --tag r4e_k8_128k_scan
# kivi8 64k AUTO sanity (r3q fused: 71.4 tok/s)
$P $Q --ctx 65536 --nbits 8 --tag r4e_k8_64k_auto
env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_prefill_profile.py
$P --methods fullkv --ctx 65536 --max_new 32 --repeats 1 --lm_head_pad 4096 \
   --quant_method kivi --nbits 4 --q_layout pa \
   --profile /root/repo/logs/r4e_k4pa64k_trace --tag r4e_k4pa64k_prof
# does the per-call overhead hit CB decode quanta on segmented caches?
$P --serving 8 --ctx 32768 --lanes 4 --quantum 16 --methods pyramidkv \
   --prefill_chunk 8192 --tag r4e_cb_pyr32k
echo "R4E ALL DONE"
