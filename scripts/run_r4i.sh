#!/bin/bash
# r4i: prefix-caching measurement (Engine.precompute_prefix — new in r4)
#  (a) generate()-mode A/B at 32k: 24k shared prefix, chunk 8192 —
#      expect prefill ~5.2 s -> ~1.5 s (8k suffix + scatter).
#  (b) serving A/B: 8 x 32k same-prefix requests through the CB with
#      chunked refills — wall + TTFT percentiles ctl vs cached.
#  (c) 64k kivi2-pa row (the one fullkv KIVI width without a post-flip
#      64k number).
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
$P --methods snapkv --ctx 32768 --max_new 128 --prefill_chunk 8192 \
   --prefix_tokens 24576 --repeats 2 --tag r4i_gen32k
$P --serving 8 --methods snapkv --ctx 32768 --lanes 4 --prefill_chunk 8192 \
   --prefix_tokens 24576 --max_new 128 --tag r4i_srv32k
$P --methods fullkv --ctx 65536 --nbits 2 --max_new 128 --lm_head_pad 4096 \
   --quant_method kivi --q_layout pa --repeats 2 --tag r4i_64k_k2
# (d) kivi8-128k capacity probe under the post-flip chunked scan: the
#     factored default now COMPILES but hits a runtime ResourceExhausted
#     during decode (r4h) — the scan's slice-level code reads avoid the
#     whole-buffer bf16 unpack transients.
$P --methods fullkv --ctx 131072 --prefill_chunk 8192 --nbits 8 \
   --max_new 32 --lm_head_pad 4096 --quant_method kivi --q_layout pa \
   --quant_scan --repeats 1 --tag r4i_128k_k8_scan
echo "R4I ALL DONE"
