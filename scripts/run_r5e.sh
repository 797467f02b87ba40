#!/bin/bash
# r5e: the bounded exp-avoidance experiment on the prefill flash ceiling
# (VERDICT r4 weak #6 / next #7): two-pass max-then-exp with rescale-free
# accumulation (EngineSpec.prefill_two_pass).  Done = >=1.15x 32k prefill
# (5.1 -> <=4.4 s) or a measured negative recorded in BASELINE.
# Control legs re-measured in the SAME process for a fair pair.
set -x
P="env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_bench.py"
Q="--methods snapkv --max_new 16 --lm_head_pad 4096 --repeats 3"
$P $Q --ctx 32768 --tag r5e_32k_ctl
$P $Q --ctx 32768 --two_pass --tag r5e_32k_2p
$P $Q --ctx 65536 --tag r5e_64k_ctl
$P $Q --ctx 65536 --two_pass --tag r5e_64k_2p
echo "R5E ALL DONE"
