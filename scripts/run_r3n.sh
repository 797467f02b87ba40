#!/bin/bash
set -x
P="env PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/tpu_bench.py"
# gateup-friendly out tile (14336 % 3584 == 0 -> n_o=4): last flagship probe
$P --methods snapkv --ctx 4096 --blocks 2048 3584 --sub_in 512 --tag r3n_t3584
# final defaults row for provenance
$P --methods snapkv --ctx 4096 --tag r3n_default
