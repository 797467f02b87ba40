#!/usr/bin/env bash
# Full method x capacity grid (reference: scripts/scripts_longBench/
# eval_methods.sh sweeps capacities 64..4096).
set -euo pipefail
MODEL_PATH=${1:?model_path}
SAVE_DIR=${2:-results_long_bench}
for CAP in 64 96 128 256 512 1024 2048 4096; do
  for METHOD in fullkv random snapkv streamingllm h2o pyramidkv cam l2norm think adakv; do
    scripts/longbench.sh "$MODEL_PATH" "$METHOD" "$CAP" "$SAVE_DIR"
  done
done
