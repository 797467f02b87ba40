#!/usr/bin/env bash
# LongBench sweep wrapper (counterpart of the reference's
# scripts/scripts_longBench/eval.sh positional-arg wrapper).
# Usage: scripts/longbench.sh <model_path> <method> <capacity> [save_dir] [data_dir]
set -euo pipefail
MODEL_PATH=${1:?model_path}
METHOD=${2:-fullkv}
CAPACITY=${3:-128}
SAVE_DIR=${4:-results_long_bench}
DATA_DIR=${5:-data/LongBench}
shift $(( $# > 5 ? 5 : $# ))
python -m pyramidkv_tpu.runners.run_longbench \
  --model_path "$MODEL_PATH" --method "$METHOD" \
  --max_capacity_prompts "$CAPACITY" \
  --save_dir "$SAVE_DIR" --data_dir "$DATA_DIR" "$@"
