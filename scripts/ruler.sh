#!/usr/bin/env bash
# RULER wrapper (reference: scripts/scripts_ruler/eval.sh).
# Usage: scripts/ruler.sh <model_path> <method> <capacity> [ctx_len] [save_dir]
set -euo pipefail
MODEL_PATH=${1:?model_path}
METHOD=${2:-fullkv}
CAPACITY=${3:-128}
CTX=${4:-4096}
SAVE_DIR=${5:-results_ruler}
shift $(( $# > 5 ? 5 : $# ))
python -m pyramidkv_tpu.runners.run_ruler \
  --model_path "$MODEL_PATH" --method "$METHOD" \
  --max_capacity_prompts "$CAPACITY" --context_lengths "$CTX" \
  --save_dir "$SAVE_DIR" "$@"
