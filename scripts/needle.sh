#!/usr/bin/env bash
# Needle-in-a-haystack wrapper (reference: scripts/scripts_needle/eval.sh;
# logs tee'd like the reference).
# Usage: scripts/needle.sh <model_path> <method> <capacity> [s_len] [e_len]
set -euo pipefail
MODEL_PATH=${1:?model_path}
METHOD=${2:-fullkv}
CAPACITY=${3:-128}
S_LEN=${4:-1000}
E_LEN=${5:-8000}
shift $(( $# > 5 ? 5 : $# ))
mkdir -p results_needle/logs
python -m pyramidkv_tpu.runners.run_needle \
  --model_path "$MODEL_PATH" --method "$METHOD" \
  --max_capacity_prompts "$CAPACITY" -s "$S_LEN" -e "$E_LEN" "$@" \
  2>&1 | tee "results_needle/logs/$(basename "$MODEL_PATH")_${METHOD}_${CAPACITY}.log"
