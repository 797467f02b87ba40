#!/bin/bash
# Stall-watchdog for the r5f accuracy rig: the axon tunnel hangs a
# long-running process every ~20-40 min (logs/tpu_r5f.log step 900,
# tpu_r5f2.log step 2525 — CPU time frozen, log idle).  Training
# checkpoints every scan chunk and NeedleTester skips existing result
# cells, so kill-and-restart resumes with minimal loss.  Idle log
# >600 s => stall (the rig prints per-cell needle status lines).
LOG=${LOG:-/root/repo/logs/tpu_r5f_run.log}
for i in $(seq 1 10); do
  echo "[supervisor] attempt $i $(date)" >> "$LOG"
  env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/r5_accuracy_rig.py \
      ${RIG_ARGS:---steps 4000 --seq_len 2048 --batch 16 --lr 1e-3} \
      --ckpt ${CKPT:-/root/repo/data/tiny_retrieval.npz} \
      --results_dir ${RESULTS:-/root/repo/results_needle_tiny} >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt 600 ]; then
      echo "[supervisor] stall: log idle ${AGE}s, killing $PID" >> /tmp/r5f_sup.log
      kill $PID; sleep 10; kill -9 $PID 2>/dev/null
      break
    fi
  done
  wait $PID 2>/dev/null
  grep -q "\[rig\] ALL DONE" "$LOG" && { echo "[supervisor] DONE" >> "$LOG"; break; }
  sleep 15
done
