#!/bin/bash
# r5f: the accuracy rig ON-CHIP (VERDICT r4 next #1) — train the tiny
# retrieval model on synthetic needle/multikey data, then run the REAL
# needle harness over the method x capacity grid + the RULER-style
# multikey eval, all in ONE process.  Results (per-cell JSONs, heatmap
# PNGs, checkpoint) land under the REPO so they can be committed.
set -x
env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/r5_accuracy_rig.py \
  --steps 4000 --seq_len 2048 --batch 16 --lr 1e-3 \
  --ckpt /root/repo/data/tiny_retrieval.npz \
  --results_dir /root/repo/results_needle_tiny
echo "R5F ALL DONE"
