#!/bin/bash
# r4l: int8xint8 MXU dots on code planes vs the bf16 factored pattern.
set -x
env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_r4l_int8dot_probe.py
echo "R4L ALL DONE"
