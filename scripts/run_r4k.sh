#!/bin/bash
# r4k: speed-of-light HBM read probes (closing attributions for the
# quant-region and int4-weight decode ceilings at the "achievable" bar).
set -x
env PYTHONPATH=$SNAP:/root/.axon_site python -u $SNAP/scripts/tpu_r4k_sol_probe.py
echo "R4K ALL DONE"
