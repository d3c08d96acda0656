#!/bin/bash
# Standardize DTU GT clouds for the MBF fitter (reference: scripts/mbf_pproc.sh)
set -e
python -m dbw_tpu.eval.baselines process -n mbf -t "${tag:?set tag=...}" ${filter:+-f}
