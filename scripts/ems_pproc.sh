#!/bin/bash
# Standardize DTU GT clouds for the EMS fitter (reference: scripts/ems_pproc.sh)
set -e
python -m dbw_tpu.eval.baselines process -n ems -t "${tag:?set tag=...}" ${filter:+-f}
