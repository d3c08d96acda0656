#!/bin/bash
# Evaluate EMS superquadric fits on DTU (reference: scripts/ems_eval.sh)
set -e
python -m dbw_tpu.eval.baselines ems -t "${tag:?set tag=...}" ${ems_tag:+-e "$ems_tag"}
