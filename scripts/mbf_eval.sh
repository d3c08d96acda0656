#!/bin/bash
# Evaluate MBF box fits on DTU (reference: scripts/mbf_eval.sh)
set -e
python -m dbw_tpu.eval.baselines mbf -t "${tag:?set tag=...}" ${mbf_tag:+-e "$mbf_tag"}
