#!/bin/bash
# All 10 DTU eval scans (reference: scripts/dtu.sh).
#
# Default: sequential per-scan pipelines (reference behavior).
# sharded=1: ALL scans as ONE (scene, seed, data)-sharded program
#            (scripts/multi_scene_pipeline.py) — on a multi-chip mesh each
#            scan gets its own device group; on one chip the scans still
#            amortize dispatch as a single compiled program.
set -e
SCANS="24 31 40 45 55 59 63 75 83 105"
if [ "${sharded}" = "1" ]; then
    cfgs=""
    for id in $SCANS; do cfgs="$cfgs dtu/scan${id}.yml"; done
    python scripts/multi_scene_pipeline.py -t "${tag:-dtu_sweep}" -c $cfgs \
        ${n_seeds:+--n-seeds $n_seeds} ${n_data:+--n-data $n_data} \
        ${resume:+--resume}
else
    for id in $SCANS; do
        tag=${tag}_scan${id} config=dtu/scan${id}.yml ./scripts/pipeline.sh
    done
fi
