#!/bin/bash
# Single-run pipeline: config=<path under configs/> tag=<run tag> ./scripts/pipeline.sh
# (env-var contract mirrors the reference's scripts/pipeline.sh)
set -e
if ! [[ ${tag:0:1} =~ ^[0-9] ]]; then
    run_tag="$(date +"%m%d")_$tag"
else
    run_tag=$tag
fi
python -m dbw_tpu.train.trainer --tag "$run_tag" --config "$config" ${default:+--default "$default"}
