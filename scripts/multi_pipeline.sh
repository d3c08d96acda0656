#!/bin/bash
# 5-seed protocol: runs all seeds as ONE seed-parallel program (TPU-native
# replacement for the reference's 5 sequential sed-patched runs).
set -e
if ! [[ ${tag:0:1} =~ ^[0-9] ]]; then
    run_tag="$(date +"%m%d")_$tag"
else
    run_tag=$tag
fi
python scripts/multi_pipeline.py --tag "$run_tag" --config "$config" \
    ${default:+--default "$default"} --n-seeds "${n_seeds:-5}"
