#!/bin/bash
# Bulk config editing helper (reference: scripts/set_params.sh — a yq loop
# over configs). Usage:
#   ./scripts/set_params.sh '<python-dict-path>' '<value>' [glob]
# e.g. ./scripts/set_params.sh model.loss.tv_weight 0.2 'configs/dtu/*.yml'
set -e
KEY=${1:?usage: set_params.sh KEY VALUE [GLOB]}
VALUE=${2:?usage: set_params.sh KEY VALUE [GLOB]}
GLOB=${3:-configs/dtu/*.yml}
python - "$KEY" "$VALUE" $GLOB <<'EOF'
import sys, yaml
key, value = sys.argv[1], yaml.safe_load(sys.argv[2])
for path in sys.argv[3:]:
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    d = cfg
    parts = key.split(".")
    for p in parts[:-1]:
        d = d.setdefault(p, {})
    d[parts[-1]] = value
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    print(f"{path}: {key} = {value}")
EOF
