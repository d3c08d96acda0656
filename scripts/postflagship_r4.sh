#!/usr/bin/env bash
# After the flagship r4b wall-clock demo: (1) band-height scaling probe on
# the chip (substantiates the sp-axis projection with measured per-band
# cost, incl. the worst/center band), (2) viz_probe re-run to measure the
# per-face-constant synthetic fast path (was 595 ms).
set -e
cd "$(dirname "$0")/.."

if [ -f /tmp/flagship_r4b.pid ]; then
  while kill -0 "$(cat /tmp/flagship_r4b.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== flagship drained; starting post-flagship probes ($(date)) ==="

echo "=== 1. sp band scaling probe ==="
timeout 3000 python scripts/sp_band_probe.py 2>&1 | tee /tmp/sp_band_probe.log

echo "=== 2. viz_probe (syn fast path) ==="
timeout 1800 python scripts/viz_probe.py --run runs/synthetic/dtu_shaped_r4b \
  2>&1 | tee /tmp/viz_probe_r4c.log

echo "=== postflagship_r4 done ($(date)) ==="
