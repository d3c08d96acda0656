#!/usr/bin/env bash
# Flagship wall-clock re-demonstration: the EXACT dtu_shaped schedule that
# took 98 min in runs/synthetic/dtu_shaped_r4, re-run after the round's two
# wall-clock fixes (batched-pallas edge overlay -> val-interval absorption
# below noise; AOT executable cache -> first window ~1.5 min). Waits for the
# followqueue (vmap arm) to drain. Expected ~55-60 min train + final eval.
set -e
cd "$(dirname "$0")/.."

if [ -f /tmp/followqueue_r4.pid ]; then
  while kill -0 "$(cat /tmp/followqueue_r4.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== followqueue drained; starting flagship r4b ($(date)) ==="

rm -rf runs/synthetic/dtu_shaped_r4b
python trainer.py -t dtu_shaped_r4b -c synthetic/dtu_shaped.yml
python scripts/eval_mesh_chamfer.py --run runs/synthetic/dtu_shaped_r4b

echo "=== flagship r4b done ($(date)) ==="
