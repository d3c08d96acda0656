#!/usr/bin/env bash
# Serialized chip-measurement queue for the round-4 wrap-up. Waits for the
# A/B-arms queue (pidfile /tmp/chipqueue.pid) to drain, then runs, in order:
#   1. viz_probe on the flagship run dir — component timings of the fused
#      val-interval viz program (first measurement of the batched-pallas
#      edge overlay on the chip)
#   2. interval_probe — 150-epoch flagship-shaped training segment to
#      re-measure the per-val-interval absorption end-to-end
#   3. bench.py confirmation at the committed defaults
set -e
cd "$(dirname "$0")/.."

if [ -f /tmp/chipqueue.pid ]; then
  while kill -0 "$(cat /tmp/chipqueue.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== chip queue drained; starting measurements ($(date)) ==="

echo "=== 1. viz_probe (flagship ckpt) ==="
python scripts/viz_probe.py --run runs/synthetic/dtu_shaped_r4 \
  2>&1 | tee /tmp/viz_probe_r4.log

echo "=== 2. interval probe (150-epoch flagship-shaped segment) ==="
rm -rf runs/synthetic/interval_probe
python trainer.py -t interval_probe -c probe/interval_probe.yml \
  -d synthetic/dtu_shaped.yml 2>&1 | tail -20

echo "=== 3. bench.py confirmation ==="
timeout 900 python bench.py 2>&1 | tee /tmp/bench_r4_final.log

echo "=== postqueue_r4 done ($(date)) ==="
