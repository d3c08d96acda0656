#!/usr/bin/env bash
# Second serialized chip queue for the round-4 wrap-up. Waits for
# postqueue_r4 (pidfile /tmp/postqueue_r4.pid) to drain, then runs:
#   1. viz_probe (API fix landed after postqueue's attempt crashed) —
#      component timings of the fused val-interval viz program
#   2. trace_bench at the committed defaults (compact DIV=16) — fresh
#      top-op table to pick the next kernel target
#   3. vmap-executor protocol probe (12 epochs, DBW_SEED_EXEC=vmap,
#      dense fallback) — the other half of the seed-executor A/B whose
#      map arm measured 6.05 seed-steps/s (BENCH_NOTES)
set -e
cd "$(dirname "$0")/.."

if [ -f /tmp/postqueue_r4.pid ]; then
  while kill -0 "$(cat /tmp/postqueue_r4.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== postqueue drained; starting follow-up measurements ($(date)) ==="

echo "=== 1. viz_probe (flagship ckpt, fixed) ==="
timeout 1800 python scripts/viz_probe.py --run runs/synthetic/dtu_shaped_r4 \
  2>&1 | tee /tmp/viz_probe_r4b.log || echo "viz_probe FAILED (rc $?)"

echo "=== 2. trace_bench at committed defaults ==="
timeout 1800 python scripts/trace_bench.py --steps 3 --top 40 \
  2>&1 | tee /tmp/trace_r4.log || echo "trace_bench FAILED (rc $?)"

echo "=== 3. vmap-executor protocol probe ==="
rm -rf runs/synthetic/proto_probe_vmap
DBW_SEED_EXEC=vmap timeout 3600 python scripts/multi_pipeline.py \
  -t proto_probe_vmap -c probe/proto_probe_vmap.yml \
  -d synthetic/dtu_shaped.yml --n-traj-videos 0 \
  2>&1 | tee /tmp/proto_vmap.log || echo "vmap probe FAILED (rc $?)"

echo "=== followqueue_r4 done ($(date)) ==="
