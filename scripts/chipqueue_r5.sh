#!/usr/bin/env bash
# Serialized chip-measurement queue for round 5 (one real TPU via axon).
# Waits for the verify bench (pidfile /tmp/verify_chip_r5.pid), then:
#   1. sp_band_probe — the measured per-band grad-step ladder the
#      north-star accounting was missing (VERDICT r4 next #2)
#   2. bench.py under DBW_COMPACT_REMAT=stream — the remat-tax lever
#      A/B against the verify bench's default arm (VERDICT r4 next #5)
#   3. banded training for 200 real steps at flagship shape
#      (VERDICT r4 next #3, single-chip arm)
#   4. 2-seed protocol re-run at HEAD so the multi-seed final eval
#      exercises the fixed u8/fast-path pipeline (VERDICT r4 next #6)
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/round5

if [ -f /tmp/verify_chip_r5.pid ]; then
  while kill -0 "$(cat /tmp/verify_chip_r5.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== chip free; starting round-5 queue ($(date)) ==="

echo "=== 0. bench.py, default remat policy (A arm for stage 2) ==="
timeout 900 python bench.py \
  2>&1 | tee artifacts/round5/bench_default.log || echo "default bench FAILED (rc $?)"

echo "=== 1. sp band ladder (measured, worst-band offset, both phases) ==="
timeout 3600 python scripts/sp_band_probe.py \
  2>&1 | tee artifacts/round5/sp_band_probe.log || echo "sp_band_probe FAILED (rc $?)"

echo "=== 2. bench.py, stream remat policy ==="
DBW_COMPACT_REMAT=stream timeout 900 python bench.py \
  2>&1 | tee artifacts/round5/bench_remat_stream.log || echo "stream bench FAILED (rc $?)"

echo "=== 3. banded training, 200 real steps at flagship shape ==="
timeout 3600 python scripts/sp_train_probe.py --mode banded --steps 200 \
  --out runs/synthetic/sp_train_banded_chip.tsv \
  2>&1 | tee artifacts/round5/sp_train_banded.log || echo "banded probe FAILED (rc $?)"

echo "=== 4. 2-seed protocol at HEAD (full final-eval surface) ==="
rm -rf runs/synthetic/proto_r5
timeout 5400 python scripts/multi_pipeline.py \
  -t proto_r5 -c probe/proto_probe.yml -d synthetic/dtu_shaped.yml \
  --n-seeds 2 --n-traj-videos 2 \
  2>&1 | tee /tmp/proto_r5.log || echo "protocol FAILED (rc $?)"

echo "=== chipqueue_r5 done ($(date)) ==="
