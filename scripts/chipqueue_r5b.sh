#!/bin/bash
# Round-5 post-flagship chip queue: runs after the fresh flagship run
# (dtu_shaped_r5, /tmp/flagship_r5.pid) releases the chip.
#
# 1. scores-only final-eval wall-clock (north-star accounting): eval-only
#    resume of dtu_shaped_r5 with render_videos: false — the surface the
#    <=20-min budget pays for (final_scores + mesh chamfer + textures/OBJ/
#    per-view renders, no 240-frame videos).
# 2. bench.py at final HEAD: confirms steps/s and warms the AOT executable
#    cache so the driver's end-of-round bench run is warm.
set -u
cd "$(dirname "$0")/.."

if [ -f /tmp/flagship_r5.pid ]; then
  pid=$(cat /tmp/flagship_r5.pid)
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
fi

echo "== scores-only eval-resume (render_videos: false) =="
t0=$SECONDS
timeout 3600 python trainer.py -t dtu_shaped_r5scores \
  -c synthetic/dtu_shaped_scoreseval.yml 2>&1 | tail -20
echo "scores-only eval wall: $((SECONDS - t0)) s"

echo "== bench confirm at HEAD =="
timeout 3600 python bench.py 2>&1 | tail -3
