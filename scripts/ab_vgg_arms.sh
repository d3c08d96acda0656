#!/usr/bin/env bash
# Random-VGG sensitivity study (VERDICT r3 #5): three directly-comparable
# 300-epoch arms on the flagship DTU-shaped synthetic scene.
#   arm A  perceptual OFF                (configs/synthetic/ab_nopercep.yml)
#   arm B  random-VGG, filter seed 0     (configs/synthetic/dtu_shaped_p300.yml)
#   arm C  random-VGG, filter seed 1     (configs/synthetic/ab_vggseed1.yml)
# Each arm then gets a mesh-vs-GT chamfer row. Runs serially (one chip).
set -e
cd "$(dirname "$0")/.."

run_arm() {
  tag=$1; cfg=$2
  echo "=== arm $tag ($cfg) ==="
  python trainer.py -t "$tag" -c "synthetic/$cfg" -d synthetic/dtu_shaped.yml
  python scripts/eval_mesh_chamfer.py --run "runs/synthetic/$tag"
}

run_arm ab_nopercep ab_nopercep.yml
run_arm ab_vgg_s0 ab_vgg_s0.yml
run_arm ab_vgg_s1 ab_vggseed1.yml

echo "=== summary ==="
for t in ab_nopercep ab_vgg_s0 ab_vgg_s1; do
  echo "--- $t"
  cat "runs/synthetic/$t/final_scores.tsv"
  cat "runs/synthetic/$t/mesh_scores.tsv" 2>/dev/null || true
done
