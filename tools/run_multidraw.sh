#!/bin/bash
# Multi-draw validation of the quality conclusions (VERDICT r3 next-round #1).
#
# For each independent synthetic draw (FAV_SYNTH_DRAW — different generator
# seed AND perturbed generator recipe, fav_tpu/data/cifar.py:DRAWS), retrain
# the two load-bearing recipes from scratch and re-run the 15x5 grid:
#   * the deployed-student pipeline: plain 5-member ensemble teacher
#     (2000 steps) -> AugMix-KD nano student (widths 16,32,64, 3000 steps)
#     — exactly the shipped student_nano recipe (its metadata.json),
#   * classifier_occl: single model, AugMix+occlusion, 3000 steps.
# The cross-draw BENCH table then tests whether the round-3 conclusions
# (occl > student on accuracy, student honest where wrong, snow-sev5 floor)
# are properties of the method or of one generator instance (the reference's
# evidence-backed-claims methodology, reference docs/system_notes.md:199-229).
set -euo pipefail
cd "$(dirname "$0")/.."

for d in "$@"; do
  export FAV_SYNTH_DRAW=$d
  R=measurements/r4/draw$d
  mkdir -p "$R"
  echo "=== draw $d: teacher ensemble"
  python -m fav_tpu.models.pretrain --ensemble 5 --steps 2000 --megastep 100 \
    --out "$R/ensemble" > "$R/train_ensemble.log" 2>&1
  echo "=== draw $d: AugMix-KD nano student"
  python -m fav_tpu.models.pretrain --distill-ensemble --augmix \
    --widths 16,32,64 --steps 3000 --megastep 100 \
    --teacher "$R/ensemble" --out "$R/student_nano" > "$R/train_student.log" 2>&1
  echo "=== draw $d: occlusion classifier"
  python -m fav_tpu.models.pretrain --occlude --steps 3000 --megastep 100 \
    --out "$R/classifier_occl" > "$R/train_occl.log" 2>&1
  echo "=== draw $d: grids"
  python -m fav_tpu.models.evaluate --checkpoint "$R/student_nano" \
    --out "$R/grid_student.json" > "$R/eval_student.log" 2>&1
  python -m fav_tpu.models.evaluate --checkpoint "$R/classifier_occl" \
    --out "$R/grid_occl.json" > "$R/eval_occl.log" 2>&1
  python -m fav_tpu.models.evaluate --checkpoint "$R/ensemble" --ensemble 5 \
    --out "$R/grid_ensemble.json" > "$R/eval_ensemble.log" 2>&1
  # the production preset, per draw: occl champion min-gated by that draw's
  # independent student monitor (BENCH.md "Defense in depth")
  python -m fav_tpu.models.evaluate --checkpoint "$R/classifier_occl" \
    --monitor "$R/student_nano" \
    --out "$R/grid_occl_gated.json" > "$R/eval_gated.log" 2>&1
  # feature-space failure scores (RMD/Mahalanobis) on that draw's student
  python -m fav_tpu.models.evaluate --checkpoint "$R/student_nano" --maha \
    --out "$R/grid_student_maha.json" > "$R/eval_maha.log" 2>&1
  echo "=== draw $d done"
done
echo "ALL DRAWS DONE"
echo "aggregate: python tools/multidraw_report.py --json measurements/r4/multidraw_report.json"
echo "L1 cross-check: python tools/defense_in_depth.py --json measurements/r4/defense_in_depth.json"
