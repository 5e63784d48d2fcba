#!/bin/bash
# Round-5 pre-registered validation runs (measurements/r5/preset_prereg.md).
#
# Part A — held-out draws 3/4 (bars frozen BEFORE training): per draw, train
# the exact shipped recipes from scratch (teacher ensemble -> nano student and
# std student; occl comparator) and grid the shipped preset pairing
# (std predictor + nano monitor) next to the occl pairing.
#
# Part B — secondary arm on the selection draws 0/1/2: an independent-seed
# standardized monitor (student_std2, seed 1) under the std predictor, to
# MEASURE the std+std2 pairing that round 4 rejected on argument.
#
# Usage: tools/run_heldout.sh A        # draws 3 and 4 (part A)
#        tools/run_heldout.sh B        # std2 monitors on draws 0/1/2 (part B)
set -euo pipefail
cd "$(dirname "$0")/.."

run_draw() {
  local d=$1
  export FAV_SYNTH_DRAW=$d
  local R=measurements/r5/draw$d
  mkdir -p "$R"
  # every stage is skip-if-done so an interrupted run resumes cleanly
  if [ ! -f "$R/ensemble/metadata.json" ]; then
    echo "=== draw $d: teacher ensemble"
    python -m fav_tpu.models.pretrain --ensemble 5 --steps 2000 --megastep 100 \
      --out "$R/ensemble" > "$R/train_ensemble.log" 2>&1
  fi
  if [ ! -f "$R/student_nano/metadata.json" ]; then
    echo "=== draw $d: AugMix-KD nano student (monitor)"
    python -m fav_tpu.models.pretrain --distill-ensemble --augmix \
      --widths 16,32,64 --steps 3000 --megastep 100 \
      --teacher "$R/ensemble" --out "$R/student_nano" > "$R/train_student.log" 2>&1
  fi
  if [ ! -f "$R/student_std/metadata.json" ]; then
    echo "=== draw $d: standardized AugMix-KD nano student (predictor)"
    python -m fav_tpu.models.pretrain --distill-ensemble --augmix --standardize \
      --widths 16,32,64 --steps 3000 --megastep 100 \
      --teacher "$R/ensemble" --out "$R/student_std" > "$R/train_student_std.log" 2>&1
  fi
  if [ ! -f "$R/classifier_occl/metadata.json" ]; then
    echo "=== draw $d: occlusion classifier (comparator)"
    python -m fav_tpu.models.pretrain --occlude --steps 3000 --megastep 100 \
      --out "$R/classifier_occl" > "$R/train_occl.log" 2>&1
  fi
  echo "=== draw $d: grids"
  [ -f "$R/grid_student.json" ] || \
  python -m fav_tpu.models.evaluate --checkpoint "$R/student_nano" \
    --out "$R/grid_student.json" > "$R/eval_student.log" 2>&1
  [ -f "$R/grid_occl.json" ] || \
  python -m fav_tpu.models.evaluate --checkpoint "$R/classifier_occl" \
    --out "$R/grid_occl.json" > "$R/eval_occl.log" 2>&1
  # the SHIPPED preset pairing: std predictor min-gated by nano monitor
  [ -f "$R/grid_std_gated.json" ] || \
  python -m fav_tpu.models.evaluate --checkpoint "$R/student_std" \
    --monitor "$R/student_nano" \
    --out "$R/grid_std_gated.json" > "$R/eval_std_gated.log" 2>&1
  # comparator pairing for bar 3
  [ -f "$R/grid_occl_gated.json" ] || \
  python -m fav_tpu.models.evaluate --checkpoint "$R/classifier_occl" \
    --monitor "$R/student_nano" \
    --out "$R/grid_occl_gated.json" > "$R/eval_occl_gated.log" 2>&1
  echo "=== draw $d done"
}

run_std2() {
  local d=$1 teacher=$2 std=$3
  export FAV_SYNTH_DRAW=$d
  local R=measurements/r5/std2_draw$d
  mkdir -p "$R"
  if [ ! -f "$R/student_std2/metadata.json" ]; then
    echo "=== draw $d: independent-seed standardized monitor (seed 1)"
    python -m fav_tpu.models.pretrain --distill-ensemble --augmix --standardize \
      --widths 16,32,64 --steps 3000 --megastep 100 --seed 1 \
      --teacher "$teacher" --out "$R/student_std2" > "$R/train_std2.log" 2>&1
  fi
  echo "=== draw $d: std+std2 gated grid"
  [ -f "$R/grid_std_std2.json" ] || \
  python -m fav_tpu.models.evaluate --checkpoint "$std" \
    --monitor "$R/student_std2" \
    --out "$R/grid_std_std2.json" > "$R/eval_std_std2.log" 2>&1
}

case "${1:-A}" in
  A)
    run_draw 3
    run_draw 4
    echo "PART A DONE"
    ;;
  B)
    run_std2 0 fav_tpu/checkpoints/ensemble fav_tpu/checkpoints/student_std
    run_std2 1 measurements/r4/draw1/ensemble measurements/r4/draw1/student_std
    run_std2 2 measurements/r4/draw2/ensemble measurements/r4/draw2/student_std
    echo "PART B DONE"
    ;;
  C)
    # Conditional stage, pre-registered (preset_prereg.md "Secondary arm"):
    # run ONLY if part B wins on all of draws 0/1/2 — the std+std2 pairing
    # must then also pass bars 1-3 on the held-out draws (with a per-draw
    # std2 monitor) before it may replace the shipped monitor.
    run_std2 3 measurements/r5/draw3/ensemble measurements/r5/draw3/student_std
    run_std2 4 measurements/r5/draw4/ensemble measurements/r5/draw4/student_std
    echo "PART C DONE"
    ;;
esac
