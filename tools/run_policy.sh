#!/bin/bash
# Policy-space grid outcomes for the shipped preset pairing across draws
# (VERDICT r4 missing #2 / next #3): evaluate --policy --monitor replays each
# cell's per-sample L1 statuses + min-gated composed anomalies through the
# trust scan at 30 Hz and reports per-cell policy time-shares, time-to-BLOCKED
# and allowed-wrong share (fav_tpu/core/policy_replay.py).
#
# One run per draw on the draw's own std predictor + nano monitor. Skip-if-
# done so an interrupted run resumes. Run AFTER tools/run_heldout.sh A.
set -euo pipefail
cd "$(dirname "$0")/.."

policy_grid() {
  local d=$1 std=$2 nano=$3
  local out=measurements/r5/policy_draw$d.json
  export FAV_SYNTH_DRAW=$d
  [ -f "$out" ] && return 0
  echo "=== draw $d: policy grid (std+nano gated)"
  python -m fav_tpu.models.evaluate --checkpoint "$std" --monitor "$nano" \
    --policy --out "$out" > "measurements/r5/eval_policy_draw$d.log" 2>&1
}

policy_grid 0 fav_tpu/checkpoints/student_std fav_tpu/checkpoints/student_nano
policy_grid 1 measurements/r4/draw1/student_std measurements/r4/draw1/student_nano
policy_grid 2 measurements/r4/draw2/student_std measurements/r4/draw2/student_nano
policy_grid 3 measurements/r5/draw3/student_std measurements/r5/draw3/student_nano
policy_grid 4 measurements/r5/draw4/student_std measurements/r5/draw4/student_nano
echo "POLICY RUNS DONE"
