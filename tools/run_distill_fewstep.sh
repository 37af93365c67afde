#!/usr/bin/env bash
# Few-step limit of progressive distillation (r03s10b): train the S=8
# positive-control teacher, distill 64 -> 32 -> 16 -> 8 -> 4 -> 2 -> 1,
# then arbitrate the 2- and 1-step students against matched-NFE teacher
# DDIM on the analytic law (tools/distribution_probe.py, unclipped).
#
# Sequential by design: never two TPU processes (axon relay wedges —
# CLAUDE.md). Each stage writes its log under $LOGDIR.
#
# Usage: tools/run_distill_fewstep.sh [WORK_DIR] [LOG_DIR]
set -euo pipefail
WD=${1:-/tmp/s10b}
LOGDIR=${2:-/tmp/s10b_logs}
mkdir -p "$WD" "$LOGDIR"

LAW_ARGS=(--model DiT-XS/4 --input-size 8 --classes 8
          --train-steps 12000 --batch-size 256)

# 1. Teacher: the r03s9 S=8 positive-control law (near-oracle recovery).
# Completion-marker guards (not bare dir-existence): the scripts create their
# output dirs before finishing, so a rerun after a partial failure must redo
# the stage rather than skip it (ADVICE r03).
if [ ! -f "$WD/.teacher_done" ]; then
  python tools/distribution_probe.py --work-dir "$WD" "${LAW_ARGS[@]}" \
    --skip-init-baseline > "$LOGDIR/teacher.log" 2>&1
  tail -1 "$LOGDIR/teacher.log"
  touch "$WD/.teacher_done"
fi
TEACHER=$(ls -d "$WD"/results/* | sort | tail -1)
echo "teacher: $TEACHER"

# 2. Distill all the way down: 6 halvings, 2k updates each.
if [ ! -f "$WD/.distill_done" ]; then
  python distill.py --teacher "$TEACHER" --data-path "$WD/data" \
    --results-dir "$WD/distill" --base-steps 64 --stages 6 \
    --steps-per-stage 2000 --batch-size 256 > "$LOGDIR/distill.log" 2>&1
  grep "saved" "$LOGDIR/distill.log"
  touch "$WD/.distill_done"
fi

# 3. Teacher few-step DDIM rows at the matched NFE (the bar to beat).
for N in 2 1; do
  python tools/distribution_probe.py --work-dir "$WD" "${LAW_ARGS[@]}" \
    --skip-train --skip-init-baseline --sampler ddim \
    --num-sampling-steps "$N" > "$LOGDIR/teacher_ddim$N.log" 2>&1
  tail -1 "$LOGDIR/teacher_ddim$N.log"
done

# 4. Student rows (the probe pins each student's own grid from config).
shopt -s nullglob
STUDENTS=("$WD"/distill/*-distill2 "$WD"/distill/*-distill1)
shopt -u nullglob
if [ ${#STUDENTS[@]} -eq 0 ]; then
  echo "no distill2/distill1 student dirs under $WD/distill" >&2
  exit 1
fi
for D in "${STUDENTS[@]}"; do
  python tools/distribution_probe.py --work-dir "$WD" "${LAW_ARGS[@]}" \
    --skip-train --skip-init-baseline --eval-dir "$D" \
    > "$LOGDIR/eval_$(basename "$D").log" 2>&1
  tail -1 "$LOGDIR/eval_$(basename "$D").log"
done
echo DONE
