#!/usr/bin/env bash
# Endurance leg (VERDICT r03 #9): one long single-chip training session with
# periodic checkpoints + EMA snapshots, a mid-run SIGTERM, and a --resume
# continuation to completion — the preemption/resume path under real chip
# timing rather than the CPU cluster tests.
#
# Phase 1 trains until SIGTERM_AFTER seconds, gets SIGTERM, must flush a
# graceful checkpoint and exit 0. Phase 2 resumes from the experiment dir
# and runs to NUM_STEPS. The script then asserts: both exits clean, a
# preemption checkpoint exists below NUM_STEPS, the final checkpoint is at
# NUM_STEPS, the resumed log continues from the preemption step, and the
# metrics JSONL covers the whole trajectory without a step gap.
#
# Usage: tools/run_endurance.sh [WORK_DIR] [NUM_STEPS] [SIGTERM_AFTER_S] [BATCH]
# (TPU-sequential: nothing else may use the chip.) Defaults sized for the
# axon relay: CLI train runs ~4 steps/s at batch 64 (per-step host batch
# upload dominates — BENCH_NOTES), so 8000 steps ≈ 33 min on chip.
set -euo pipefail
WD=${1:-/tmp/endurance}
STEPS=${2:-8000}
TERM_AFTER=${3:-900}
BATCH=${4:-64}
mkdir -p "$WD"

ARGS=(--data-path synthetic:4096 --results-dir "$WD/results"
      --model DiT-S/2 --num-classes 10 --num-steps "$STEPS"
      --batch-size "$BATCH" --compute-dtype bfloat16
      --log-every 200 --ckpt-every 1000 --ema-snapshot-every 1000
      --num-lin-warmup 100 --start-decay "$STEPS"
      --metrics-jsonl auto)

echo "[endurance] phase 1: train (SIGTERM after ${TERM_AFTER}s)"
python train.py "${ARGS[@]}" > "$WD/phase1.log" 2>&1 &
PID=$!
trap 'kill $PID 2>/dev/null || true' EXIT
sleep "$TERM_AFTER"
kill -0 "$PID" || { echo "trainer died before SIGTERM:"; tail -20 "$WD/phase1.log"; exit 1; }
kill -TERM "$PID"
if wait "$PID"; then echo "[endurance] phase 1 exit 0"; else
  echo "phase 1 non-zero exit"; tail -20 "$WD/phase1.log"; exit 1; fi

EXP=$(ls -d "$WD"/results/* | sort | tail -1)  # NEWEST run — a reused
# WORK_DIR may hold earlier experiments; validating an old one would pass
# the greps against a stale trajectory and resume the wrong run
echo "[endurance] experiment: $EXP"
grep "graceful stop at step" "$EXP/log.txt" || { echo "no graceful stop line"; exit 1; }
PRE_CKPT=$(ls "$EXP/checkpoints" | sort | tail -1)
PRE_STEP=$((10#$(echo "$PRE_CKPT" | grep -o '^[0-9]*')))
echo "[endurance] preemption checkpoint: $PRE_CKPT (step $PRE_STEP)"
[ "$PRE_STEP" -lt "$STEPS" ] || { echo "no mid-run preemption happened"; exit 1; }

echo "[endurance] phase 2: resume to $STEPS"
# --resume loads state + data cursor but keeps run dirs immutable: the
# continuation gets a NEW experiment dir (the next index).
python train.py "${ARGS[@]}" --resume "$EXP" > "$WD/phase2.log" 2>&1
EXP2=$(ls -d "$WD"/results/* | sort | tail -1)
[ "$EXP2" != "$EXP" ] || { echo "no continuation experiment dir"; exit 1; }
grep "resumed from" "$EXP2/log.txt"
grep -q "done!" "$EXP2/log.txt" || { echo "phase 2 did not finish"; exit 1; }
FINAL=$(printf '%07d' "$STEPS")
ls "$EXP2/checkpoints" | grep -q "$FINAL" || { echo "no final checkpoint"; ls "$EXP2/checkpoints"; exit 1; }

python - "$EXP" "$EXP2" "$PRE_STEP" "$STEPS" <<'EOF'
import json, sys
exp, exp2, pre, steps = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
rows = [
    json.loads(l)
    for path in (f"{exp}/metrics.jsonl", f"{exp2}/metrics.jsonl")
    for l in open(path)
    if l.strip()
]
got = [r["step"] for r in rows if "step" in r]
assert got, "empty metrics jsonl"
gaps = [(a, b) for a, b in zip(got, got[1:]) if b - a not in (0, 200, 400)]
assert not gaps, f"step gaps across preemption: {gaps[:5]}"
pre_rows = [r for r in rows if r.get("step", 0) <= pre][-3:]
post_rows = [r for r in rows if r.get("step", 0) > pre][:3]
pl = sum(r["loss"] for r in pre_rows) / len(pre_rows)
ql = sum(r["loss"] for r in post_rows) / len(post_rows)
print(f"loss around preemption: pre {pl:.4f} -> post {ql:.4f}")
assert abs(ql - pl) < 0.25 * pl + 0.05, "resumed trajectory jumped"
print(f"endurance OK: {len(rows)} metric rows, preempted@{pre}, finished@{got[-1]}")
EOF
echo DONE
