#!/bin/bash
# r05 chip-measurement queue (strictly sequential, bulk-gated between
# stages — see BENCH_NOTES "Relay bulk-transfer wedge"). Stages: the
# S=16 K=256 law run (VERDICT #4), TP island chip check (#1), checkpoint
# cadence A/B + resume (#3), distill 2->1 SIGILL retest + bisect (#6),
# serve fused-preamble latency A/B (#8). Prereqs: /tmp/ds50k (see
# BENCH_NOTES host-stall protocol) and the /tmp/s10b distill chain for
# stages 3-5; stages degrade gracefully when absent.
# Usage: tools/run_r05_queue.sh [LOG_DIR]
set -x
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r05}
mkdir -p "$LOG"

gate() {
  for i in $(seq 1 30); do
    timeout 150 python bench.py --probe-relay && return 0
    echo "degraded/wedged (attempt $i)"; sleep 900
  done
  return 1
}

gate || exit 1

# stage 1: S=16 K=256 law (VERDICT #4) — lean fetch traffic
rm -rf /tmp/s16k256
timeout 5400 python tools/distribution_probe.py --work-dir /tmp/s16k256 \
  --model DiT-XS/4 --input-size 16 --classes 256 --examples 16384 \
  --train-steps 12000 --batch-size 256 --samples-per-class 64 \
  --train-timeout 5100 --train-args "--ckpt-every 2000 --ema-snapshot-every 6000" \
  --skip-init-baseline > $LOG/s16k256.log 2>&1
tail -1 $LOG/s16k256.log

gate || exit 1

# stage 2: TP island chip check
timeout 1800 python tools/tp_kernel_chip_check.py > $LOG/chipcheck.log 2>&1
tail -4 $LOG/chipcheck.log

gate || exit 1

# stage 3: checkpoint cadence A/B + resume equivalence
for mode in msgpack msgpack-sync; do
  rm -rf /tmp/ckpt3_$mode
  timeout 2400 python train.py --data-path /tmp/ds50k --results-dir /tmp/ckpt3_$mode \
    --model DiT-S/2 --num-classes 1000 --num-steps 300 --batch-size 256 \
    --log-every 25 --ckpt-every 150 --compute-dtype bfloat16 \
    --num-lin-warmup 5 --start-decay 250 --checkpointer $mode \
    > $LOG/ckpt3_$mode.log 2>&1
  grep -E "steps/sec|checkpoint" $LOG/ckpt3_$mode.log
  gate || exit 1
done
rm -rf /tmp/ckpt3_resume; cp -r /tmp/ckpt3_msgpack /tmp/ckpt3_resume
timeout 1800 python train.py --data-path /tmp/ds50k --results-dir unused \
  --model DiT-S/2 --num-classes 1000 --num-steps 310 --batch-size 256 \
  --log-every 5 --ckpt-every 10000 --compute-dtype bfloat16 \
  --num-lin-warmup 5 --start-decay 250 \
  --resume /tmp/ckpt3_resume/000-DiT-S-2 > $LOG/ckpt3_resume.log 2>&1
grep -E "resumed|steps/sec" $LOG/ckpt3_resume.log | tail -4

gate || exit 1

# stage 4: distill 2->1 SIGILL retest + flag bisect
for variant in "default:" "nopf:--xla_disable_hlo_passes=priority-fusion"; do
  name=${variant%%:*}; flags=${variant#*:}
  rm -rf /tmp/r05_d1_$name
  XLA_FLAGS="$flags" timeout 1800 python distill.py \
    --teacher /tmp/s10b/distill/004-DiT-XS-4-distill2 \
    --data-path /tmp/s10b/data --results-dir /tmp/r05_d1_$name \
    --base-steps 2 --stages 1 --steps-per-stage 100 --batch-size 256 \
    > $LOG/d1_$name.log 2>&1
  echo "d1_$name exit=$?"
  tail -2 $LOG/d1_$name.log
  grep -q "saved" $LOG/d1_$name.log && break
  gate || exit 1
done

# stage 5: serve fused-preamble A/B (teacher dir from /tmp/s10b)
T=$(ls -d /tmp/s10b/results/* | sort | tail -1)
for pre in host fused; do
  timeout 1800 tools/serve_latency.sh "$T" 12 --default-steps 20 \
    --default-sampler dpm++ --preamble $pre > $LOG/servelat_$pre.log 2>&1
  tail -4 $LOG/servelat_$pre.log
  gate || exit 1
done

echo QUEUE3-DONE
