#!/usr/bin/env bash
# Queued chip measurements (docs/ROADMAP.md "Pending tunnel recovery").
# Run on a host with the TPU tunnel up; one TPU process at a time (the
# axon relay wedges otherwise), so this script is strictly sequential.
# Usage: ./tools/run_queued_bench.sh [logfile]
set -u
LOG="${1:-bench_queue.log}"
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 1500 "$@" 2>&1 | tail -3 | tee -a "$LOG"
  echo | tee -a "$LOG"
}

echo "# queued bench run $(date -u +%FT%TZ)" | tee -a "$LOG"

# 1. headline regression check (megakernel auto-dispatch path)
run python bench.py --steps 250 --repeats 3

# 2. limited-interval guidance at the headline protocol (0.694x FLOPs)
run python bench.py --steps 250 --repeats 3 --cfg-interval 0.3 3.0

# 3. stacked serving chains
run python bench.py --sampler dpm++ --time-schedule karras --steps 20 \
    --repeats 3 --cfg-interval 0.3 3.0
run python bench.py --sampler dpm++ --time-schedule karras --steps 20 \
    --repeats 3 --cfg-interval 0.3 3.0 --cache-interval 2

# 4. paired-sample megakernel attention A/B (session-2 pending item)
run env MAPDIT_MEGA_PACK=1 python bench.py --steps 250 --repeats 3

# 5. TP island kernels on-chip Mosaic lowering + parity (re-runs whenever
#    the kernels change — VERDICT r04 weak #7: the chip check is a lane,
#    not a one-off)
run python tools/tp_kernel_chip_check.py
