#!/usr/bin/env bash
# Warm bucket-1 serving latency for one experiment dir (the production
# latency row): launch serve.py, wait for warmup compile, fire N warm
# single-sample requests, print per-request wall-clock + the median.
#
# Usage: tools/serve_latency.sh RESULT_DIR [N_REQUESTS] [EXTRA_SERVE_ARGS...]
# (TPU-sequential: do not run while another TPU process is live.)
set -euo pipefail
DIR=$1; shift
N=${1:-10}; [ $# -gt 0 ] && shift
PORT=8093
LOG=$(mktemp /tmp/serve_lat.XXXX.log)

python serve.py --result-dir "$DIR" --port $PORT --buckets 1 \
  --use-vae false "$@" > "$LOG" 2>&1 &
SRV=$!
trap 'kill $SRV 2>/dev/null || true' EXIT

for _ in $(seq 1 180); do
  grep -q "warmup compile done\|listening" "$LOG" && break
  kill -0 $SRV 2>/dev/null || { echo "serve.py died:"; tail -20 "$LOG"; exit 1; }
  sleep 2
done
grep -q "warmup compile done\|listening" "$LOG" || { echo "no warmup within 6 min"; tail -20 "$LOG"; exit 1; }
sleep 1

# one discarded warm-up request (HTTP path init), then the measured N
curl -s -X POST "localhost:$PORT/v1/sample" \
  -d '{"class_label": 1, "num_samples": 1, "seed": 0}' -o /dev/null -w "warm0 %{http_code} %{time_total}s\n"
TIMES=()
for i in $(seq 1 "$N"); do
  T=$(curl -s -X POST "localhost:$PORT/v1/sample" \
    -d "{\"class_label\": 1, \"num_samples\": 1, \"seed\": $i}" \
    -o /dev/null -w "%{time_total}")
  echo "req$i ${T}s"
  TIMES+=("$T")
done
printf '%s\n' "${TIMES[@]}" | sort -n | awk '{a[NR]=$1} END {printf "median %.1f ms  min %.1f ms  max %.1f ms  n=%d\n", a[int((NR+1)/2)]*1000, a[1]*1000, a[NR]*1000, NR}'
# device-chain share (jitted sampling call only) vs the serving floor
curl -s "localhost:$PORT/metrics" | grep -E "chain_seconds_(sum|count)" | grep -v TYPE

kill $SRV 2>/dev/null || true
wait $SRV 2>/dev/null || true
