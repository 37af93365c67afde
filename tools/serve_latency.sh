#!/usr/bin/env bash
# Warm bucket-1 serving latency for one experiment dir (the production
# latency row): launch serve.py on an EPHEMERAL port, wait for the listen
# line, verify /healthz is OUR service, fire N warm single-sample
# requests, print per-request wall-clock + the median + the device-chain
# share from /metrics.
#
# (r04 postmortem: a fixed port collided with a pre-existing host service
# that answers every path with ~50 ms 404s — the first batch of latency
# rows measured THAT. Ephemeral port + /healthz identity check prevent it.)
#
# Usage: tools/serve_latency.sh RESULT_DIR [N_REQUESTS] [EXTRA_SERVE_ARGS...]
# (TPU-sequential: do not run while another TPU process is live.)
set -euo pipefail
DIR=$1; shift
N=10
if [ $# -gt 0 ] && [[ $1 =~ ^[0-9]+$ ]]; then N=$1; shift; fi
LOG=$(mktemp /tmp/serve_lat.XXXX.log)

python serve.py --result-dir "$DIR" --port 0 --buckets 1 \
  --use-vae false "$@" > "$LOG" 2>&1 &
SRV=$!
trap 'kill $SRV 2>/dev/null || true' EXIT

PORT=""
for _ in $(seq 1 240); do
  PORT=$(sed -n 's/.*listening on http:\/\/[^:]*:\([0-9]*\).*/\1/p' "$LOG" | head -1)
  [ -n "$PORT" ] && break
  kill -0 $SRV 2>/dev/null || { echo "serve.py died:"; tail -20 "$LOG"; exit 1; }
  sleep 2
done
[ -n "$PORT" ] || { echo "no listen line within 8 min"; tail -20 "$LOG"; exit 1; }
curl -s "localhost:$PORT/healthz" | grep -q '"status": "ok"' \
  || { echo "healthz is not our service"; exit 1; }
echo "port $PORT"

# one discarded warm-up request (HTTP path init), then the measured N
warm_code=$(curl -s -X POST "localhost:$PORT/v1/sample" \
  -d '{"class_label": 1, "num_samples": 1, "seed": 0}' -o /dev/null -w "%{http_code}")
echo "warm0 $warm_code"
[ "$warm_code" = "200" ] || { echo "warm request failed"; tail -5 "$LOG"; exit 1; }
# snapshot the cumulative chain counters AFTER warmup so the printed
# device-chain share covers only the measured window (the warmup batch's
# chain time includes the multi-minute first compile)
chain0=$(curl -s "localhost:$PORT/healthz" | python -c 'import json,sys; d=json.load(sys.stdin); print(d["chain_seconds_sum"], d["chain_seconds_count"])')
TIMES=()
for i in $(seq 1 "$N"); do
  OUT=$(curl -s -X POST "localhost:$PORT/v1/sample" \
    -d "{\"class_label\": 1, \"num_samples\": 1, \"seed\": $i}" \
    -o /dev/null -w "%{http_code} %{time_total}")
  CODE=${OUT%% *}; T=${OUT##* }
  [ "$CODE" = "200" ] || { echo "req$i http $CODE"; exit 1; }
  echo "req$i ${T}s"
  TIMES+=("$T")
done
printf '%s\n' "${TIMES[@]}" | sort -n | awk '{a[NR]=$1} END {printf "median %.1f ms  min %.1f ms  max %.1f ms  n=%d\n", a[int((NR+1)/2)]*1000, a[1]*1000, a[NR]*1000, NR}'
# device-chain share (jitted sampling call only) vs the serving floor —
# deltas over the measured window, compile excluded
curl -s "localhost:$PORT/healthz" | python -c '
import json, sys
d = json.load(sys.stdin)
s0, c0 = map(float, sys.argv[1].split())
ds = d["chain_seconds_sum"] - s0
dc = d["chain_seconds_count"] - c0
if dc > 0:
    print(f"chain (measured window) {ds/dc*1000:.1f} ms/batch over {int(dc)} batches")
' "$chain0" || true

kill $SRV 2>/dev/null || true
wait $SRV 2>/dev/null || true
