#!/bin/bash
# Serial TPU job queue (one tunnel client at a time — NEXT.md operational
# note). Each job runs to completion; between jobs a generous-timeout
# health check guards against a wedged tunnel, sleeping until it clears.
# Usage: scripts/chip_queue.sh JOBFILE   (one shell command per line,
# '#' comments ok). Logs to /tmp/chipq_<n>.log, status to /tmp/chipq_status.jsonl.

set -u
JOBFILE="$1"
STATUS=/tmp/chipq_status.jsonl
n=0

# A healthy tunnel answers in ms; only a wedged one hangs. Killing a
# hung client re-wedges the tunnel, so probe with a GENEROUS timeout and
# back off long between failures (NEXT.md: recovery is ~15-20 min).
health() {
  timeout 900 python - <<'EOF'
import jax, jax.numpy as jnp
print(float(jnp.ones(4).sum()))
EOF
}

wait_healthy() {
  until health >/dev/null 2>&1; do
    echo "{\"ts\": $(date +%s), \"event\": \"tunnel-unhealthy, sleeping 600s\"}" >> "$STATUS"
    sleep 600
  done
}

grep -v '^\s*#' "$JOBFILE" | grep -v '^\s*$' | while IFS= read -r cmd; do
  n=$((n+1))
  log="/tmp/chipq_${n}.log"
  wait_healthy
  # JSON-escape via python (quotes, backslashes, control chars)
  cmd_json=$(printf '%s' "$cmd" | python -c 'import json,sys; print(json.dumps(sys.stdin.read()))')
  echo "{\"ts\": $(date +%s), \"job\": $n, \"event\": \"start\", \"cmd\": $cmd_json, \"log\": \"$log\"}" >> "$STATUS"
  bash -c "$cmd" < /dev/null > "$log" 2>&1
  rc=$?
  echo "{\"ts\": $(date +%s), \"job\": $n, \"event\": \"done\", \"rc\": $rc}" >> "$STATUS"
done
echo "{\"ts\": $(date +%s), \"event\": \"queue-drained\"}" >> "$STATUS"
