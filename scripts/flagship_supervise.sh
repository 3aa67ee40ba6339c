#!/bin/bash
# Supervisor for the wedge-prone axon tunnel: runs the resilient flagship
# driver, kills it (exact PID) if its CPU-time freezes for $STALL_MIN
# consecutive minutes (the tunnel-wedge signature — the client blocks
# forever on a device call), waits out the client-release window, and
# restarts; per-epoch checkpoints mean each restart resumes. When the
# flagship completes (or attempts are exhausted), chains into the rest of
# the round-5 measurement queue via chip_queue.sh.
# Usage: scripts/flagship_supervise.sh [JOBFILE-to-chain-into]
set -u
cd "$(dirname "$0")/.."
CHAIN="${1:-}"
if [ $# -gt 0 ]; then shift; fi   # remaining args go to the driver
STATUS=/tmp/flagship_supervise.jsonl
STALL_MIN=10
MAX_ATTEMPTS=5

note() { echo "{\"ts\": $(date +%s), $1}" >> "$STATUS"; }

health() {
  timeout 900 python - <<'EOF'
import jax, jax.numpy as jnp
print(float(jnp.ones(4).sum()))
EOF
}

wait_healthy() {
  until health >/dev/null 2>&1; do
    note '"event": "tunnel-unhealthy, sleeping 600s"'
    sleep 600
  done
}

cputime() {  # utime+stime ticks of PID $1 (0 if gone)
  awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo 0
}

ok=0
for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  wait_healthy
  log="/tmp/flagship_attempt_${attempt}.log"
  note "\"event\": \"attempt\", \"n\": $attempt, \"log\": \"$log\""
  python scripts/flagship_resilient.py "$@" < /dev/null > "$log" 2>&1 &
  pid=$!
  prev=-1; stall=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    cur=$(cputime "$pid")
    if [ "$cur" = "$prev" ]; then stall=$((stall+1)); else stall=0; fi
    prev=$cur
    if [ "$stall" -ge "$STALL_MIN" ]; then
      note "\"event\": \"wedge-detected, killing\", \"pid\": $pid"
      kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid"; rc=$?
  note "\"event\": \"attempt-done\", \"n\": $attempt, \"rc\": $rc"
  if [ "$rc" -eq 0 ]; then ok=1; break; fi
  sleep 420   # tunnel client-release window before the next attempt
done
note "\"event\": \"flagship-finished\", \"ok\": $ok"

if [ -n "$CHAIN" ]; then
  sleep 420
  note "\"event\": \"chaining\", \"jobfile\": \"$CHAIN\""
  exec bash scripts/chip_queue.sh "$CHAIN"
fi
