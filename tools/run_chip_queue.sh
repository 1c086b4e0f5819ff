#!/bin/bash
# Round-4 chip-measurement queue (runs AFTER bench.py exits; one
# measurement at a time — the driver host has a single CPU core).
# Usage: tools/run_chip_queue.sh <bench_pid> <logfile>
set -u
BENCH_PID=${1:?bench pid}
# Resolve the logfile relative to the CALLER's cwd before we cd.
LOG=$(readlink -f "${2:?logfile}")
cd "$(dirname "$0")/.."

say() { echo "[queue $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

say "waiting for bench pid $BENCH_PID"
# Bounded wait: bench's worst case is ~90 min; a stale/reused PID must
# not park the queue forever.
WAITED=0
while kill -0 "$BENCH_PID" 2>/dev/null; do
  sleep 10
  WAITED=$((WAITED + 10))
  if [ "$WAITED" -ge 5400 ]; then
    say "WARNING: pid $BENCH_PID still alive after 90 min; proceeding anyway"
    break
  fi
done
say "bench done; starting queue"

say "=== profile_message_path (4x180s) ==="
timeout 900 python tools/profile_message_path.py 4 180 >> "$LOG" 2>&1
say "profile_message_path rc=$?"

say "=== combined soak: 48 calls, message_path=1 ==="
timeout 1200 python tools/soak_e2e_tpu.py 48 1 >> "$LOG" 2>&1
say "soak rc=$?"

say "=== serving load test (HTTP+gRPC arms, 8 clients x 90s) ==="
timeout 1500 python tools/load_test_serving.py 8 90 20 >> "$LOG" 2>&1
say "load_test rc=$?"

say "=== ab_async chunk_batch_size=32 ==="
timeout 1800 python tools/ab_async.py 4 chunk_batch_size=32 >> "$LOG" 2>&1
say "ab chunk32 rc=$?"

say "queue complete"
