#!/bin/bash
# Round-4 phase-2 hardware queue: waits for the round-3 catch-up queue
# (tools/hw_queue.sh -> /tmp/hwq_state/ALL.done) to finish, then runs the
# round-4 hardware jobs SEQUENTIALLY (one TPU process at a time):
#   1. exp_fused h1536      — the pallas train backend's upper-bound probe
#   2. repro_full_bwd_fault — padded-grid full-bwd Mosaic fault ladder
#   3. bench_serving        — tail latency under concurrent load
# Markers in /tmp/hwq2_state, logs /tmp/hwq2_*.log. Safe to re-run.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
STATE=/tmp/hwq2_state
mkdir -p "$STATE"

run_step() {
    local name="$1"; shift
    if [ -f "$STATE/$name.done" ]; then
        echo "[hwq2] $name already done, skipping"
        return 0
    fi
    echo "[hwq2] running $name: $*  ($(date -u +%H:%M:%S))"
    if timeout 5400 "$@" > "/tmp/hwq2_$name.log" 2>&1; then
        touch "$STATE/$name.done"
        echo "[hwq2] $name OK"
    else
        echo "[hwq2] $name FAILED (see /tmp/hwq2_$name.log)"
        date -u +%H:%M:%S >> "$STATE/$name.failed"
    fi
}

cd "$REPO"
echo "[hwq2] waiting for phase-1 queue (/tmp/hwq_state/ALL.done)..."
while [ ! -f /tmp/hwq_state/ALL.done ]; do
    sleep 60
done
echo "[hwq2] phase 1 complete; starting phase 2 ($(date -u +%H:%M:%S))"
run_step h1536 python tools/exp_fused.py h1536
run_step faultrepro python tools/repro_full_bwd_fault.py
run_step serving python tools/bench_serving.py
echo "[hwq2] queue complete ($(date -u +%H:%M:%S))"
touch "$STATE/ALL.done"
