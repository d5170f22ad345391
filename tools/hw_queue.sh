#!/bin/bash
# Watchdog for the pending hardware queue (round-3 "third push", round-4
# continuation).
#
# The axon TPU tunnel FLAPS: it can go half-dead for hours (connects, never
# answers; backend init or an in-flight RPC hangs instead of failing over),
# then revive. Observed round 4: an RPC stuck during a dead window NEVER
# completes even after the tunnel revives — only fresh connections work. So
# every job gets (a) a hard timeout and (b) a STALL detector that kills it
# when its log stops growing for STALL_S seconds, so a wedged job releases
# the queue quickly and is retried on the next alive window.
#
# Probes the tunnel every PROBE_INTERVAL_S seconds with a hard timeout; when
# a probe succeeds it runs the queued hardware jobs SEQUENTIALLY (never two
# TPU processes at once), logging to /tmp/hwq_*.log with marker files in
# /tmp/hwq_state/. Safe to re-run: completed steps are skipped via markers.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
STATE=/tmp/hwq_state
mkdir -p "$STATE"
PROBE_TIMEOUT_S=${PROBE_TIMEOUT_S:-300}
PROBE_INTERVAL_S=${PROBE_INTERVAL_S:-180}
STALL_S=${STALL_S:-900}
MAX_ATTEMPTS=${MAX_ATTEMPTS:-8}

probe() {
    timeout "$PROBE_TIMEOUT_S" python -c "
import os
os.environ.setdefault('JAX_PLATFORMS', 'axon')
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu', jax.default_backend()
x = jnp.ones((128, 128))
print('probe ok:', float((x @ x).sum()))
" > /tmp/hwq_probe.log 2>&1
}

run_step() {
    local name="$1"; shift
    if [ -f "$STATE/$name.done" ]; then
        echo "[hwq] $name already done, skipping"
        return 0
    fi
    echo "[hwq] running $name: $*  ($(date -u +%H:%M:%S))"
    local log="/tmp/hwq_$name.log"
    timeout 5400 "$@" > "$log" 2>&1 &
    local pid=$!
    while kill -0 "$pid" 2>/dev/null; do
        sleep 30
        local age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || date +%s) ))
        if [ "$age" -ge "$STALL_S" ]; then
            echo "[hwq] $name STALLED (no output for ${age}s) — killing pid $pid"
            kill "$pid" 2>/dev/null; sleep 3; kill -9 "$pid" 2>/dev/null
            date -u +%H:%M:%S >> "$STATE/$name.failed"
            return 1
        fi
    done
    if wait "$pid"; then
        touch "$STATE/$name.done"
        echo "[hwq] $name OK"
        return 0
    fi
    echo "[hwq] $name FAILED (see $log)"
    date -u +%H:%M:%S >> "$STATE/$name.failed"
    return 1
}

queue_done() {
    for s in verify fused gen vaescale bench; do
        [ -f "$STATE/$s.done" ] || return 1
    done
    return 0
}

cd "$REPO"
attempt=0
while true; do
    attempt=$((attempt + 1))
    echo "[hwq] probe attempt $attempt ($(date -u +%H:%M:%S))"
    if probe; then
        echo "[hwq] tunnel ALIVE"
        # Order matters: verify gates any fusion default flip; exp_fused
        # produces the numbers that decide the flip; bench_generate
        # regenerates the invalidated bf16-vs-int8 row; bench.py last.
        # A failed/stalled step is retried on the next revival.
        attempts() { [ -f "$STATE/$1.failed" ] && wc -l < "$STATE/$1.failed" || echo 0; }
        if [ "$(attempts verify)" -lt "$MAX_ATTEMPTS" ] || [ -f "$STATE/verify.done" ]; then
            run_step verify python tools/verify_kernels_tpu.py || { sleep "$PROBE_INTERVAL_S"; continue; }
        fi
        [ "$(attempts fused)" -lt "$MAX_ATTEMPTS" ] && { run_step fused python tools/exp_fused.py || { sleep "$PROBE_INTERVAL_S"; continue; }; }
        [ "$(attempts gen)" -lt "$MAX_ATTEMPTS" ] && { run_step gen python tools/bench_generate.py || { sleep "$PROBE_INTERVAL_S"; continue; }; }
        [ "$(attempts vaescale)" -lt "$MAX_ATTEMPTS" ] && { run_step vaescale python tools/bench_vae_scale.py || { sleep "$PROBE_INTERVAL_S"; continue; }; }
        [ "$(attempts bench)" -lt "$MAX_ATTEMPTS" ] && run_step bench python bench.py
        if queue_done; then
            echo "[hwq] queue complete ($(date -u +%H:%M:%S))"
            touch "$STATE/ALL.done"
            break
        fi
        if [ "$(attempts verify)" -ge "$MAX_ATTEMPTS" ] && [ ! -f "$STATE/verify.done" ]; then
            echo "[hwq] verify failed ${MAX_ATTEMPTS}x — giving up (fix and rerun manually)"
            break
        fi
        echo "[hwq] queue incomplete (failures); will retry on next probe"
    else
        echo "[hwq] tunnel still dead (probe timed out or errored)"
    fi
    sleep "$PROBE_INTERVAL_S"
done
