#!/bin/bash
# Round-4 third queue: re-takes with the chained-dispatch timing fix.
set -u
cd /root/repo || exit 1
OUT=/tmp/onchip
mkdir -p "$OUT"
LOG=${TPU_QUEUE_LOG:-/tmp/tpu_queue5.log}

MAX_WAIT_S=${TPU_QUEUE_MAX_WAIT_S:-7200}
wait_up() {
  local t0=$(date +%s)
  while true; do
    if timeout 60 python /root/repo/tools/tpu_probe.py >>"$LOG" 2>&1; then return 0; fi
    if [ $(( $(date +%s) - t0 )) -ge "$MAX_WAIT_S" ]; then
      echo "!!! $(date -u +%FT%TZ) wait_up gave up" >>"$LOG"; return 1
    fi
    echo "... $(date -u +%FT%TZ) tunnel down; waiting" >>"$LOG"
    sleep 240
  done
}

run() {
  local t=$1; shift
  wait_up
  echo "=== $(date -u +%FT%TZ) [$t s] $*" >>"$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  echo "--- exit=$? $(date -u +%FT%TZ)" >>"$LOG"
}

# attention kernel isolation, chained-in-one-jit timing (the per-call
# version measured ~20 ms tunnel dispatch, not kernel time)
run 1800 python tools/attn_micro.py --out "$OUT/attn_micro_v2.json"

# int8 throughput, third take: device-scalar fence (v2 fetched the full
# 128 MB result through the tunnel per timed call)
run 1800 python tools/int8_probe.py --skip_drift \
    --out "$OUT/int8_probe_v3.json"

echo "QUEUE5 DONE $(date -u +%FT%TZ)" >>"$LOG"
