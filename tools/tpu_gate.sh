#!/bin/bash
# Wait for a healthy TPU probe, then run the given command once.
# A probe must answer FAST (dt below the threshold) — the tunnel sometimes
# answers a single matmul after minutes while remaining unusable for real
# work, so slow answers count as down.
#
#   nohup bash tools/tpu_gate.sh tools/tpu_queue3.sh >/dev/null 2>&1 &
CMD=${1:?usage: tpu_gate.sh <script> [max_probe_s]}
MAXS=${2:-45}
LOG=${TPU_GATE_LOG:-/tmp/tpu_gate.log}
cd /root/repo || exit 1
echo "$(date -u +%FT%TZ) gate start for $CMD (pid $$)" >>"$LOG"
while true; do
  t0=$(date +%s)
  if timeout "$MAXS" python tools/tpu_probe.py >>"$LOG" 2>&1; then
    dt=$(( $(date +%s) - t0 ))
    echo "$(date -u +%FT%TZ) probe ok in ${dt}s — launching $CMD" >>"$LOG"
    bash "$CMD"
    echo "$(date -u +%FT%TZ) $CMD finished" >>"$LOG"
    exit 0
  fi
  echo "$(date -u +%FT%TZ) probe slow/down; retry in 300s" >>"$LOG"
  sleep 300
done
