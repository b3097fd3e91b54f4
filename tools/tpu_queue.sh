#!/bin/bash
# On-chip measurement queue (round 3).  Everything still owed a real-TPU
# number, in priority order.  Each job gets a generous timeout (killing a
# process mid-TPU-compile wedges the tunnel — see CLAUDE.md); one failure
# does not stop the queue.  Results land in /tmp/onchip/ for triage and the
# committed PROFILE_families.json is refreshed in place.
#
#   bash tools/tpu_queue.sh            # (tpu_watch.sh launches this)
#
set -u
cd /root/repo || exit 1
OUT=/tmp/onchip
mkdir -p "$OUT"
LOG=${TPU_QUEUE_LOG:-/tmp/tpu_queue.log}

run() {
  local t=$1; shift
  echo "=== $(date -u +%FT%TZ) [$t s] $*" >>"$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  echo "--- exit=$? $(date -u +%FT%TZ)" >>"$LOG"
}

# 1. per-family AOT table, incl. fused-attention and fused-GroupNorm A/B rows
run 5400 python tools/perf_families.py --steps 20 --out PROFILE_families.json
# 2. dispatch A/Bs on the flagship flat family
run 1800 python tools/perf_families.py --families flat --scan_k 8 \
    --out "$OUT/ab_scan_k8.json"
run 1800 python tools/perf_families.py --families flat --dev_res_k 8 \
    --out "$OUT/ab_dev_res_k8.json"
run 1800 python tools/perf_families.py --families flat --accum_k 4 \
    --out "$OUT/ab_accum_k4.json"
# 3. serving-path latency/RTF/coalescing: mel-only, Griffin-Lim, bundle
run 2400 python tools/serve_bench.py --vocoder none --out "$OUT/serve_none.json"
run 2400 python tools/serve_bench.py --vocoder gl --out "$OUT/serve_gl.json"
run 2400 python tools/serve_bench.py --vocoder none --bundle \
    --out "$OUT/serve_bundle.json"
# 4. vocoder batch/channel sweep (unbiased rerun on the fixed measurement)
run 5400 python tools/pwg_batch_sweep.py --out "$OUT/pwg_sweep.json"
# 5. headline bench (one JSON line, lands in $LOG)
run 2400 python bench.py

echo "QUEUE DONE $(date -u +%FT%TZ)" >>"$LOG"
