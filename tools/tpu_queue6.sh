#!/bin/bash
# Round-4 consolidation queue: robustness legs for decisions already made.
set -u
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=/tmp/onchip
mkdir -p "$OUT"
LOG=${TPU_QUEUE_LOG:-/tmp/tpu_queue6.log}

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

# GST A/B, second target speaker (both trained checkpoints already exist):
# does the penalty's eval win hold across targets?
if [ -d /tmp/verify_vae2/egs/vcc20/vae2/exp/train_gst_ab_p1 ]; then
  cd /tmp/verify_vae2/egs/vcc20/vae2
  W=/tmp/verify_vae2
  for v in p0 p1; do
    run 7200 bash run.sh --stage 5 --stop_stage 7 --trgspk TEM1 \
        --train_config conf/gst_ab_${v}.yaml \
        --transcriptions $W/corpus/text --mcd_gt_root $W/corpus/vcc2020_eval
  done
  cd /root/repo
fi

# same-session live vs bundle serving pair (the r3 43.1-vs-48.6 gap was
# cross-session; r4 live measured 56.6)
run 2400 python tools/serve_bench.py --vocoder none --bundle \
    --out "$OUT/serve_bundle_v2.json"

echo "QUEUE6 DONE $(date -u +%FT%TZ)" >>"$LOG"
