#!/bin/bash
# Round-4 follow-up queue (chained after tpu_queue3.sh): measurements whose
# need emerged from queue3's results. Same wait-for-healthy-probe discipline.
set -u
cd /root/repo || exit 1
OUT=/tmp/onchip
mkdir -p "$OUT"
LOG=${TPU_QUEUE_LOG:-/tmp/tpu_queue4.log}

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

# attention kernel in isolation: did the bf16 operand change speed the
# kernel (it's just a small share of the step), or not engage at all?
run 1800 python tools/attn_micro.py --out "$OUT/attn_micro.json"

# post-gradient tail: baseline vs grads-only (closes the itemized floor
# table of VERDICT item 1)
run 2400 python tools/perf_decompose.py --steps 20 \
    --variants baseline,grads_only --out "$OUT/decompose_tail.json"

# re-take the two RTF rows the first sweep took wrong (AR frames
# under-credit; jpwg full-utterance OOM — now production-bucketed)
run 2400 python tools/rtf_families.py \
    --families token_tts_conv,token_tts_transformer,token_tts_tacotron2,jpwg \
    --out "$OUT/rtf_families_fix.json"

# int8 throughput re-take with chained-dot timing (first cut measured
# pure tunnel dispatch latency); drift already measured, skip it
run 1800 python tools/int8_probe.py --skip_drift \
    --out "$OUT/int8_probe_v2.json"

# re-soak after the malloc-arena fix (the first on-chip soak measured
# +3.3 GB RSS / 6 min live and +6.6 GB bundle — glibc arena fragmentation,
# fixed by mallopt(M_ARENA_MAX,2) in ConversionEngine.__init__)
run 1200 python tools/serve_soak.py --minutes 6 --clients 6 \
    --vocoder none --out "$OUT/soak_live_v2.json"
run 1200 python tools/serve_soak.py --minutes 6 --clients 6 \
    --vocoder none --bundle --out "$OUT/soak_bundle_v2.json"

echo "QUEUE4 DONE $(date -u +%FT%TZ)" >>"$LOG"
