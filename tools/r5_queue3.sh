#!/bin/bash
# Round-5 queue, take 2: replaces the per-row run.sh driving of r5_queue.sh
# (measured ~20 min/row on the tunneled backend — five CLI processes per row
# each paying startup + first-dispatch) with tools/eval_matrix.py (same CLI
# mains, one process; ~35 s/row at smoke scale).  Then the serving A/B
# pairs, the trained-model streaming curve, chunked-stream TTFA, the full
# reproduce.sh regeneration, and a bench warm-up of the fingerprinted cache.
set -u
W=${GST_AB_WS:-/tmp/verify_vae2}
LOG=${R5_LOG:-/tmp/r5_queue3.log}
OUT=${R5_OUT:-/tmp/onchip}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

wait_up() {
  local t0=$(date +%s)
  while ! (cd /root/repo && timeout 60 python /root/repo/tools/tpu_probe.py >>"$LOG" 2>&1); do
    if [ $(( $(date +%s) - t0 )) -ge 14400 ]; then return 1; fi
    echo "... $(date -u +%FT%TZ) tunnel down; waiting" >>"$LOG"
    sleep 240
  done
}

run() {
  local t=$1; shift
  wait_up
  echo "=== $(date -u +%FT%TZ) [$t s] $*" >>"$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  local rc=$?
  echo "--- exit=$rc $(date -u +%FT%TZ)" >>"$LOG"
  return $rc
}

cd /root/repo
SH="$W/egs/vcc20/vae2/exp/shared_eval"

# ---- A: the 16-row A/B matrix + 10-point ladder, idempotent -------------
# (retry loop: the matrix skips rows whose RESULT file exists, so a tunnel
# flap mid-matrix just resumes where it left off)
for attempt in 1 2 3 4 5 6; do
  run 10800 python tools/eval_matrix.py --workspace "$W" \
      --ladder gst_ab_p0 --out "$OUT/eval_matrix_r5.json" && break
done

# recognizer floor on ground-truth eval features (see r5_queue2.sh notes)
(cd "$W/egs/vcc20/vae2" && run 1800 python -m vae_npvc_tpu.bin.eval_asr \
    --train_dir dump/train --eval_scp dump/eval/feats.scp \
    --ref_text data/eval/text --output_dir exp/shared_eval/asr_floor \
    --steps 12000 --arch transformer \
    --recognizer_ckpt "$SH/ctc_strong.msgpack" \
    --beam_size 10 --lm_weight 0.6 --lm_type neural --lm_order 3 \
    --penalty 0.0 --lm_ckpt "$SH/char_lm.msgpack")

run 600 python tools/gst_ab_summary.py --workspace "$W" \
    --out "$OUT/gst_ab_r5.json"
run 600 python tools/cer_real_summary.py --workspace "$W" \
    --out "$OUT/cer_real_calib.json"

# ---- B: live-vs-bundle, 5 interleaved pairs -----------------------------
for i in 1 2 3 4 5; do
  run 2400 python tools/serve_bench.py --vocoder none \
      --out "$OUT/serve_live_r5_${i}.json"
  run 2400 python tools/serve_bench.py --vocoder none --bundle \
      --out "$OUT/serve_bundle_r5_${i}.json"
done
run 300 python tools/serve_ab_summary.py --dir "$OUT" --pattern r5 \
    --out "$OUT/serve_ab_r5.json"

# ---- C: trained-model deviation-vs-lookahead curve ----------------------
run 3600 python tools/stream_approx_curve.py \
    --workspace "$W" --run train_gst_ab_p0 \
    --chunks 64,128 --lookaheads 0,16,32,64,128,256 --n_utts 5 \
    --out "$OUT/stream_approx.json"

# ---- D: chunked-stream TTFA at the flagship shape -----------------------
run 3600 python tools/serve_bench.py --vocoder jpwg --stream \
    --stream_chunk 128 --stream_lookahead 64 \
    --out "$OUT/serve_jpwg_stream_r5.json"

# ---- E: one-command RESULT regeneration (full config) -------------------
run 7200 bash egs/vcc20/vae1/reproduce.sh --workspace /tmp/reproduce_vae1

# ---- F: warm the fingerprinted cache for the driver's bench -------------
run 1200 python bench.py

echo "R5_QUEUE3 DONE $(date -u +%FT%TZ)" >>"$LOG"
