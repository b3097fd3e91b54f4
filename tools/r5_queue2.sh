#!/bin/bash
# Round-5 follow-up chip queue (run after tools/r5_queue.sh):
#  1. deviation-vs-lookahead curve for approximate chunked streaming on the
#     TRAINED vqvae2 (VERDICT r4 item 7) — the toy-scale curve is near-zero
#     by construction; the trained hierarchical model with its GST and
#     scale-free activation growth is the real test.
#  2. one-command RESULT regeneration (VERDICT r4 item 8): reproduce.sh on
#     the full vae1 config, from a fresh corpus, on the current fast path.
#  3. bench.py once — warms the NEW host-fingerprinted compile-cache dir so
#     the driver's end-of-round bench is warm (the old un-fingerprinted dir
#     is orphaned by design).
set -u
LOG=${R5_LOG:-/tmp/r5_queue2.log}
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

# ---- repair pass: r5_queue.sh's success markers were unconditional (its
# run() returned the log-echo status), so any eval that failed under its
# timeout left a marker without a RESULT file.  Re-run every missing
# (run, target) / ladder RESULT, keyed on the RESULT file itself — written
# only when stage 7 completes, so this pass is idempotent.
W=${GST_AB_WS:-/tmp/verify_vae2}
cd "$W/egs/vcc20/vae2" || exit 1
FLAGS="--transcriptions $W/corpus/text --mcd_gt_root $W/corpus/vcc2020_eval"
SH="$W/egs/vcc20/vae2/exp/shared_eval"
SHARED="--shared_asr_ckpt $SH/ctc_strong.msgpack \
 --shared_lm_ckpt $SH/char_lm.msgpack \
 --shared_embedder_ckpt $SH/spk_embedder.msgpack \
 --asr_arch transformer --asr_steps 12000"

for v in p0 p1 p0s778 p1s778; do
  [ -e "exp/train_gst_ab_${v}/iter.10000" ] || continue
  for t in TEF1 TEF2 TEM1 TEM2; do
    [ -e "exp/train_gst_ab_${v}/outputs_model.loss.best.ob_eval/RESULT.SEF1_${t}" ] && continue
    run 5400 bash run.sh --stage 5 --stop_stage 7 --trgspk $t \
        --train_config conf/gst_ab_${v}.yaml $FLAGS $SHARED
  done
done
for n in 1000 2000 3000 4000 5000 6000 7000 8000 9000 10000; do
  [ -e "exp/train_gst_ab_p0/outputs_iter.${n}.ob_eval/RESULT.SEF1_TEF1" ] && continue
  run 5400 bash run.sh --stage 5 --stop_stage 7 --trgspk TEF1 \
      --train_config conf/gst_ab_p0.yaml --eval_checkpoint iter.${n} \
      $FLAGS $SHARED
done
# recognizer floor: CER/WER of the shared strong recognizer on the GROUND
# TRUTH eval features (the source speech itself) — the best any conversion
# row can score; bounds how far off the 100-WER rail rows can get.
# (WER here is structural: transcripts are ONE 6-8-char pseudo-word per
# utterance, so WER ~ 1-(1-CER)^len and is quantized in steps of 10.)
run 1800 python -m vae_npvc_tpu.bin.eval_asr \
    --train_dir dump/train --eval_scp dump/eval/feats.scp \
    --ref_text data/eval/text --output_dir exp/shared_eval/asr_floor \
    --steps 12000 --arch transformer \
    --recognizer_ckpt "$SH/ctc_strong.msgpack" \
    --beam_size 10 --lm_weight 0.6 --lm_type neural --lm_order 3 \
    --penalty 0.0 --lm_ckpt "$SH/char_lm.msgpack"

run 600 python /root/repo/tools/gst_ab_summary.py --workspace "$W" \
    --out "$OUT/gst_ab_r5.json"
run 600 python /root/repo/tools/cer_real_summary.py --workspace "$W" \
    --out "$OUT/cer_real_calib.json"

cd /root/repo

run 3600 python tools/stream_approx_curve.py \
    --workspace /tmp/verify_vae2 --run train_gst_ab_p0 \
    --chunks 64,128 --lookaheads 0,16,32,64,128,256 --n_utts 5 \
    --out "$OUT/stream_approx.json"

# streamed serving with approximate chunked conversion: after-last-byte
# latency (TTFA) for exact vs chunked mode at the flagship shape
run 3600 python tools/serve_bench.py --vocoder jpwg --stream \
    --stream_chunk 128 --stream_lookahead 64 \
    --out "$OUT/serve_jpwg_stream_r5.json"

run 7200 bash egs/vcc20/vae1/reproduce.sh --workspace /tmp/reproduce_vae1
run 1200 python bench.py

echo "R5_QUEUE2 DONE $(date -u +%FT%TZ)" >>"$LOG"
