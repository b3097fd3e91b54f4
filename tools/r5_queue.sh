#!/bin/bash
# Round-5 on-chip queue (VERDICT r4 items 3, 4, 5):
#
#  A. GST scale-anchor A/B, spread-bounded (item 4): 2 configs
#     (gst_scale_penalty 0 vs 1e-4) x 2 seeds (777 reused from the round-4
#     runs, 778 trained fresh) x all 4 VCC2020 English targets
#     (TEF1/TEF2/TEM1/TEM2), every RESULT row scored with ONE shared strong
#     recognizer/LM/embedder (run.sh --shared_*_ckpt knobs) so rows are
#     comparable across expdirs.
#  B. CER-proxy calibration on REAL conversions (item 3): the p0 seed-777
#     run's iter.1000..10000 checkpoint ladder, converted + evaluated
#     (TEF1), then proxy CER rank-correlated against MCD / COSSIM
#     (tools/cer_real_summary.py).
#  C. live-vs-bundle, N=5 interleaved same-window pairs (item 5).
#
# Prereq: the prepared vae2 workspace at $W (tools/gst_ab_prep.sh) with the
# round-4 gst_ab_p0/p1 runs (seed 777, 10k steps, checkpoints every 1000).
set -u
W=${GST_AB_WS:-/tmp/verify_vae2}
LOG=${R5_LOG:-/tmp/r5_queue.log}
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

# refresh recipe scripts in the workspace (keep data/dump/exp); the round-5
# run.sh grew the eval_checkpoint + shared_*_ckpt knobs this queue needs
cp -r /root/repo/egs/vcc20 /root/repo/egs/utils "$W/egs/" 2>>"$LOG"
cd "$W/egs/vcc20/vae2" || exit 1

# seed-778 configs: current YAML defaults gst_scale_penalty=1e-4 (round-4
# flip), so p0 must pin 0.0 explicitly now
python - <<'EOF'
import yaml
c = yaml.safe_load(open("conf/train_vqvae2.yaml"))
c.update(max_iter=10000, iters_per_checkpoint=1000, iters_per_log=200,
         seed=778)
c["gst_scale_penalty"] = 0.0
yaml.safe_dump(c, open("conf/gst_ab_p0s778.yaml", "w"))
c = dict(c, gst_scale_penalty=1.0e-4)
yaml.safe_dump(c, open("conf/gst_ab_p1s778.yaml", "w"))
EOF

FLAGS="--transcriptions $W/corpus/text --mcd_gt_root $W/corpus/vcc2020_eval"
SH="$W/egs/vcc20/vae2/exp/shared_eval"; mkdir -p "$SH"
SHARED="--shared_asr_ckpt $SH/ctc_strong.msgpack \
 --shared_lm_ckpt $SH/char_lm.msgpack \
 --shared_embedder_ckpt $SH/spk_embedder.msgpack \
 --asr_arch transformer --asr_steps 12000"

# ---- A1: seed-778 training (auto-resumes across tunnel flaps) ----------
for v in p0s778 p1s778; do
  for attempt in 1 2 3 4 5; do
    [ -e "exp/train_gst_ab_${v}/iter.10000" ] && break
    run 3600 bash run.sh --stage 3 --stop_stage 3 \
        --train_config conf/gst_ab_${v}.yaml $FLAGS
  done
done

# ---- A2: 4 runs x 4 targets, shared scorer --------------------------------
# (the first eval trains the shared transformer recognizer + neural LM +
# embedder once; later evals reuse them)
for v in p0 p1 p0s778 p1s778; do
  for t in TEF1 TEF2 TEM1 TEM2; do
    marker="exp/train_gst_ab_${v}/.eval_${t}_done"
    [ -e "$marker" ] && continue
    run 5400 bash run.sh --stage 5 --stop_stage 7 --trgspk $t \
        --train_config conf/gst_ab_${v}.yaml $FLAGS $SHARED \
      && touch "$marker"
  done
done

# ---- B: checkpoint ladder (p0 seed-777, TEF1) -----------------------------
for n in 1000 2000 3000 4000 5000 6000 7000 8000 9000 10000; do
  marker="exp/train_gst_ab_p0/.ladder_${n}_done"
  [ -e "$marker" ] && continue
  run 5400 bash run.sh --stage 5 --stop_stage 7 --trgspk TEF1 \
      --train_config conf/gst_ab_p0.yaml --eval_checkpoint iter.${n} \
      $FLAGS $SHARED \
    && touch "$marker"
done

# ---- summaries ------------------------------------------------------------
run 600 python /root/repo/tools/gst_ab_summary.py --workspace "$W" \
    --out "$OUT/gst_ab_r5.json"
run 600 python /root/repo/tools/cer_real_summary.py --workspace "$W" \
    --out "$OUT/cer_real_calib.json"

# ---- C: live-vs-bundle, 5 interleaved pairs -------------------------------
cd /root/repo
for i in 1 2 3 4 5; do
  run 2400 python tools/serve_bench.py --vocoder none \
      --out "$OUT/serve_live_r5_${i}.json"
  run 2400 python tools/serve_bench.py --vocoder none --bundle \
      --out "$OUT/serve_bundle_r5_${i}.json"
done
run 300 python tools/serve_ab_summary.py --dir "$OUT" --pattern r5 \
    --out "$OUT/serve_ab_r5.json"

echo "R5_QUEUE DONE $(date -u +%FT%TZ)" >>"$LOG"
