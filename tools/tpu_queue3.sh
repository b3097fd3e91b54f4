#!/bin/bash
# Round-4 on-chip queue. Ordered by value density; every entry is
# timeout-bounded and failures don't stop the queue (the tunnel flaps).
# Launch via tools/tpu_gate.sh (waits for a healthy probe) or directly.
set -u
cd /root/repo || exit 1
OUT=/tmp/onchip
mkdir -p "$OUT"
LOG=${TPU_QUEUE_LOG:-/tmp/tpu_queue3.log}

# wait_up: block until a FAST probe answers (the tunnel flaps; launching a
# job against a wedged transport burns its whole timeout and the TERM at
# timeout can deepen the wedge). Gives up after MAX_WAIT_S and lets the
# queue try anyway.
MAX_WAIT_S=${TPU_QUEUE_MAX_WAIT_S:-7200}
wait_up() {
  local t0=$(date +%s)
  while true; do
    if timeout 60 python /root/repo/tools/tpu_probe.py >>"$LOG" 2>&1; then
      return 0
    fi
    if [ $(( $(date +%s) - t0 )) -ge "$MAX_WAIT_S" ]; then
      echo "!!! $(date -u +%FT%TZ) wait_up gave up after ${MAX_WAIT_S}s" >>"$LOG"
      return 1
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

# 0. recovery sanity + headline bench under the current tree
run 2400 python bench.py

# 1. the round-4 attention kernel change (bf16 MXU passes): fused-vs-stock
#    A/B re-measure for the transformer family (VERDICT item 2)
run 2400 python tools/perf_families.py --steps 20 \
    --families token_tts_transformer,token_tts_transformer_stock \
    --out "$OUT/fam_transformer_bf16attn.json"

# 2. per-family RTF table (VERDICT item 6)
run 3600 python tools/rtf_families.py --out "$OUT/rtf_families.json"

# 3. queue2 backlog: stock-path re-measure + dispatch A/Bs
run 3600 python tools/perf_families.py --steps 20 \
    --families vqvae2a,vqvae2b --out "$OUT/fam_2a2b_stock.json"
run 1800 python tools/perf_families.py --families flat --scan_k 8 \
    --out "$OUT/ab_scan_k8_v2.json"
run 1800 python tools/perf_families.py --families flat --dev_res_k 8 \
    --out "$OUT/ab_dev_res_k8_v2.json"
run 1800 python tools/perf_families.py --families flat --accum_k 4 \
    --out "$OUT/ab_accum_k4_v2.json"

# 4. streaming/live serving legs (queue2 backlog)
run 3600 python tools/serve_bench.py --vocoder jpwg --stream \
    --out "$OUT/serve_jpwg_stream.json"
run 2400 python tools/serve_bench.py --vocoder gl --stream \
    --out "$OUT/serve_gl_stream.json"
run 2400 python tools/serve_bench.py --vocoder none \
    --out "$OUT/serve_none_v2.json"

# 5. BASELINE config 5 real-chip smoke (VERDICT item 5): the full
#    batch-512 pretrain config on one chip, short run, against the
#    combined dump the CPU drive built (skipped if the workspace is gone)
if [ -d /tmp/verify_pretrain/egs/pretrain/dump/combined_train ]; then
  python - <<'EOF'
import yaml
c = yaml.safe_load(open("egs/pretrain/conf/train_dp_large.yaml"))
# batch 512 is the 8-chip global (64/chip, see the YAML comment); the
# one-chip smoke runs the honest per-chip share
c.update(max_iter=150, iters_per_log=50, iters_per_checkpoint=150,
         batch_size=64)
yaml.safe_dump(c, open("/tmp/verify_pretrain/chip_smoke.yaml", "w"))
EOF
  run 3600 python -m vae_npvc_tpu.bin.train \
      -c /tmp/verify_pretrain/chip_smoke.yaml \
      --train_dir /tmp/verify_pretrain/egs/pretrain/dump/combined_train \
      --valid_dir /tmp/verify_pretrain/egs/pretrain/dump/combined_dev \
      --output_dir /tmp/verify_pretrain/exp_chip
fi

# 6. flat-step residual decomposition (VERDICT item 1)
run 4800 python tools/perf_decompose.py --steps 20 --trace \
    --out "$OUT/decompose.json"

# 7. serving soak (VERDICT item 7a): live engine, then the bundle backend
run 1200 python tools/serve_soak.py --minutes 6 --clients 6 \
    --vocoder none --out "$OUT/soak_live.json"
run 1200 python tools/serve_soak.py --minutes 6 --clients 6 \
    --vocoder none --bundle --out "$OUT/soak_bundle.json"

# 7b. int8 feasibility probe (VERDICT stretch item 8)
run 3600 python tools/int8_probe.py --out "$OUT/int8_probe.json"

# 8. GST scale A/B at 10k-step scale (VERDICT item 4) — needs the CPU-prep
#    workspace (tools/gst_ab_prep.sh)
if [ -d /tmp/verify_vae2/egs/vcc20/vae2/dump/train ]; then
  run 14400 bash tools/gst_ab.sh
fi

echo "QUEUE3 DONE $(date -u +%FT%TZ)" >>"$LOG"
