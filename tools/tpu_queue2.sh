#!/bin/bash
# Follow-up on-chip queue (round 3, after tools/tpu_queue.sh drained).
# Everything the first queue measured under the then-default fused GroupNorm
# kernel — since reverted to the stock XLA path (ops/groupnorm_pallas.py
# docstring) — is re-taken here under the shipped default, plus the new
# streaming-serving legs.
set -u
cd /root/repo || exit 1
OUT=/tmp/onchip
mkdir -p "$OUT"
LOG=${TPU_QUEUE_LOG:-/tmp/tpu_queue2.log}

run() {
  local t=$1; shift
  echo "=== $(date -u +%FT%TZ) [$t s] $*" >>"$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  echo "--- exit=$? $(date -u +%FT%TZ)" >>"$LOG"
}

# 1. stock-path re-measurement of the rows the 08-19 sweep took fused
run 3600 python tools/perf_families.py --steps 20 \
    --families vqvae2a,vqvae2b --out "$OUT/fam_2a2b_stock.json"
# 2. dispatch A/Bs, clean defaults (first-queue runs had fused GN on)
run 1800 python tools/perf_families.py --families flat --scan_k 8 \
    --out "$OUT/ab_scan_k8_v2.json"
run 1800 python tools/perf_families.py --families flat --dev_res_k 8 \
    --out "$OUT/ab_dev_res_k8_v2.json"
run 1800 python tools/perf_families.py --families flat --accum_k 4 \
    --out "$OUT/ab_accum_k4_v2.json"
# 3. streaming-serving legs: TTFA vs total, jpwg showcase + gl contrast
run 3600 python tools/serve_bench.py --vocoder jpwg --stream \
    --out "$OUT/serve_jpwg_stream.json"
run 2400 python tools/serve_bench.py --vocoder gl --stream \
    --out "$OUT/serve_gl_stream.json"
# 3b. live backend after the pow2 batch-padding fix (was 3.7 rps vs the
#     bundle's 48.6 — per-group-size recompiles)
run 2400 python tools/serve_bench.py --vocoder none \
    --out "$OUT/serve_none_v2.json"
# 4. headline bench under the restored default
run 2400 python bench.py

echo "QUEUE2 DONE $(date -u +%FT%TZ)" >>"$LOG"
