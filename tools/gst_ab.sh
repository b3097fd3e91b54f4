#!/bin/bash
# GST activation-scale A/B at training scale (VERDICT r3 item 4).
#
# Two 10k-step flagship vqvae2 runs on the fast path (steps_per_call=8 +
# device-resident corpus; ~18 min each on one v5e chip): the shipped
# penalty-0 default vs gst_scale_penalty=1e-4 (the opt-in log-RMS anchor,
# models/vqvae2.py:170-172). Decision inputs, per run:
#   - valid "X like" trajectory + best (metrics.jsonl)
#   - grad-spike count (train grad_norm > 2x its run median)
#   - gst_in_rms trajectory (the 1e10@1k -> 1e16@6k growth observed r3)
#   - stage 5-7 RESULT line (full wav-domain eval)
# Ship the winner as the YAML default, document in README.
#
# Prereq: a prepared vae2 workspace (stages 0-2 done) at $W — built by
# tools/gst_ab_prep.sh on CPU.
set -u
W=${GST_AB_WS:-/tmp/verify_vae2}
LOG=${GST_AB_LOG:-/tmp/gst_ab.log}
cd "$W/egs/vcc20/vae2" || exit 1
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

wait_up() {
  local t0=$(date +%s)
  while ! (cd /root/repo && timeout 60 python /root/repo/tools/tpu_probe.py >>"$LOG" 2>&1); do
    if [ $(( $(date +%s) - t0 )) -ge 7200 ]; then return 1; fi
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

python - <<'EOF'
import yaml
c = yaml.safe_load(open("conf/train_vqvae2.yaml"))
c.update(max_iter=10000, iters_per_checkpoint=1000, iters_per_log=200)
yaml.safe_dump(c, open("conf/gst_ab_p0.yaml", "w"))
c["gst_scale_penalty"] = 1.0e-4
yaml.safe_dump(c, open("conf/gst_ab_p1.yaml", "w"))
EOF

FLAGS="--transcriptions $W/corpus/text --mcd_gt_root $W/corpus/vcc2020_eval"
for v in p0 p1; do
  # the tunnel flaps ~20 min up / 40 down: retry the train stage (the CLI
  # auto-resumes from iter.N) until the final checkpoint exists
  for attempt in 1 2 3 4; do
    [ -e "exp/train_gst_ab_${v}/iter.10000" ] && break
    run 3600 bash run.sh --stage 3 --stop_stage 3 \
        --train_config conf/gst_ab_${v}.yaml $FLAGS
  done
  run 7200 bash run.sh --stage 5 --stop_stage 7 --trgspk TEF1 \
      --train_config conf/gst_ab_${v}.yaml $FLAGS
done

python - <<'EOF' >>"$LOG" 2>&1
import json
for v in ("p0", "p1"):
    path = f"exp/train_gst_ab_{v}/metrics.jsonl"
    rows = [json.loads(l) for l in open(path)]
    train = [r for r in rows if r.get("split") == "train"]
    valid = [r for r in rows if r.get("split") == "valid"]
    gn = [r.get("grad_norm") for r in train if r.get("grad_norm")]
    med = sorted(gn)[len(gn) // 2] if gn else float("nan")
    spikes = sum(1 for g in gn if g > 2 * med)
    rms = [(r["iter"], r.get("gst_in_rms")) for r in train
           if r.get("gst_in_rms") is not None]
    print(f"[{v}] best valid X like: "
          f"{min((r.get('X like', 1e9) for r in valid), default=None)}")
    print(f"[{v}] grad spikes >2x median: {spikes}/{len(gn)} (median {med:.3f})")
    if rms:
        print(f"[{v}] gst_in_rms first/last: {rms[0]} -> {rms[-1]}")
EOF
echo "GST_AB DONE $(date -u +%FT%TZ)" >>"$LOG"
