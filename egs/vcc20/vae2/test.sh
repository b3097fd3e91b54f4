#!/usr/bin/env bash
# Smoke/eval driver: train then convert→synthesize→evaluate for each target
# speaker, grepping a one-line metric summary (the analog of the reference's
# only test artifact, egs/vcc20/vae1/test.sh).
set -euo pipefail
targets="${1:-TEF1 TEF2 TEM1 TEM2}"
shift || true

./run.sh --stage 3 --stop-stage 3 "$@"
for trg in ${targets}; do
    ./run.sh --stage 5 --stop-stage 7 --trgspk "${trg}" "$@" | tee /tmp/eval_${trg}.log
    # full reference metric line (reference test.sh:16-24):
    # RESULT <src>_<trg>  MCD: x  CER: x  WER: x  PLDA: x  COSSIM: x
    grep '^RESULT ' /tmp/eval_${trg}.log | tail -1 | sed "s/^RESULT/SUMMARY/"
done
