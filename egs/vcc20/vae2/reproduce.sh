#!/bin/bash
# One-command reproduction of the README's vae2 headline RESULT row
# (VERDICT r4 item 8): synthesizes the corpus, runs stages 0-8 on the
# current fast path (steps_per_call + device-resident corpus from the
# shipped YAML), and prints the regenerated RESULT line.  Reference
# analog: egs/vcc20/vae2/test.sh:16-24 (the reference's one-line summary
# driver, which assumes pre-downloaded corpora/models).
#
#   bash reproduce.sh                         # full config (chip: ~30 min)
#   bash reproduce.sh --train_config conf/train_vqvae2_smoke.yaml   # smoke
#   bash reproduce.sh --workspace /tmp/mydir --trgspk TEM1
#
# README rows marked "regenerated (reproduce.sh)" come from this script on
# the stated date; other rows are historical.  The corpus is re-synthesized
# per workspace, so cross-row comparisons are only valid within one
# workspace instance.
set -euo pipefail
cd "$(dirname "$0")"

workspace=/tmp/reproduce_vae2
train_config=conf/train_vqvae2.yaml
trgspk=TEF1
srcspk=SEF1
fresh=true            # false = reuse an existing workspace's corpus/features
. ../../utils/parse_flags.sh

W=$workspace
REPO=$(cd ../../.. && pwd)
# the workspace copy of run.sh prepends ITS root; the package lives here
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
if [ "$fresh" = "true" ] || [ ! -d "$W/corpus" ]; then
  rm -rf "$W"; mkdir -p "$W"
  cp -r "$REPO/egs" "$W/"
  (cd "$W/egs/vcc20/vae2" && \
   python ../../utils/make_synth_corpus.py --out "$W/corpus" --fs 24000)
else
  cp -r "$REPO"/egs/vcc20 "$REPO"/egs/utils "$W/egs/"
fi

cd "$W/egs/vcc20/vae2"
FLAGS="--vctk_root $W/corpus/vctk --vcc2020_root $W/corpus/vcc2020 \
 --vcc2020_eval_root $W/corpus/vcc2020_eval \
 --transcriptions $W/corpus/text --train_config $train_config \
 --srcspk $srcspk --trgspk $trgspk"

bash run.sh --stage 0 --stop_stage 3 $FLAGS
bash run.sh --stage 5 --stop_stage 8 $FLAGS \
     --mcd_gt_root "$W/corpus/vcc2020_eval"

expdir=exp/train_$(basename "${train_config%.*}")
echo
echo "=== regenerated row (workspace $W, $(date -u +%F)) ==="
cat "${expdir}/outputs_model.loss.best.ob_eval/RESULT.${srcspk}_${trgspk}"
