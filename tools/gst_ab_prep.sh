#!/bin/bash
# CPU prep for tools/gst_ab.sh: synthetic corpus + vae2 recipe stages 0-2
# in a /tmp workspace (feature extraction does not need the chip).
set -euo pipefail
W=${GST_AB_WS:-/tmp/verify_vae2}
rm -rf "$W"; mkdir -p "$W"
cp -r /root/repo/egs "$W"/
export VAE_NPVC_JAX_PLATFORM=cpu PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd "$W/egs/vcc20/vae2"
python ../../utils/make_synth_corpus.py --out "$W/corpus" --fs 24000
bash run.sh --stage 0 --stop_stage 2 \
  --vctk_root "$W/corpus/vctk" --vcc2020_root "$W/corpus/vcc2020" \
  --vcc2020_eval_root "$W/corpus/vcc2020_eval" \
  --transcriptions "$W/corpus/text"
echo "GST_AB_PREP DONE $W"
