#!/usr/bin/env bash
# AISHELL-3 second-stage recipe: VQ tokens as "text" for a token-to-mel TTS.
# The reference trains an EXTERNAL ESPnet Tacotron2/Transformer TTS on the VQ
# token transcripts with Kaldi x-vector speaker embeddings (reference:
# egs/aishell3/vc2/run_tts.sh — the TTS model itself never lived in the
# reference repo either). This script covers the in-framework portion: token
# "text" preparation and the symbol dictionary; point ${tts_cmd} at your TTS
# trainer for the final stage.
set -euo pipefail

stage=0
stop_stage=100
expdir=exp/train_train_vqvae
z_num=128
tts_cmd=""   # external token-to-mel trainer command; left to the user, as in
             # the reference (its stage 5 calls ESPnet's tts_train.py)

. ../../utils/parse_flags.sh
export PYTHONPATH="$(cd ../../.. && pwd):${PYTHONPATH:-}"

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "stage 0: VQ-token text preparation"
    [ -f ${expdir}/vq_tokens.txt ] || {
        echo "run run_vae.sh stage 4 first (produces ${expdir}/vq_tokens.txt)"; exit 1; }
    mkdir -p data/tts
    cp ${expdir}/vq_tokens.txt data/tts/text
    python local/generate_nlsymbols.py -n ${z_num} -o data/tts/nlsyms.txt
    echo "token text: data/tts/text; symbols: data/tts/nlsyms.txt"
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "stage 1: Token-to-mel TTS training (external)"
    if [ -n "${tts_cmd}" ]; then
        ${tts_cmd} data/tts
    else
        echo "No --tts-cmd given. The reference delegates this stage to"
        echo "ESPnet (tts_train.py with x-vector speaker embeddings); plug in"
        echo "your token-to-mel trainer here."
    fi
fi
echo "Finished."
