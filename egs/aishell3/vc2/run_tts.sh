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
dumpdir=dump
z_num=128
tts_config=conf/train_token_tts.yaml
tts_cmd=""   # optional external trainer; by default the IN-FRAMEWORK
             # token-to-mel model (vae_npvc_tpu.bin.train_tts) is used

. ../../utils/parse_flags.sh
export PYTHONPATH="$(cd ../../.. && pwd):${PYTHONPATH:-}"

PY="python -m"

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "stage 0: VQ-token text + duration preparation"
    [ -f ${expdir}/vq_tokens.txt ] || {
        echo "run run_vae.sh stage 4 first (extract_bnf -k csid with"
        echo "--durations ${expdir}/vq_durations.txt produces both files)"
        exit 1; }
    mkdir -p data/tts
    cp ${expdir}/vq_tokens.txt data/tts/tokens.txt
    cp ${expdir}/vq_durations.txt data/tts/durations.txt 2>/dev/null || {
        echo "missing ${expdir}/vq_durations.txt (rerun extract_bnf with --durations)"; exit 1; }
    cp ${dumpdir}/all/feats.scp ${dumpdir}/all/utt2spk_id data/tts/
    cp data/tts/tokens.txt data/tts/text   # ESPnet-compatible alias
    python local/generate_nlsymbols.py -n ${z_num} -o data/tts/nlsyms.txt
    echo "token-mel dir ready: data/tts"
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "stage 1: Token-to-mel synthesizer training"
    if [ -n "${tts_cmd}" ]; then
        ${tts_cmd} data/tts
    else
        ${PY} vae_npvc_tpu.bin.train_tts -c ${tts_config}             --train_dir data/tts --output_dir exp/token_tts
    fi
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
    echo "stage 2: Token-to-mel synthesis (per-utterance speakers)"
    ${PY} vae_npvc_tpu.bin.decode_tts -c ${tts_config}         --checkpoint exp/token_tts/model.loss.best         --tokens data/tts/tokens.txt --spk data/tts/utt2spk_id         --output-dir exp/token_tts/decode
fi
echo "Finished."
