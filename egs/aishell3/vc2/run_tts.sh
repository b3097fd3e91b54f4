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
use_spk_embed=false   # condition the TTS on continuous speaker embeddings
                      # (the x-vector analog, reference run_tts.sh:153-192)
                      # instead of the learned speaker-ID table
spk_emb_steps=2000

# stage-5 waveform synthesis (the reference synthesizes decoded TTS mels
# with GL or its downloaded neural vocoder); fbank params = run_vae.sh
voc=GL                # GL | JPWG (native in-framework Parallel WaveGAN)
griffin_lim_iters=64
jpwg_config=conf/train_jpwg.yaml
jpwg_expdir=exp/jpwg
fs=44100
n_fft=2048
n_shift=550
n_mels=160

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
    cp ${dumpdir}/all/utt2num_frames data/tts/ 2>/dev/null || true
    cp data/tts/tokens.txt data/tts/text   # ESPnet-compatible alias
    python local/generate_nlsymbols.py -n ${z_num} -o data/tts/nlsyms.txt
    echo "token-mel dir ready: data/tts"
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ] \
        && [ "${use_spk_embed}" = "true" ]; then
    echo "stage 1a: Speaker-embedding extraction (x-vector analog)"
    ${PY} vae_npvc_tpu.bin.extract_spk_emb -c ${tts_config} \
        --train_dir data/tts --data_dir data/tts \
        --steps ${spk_emb_steps} --spk_mean
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
    if [ "${use_spk_embed}" = "true" ]; then
        ${PY} vae_npvc_tpu.bin.decode_tts -c ${tts_config} \
            --checkpoint exp/token_tts/model.loss.best \
            --tokens data/tts/tokens.txt --spk_emb data/tts/spk_emb.scp \
            --output-dir exp/token_tts/decode
    else
        ${PY} vae_npvc_tpu.bin.decode_tts -c ${tts_config} \
            --checkpoint exp/token_tts/model.loss.best \
            --tokens data/tts/tokens.txt --spk data/tts/utt2spk_id \
            --output-dir exp/token_tts/decode
    fi
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    echo "stage 3: Token-to-mel objective eval (resynthesis MCD + similarity)"
    mcd=$(python - <<EOF
from vae_npvc_tpu.eval.mcd import mcd_from_scp
mean, per_utt = mcd_from_scp("exp/token_tts/decode/feats.scp",
                             "data/tts/feats.scp")
print(f"{mean:.3f}")
EOF
)
    # similarity trials: each synthesized utterance vs its TRUE speaker
    awk '{print $1, $2}' data/tts/utt2spk_id > data/tts/trials_self
    sim_line=$(${PY} vae_npvc_tpu.bin.eval_similarity -c ${tts_config} \
        --train_dir data/tts \
        --converted_scp exp/token_tts/decode/feats.scp \
        --trials data/tts/trials_self --enroll_dir data/tts \
        --steps 800 | tail -1) || sim_line=""
    echo "${sim_line}"
    cossim=$(echo "${sim_line}" | grep -oE 'COSSIM: [-0-9.]+' | cut -d' ' -f2) || true
    plda=$(echo "${sim_line}" | grep -oE 'PLDA: [-0-9.]+' | cut -d' ' -f2) || true
    echo "RESULT token_tts  MCD: ${mcd}  PLDA: ${plda:-n/a}  COSSIM: ${cossim:-n/a}"
fi

if [ "${stage}" -le 4 ] && [ "${stop_stage}" -ge 4 ]; then
    echo "stage 4: Token-route voice conversion (source tokens -> target speaker)"
    # the reference's actual VC use of this stage: recognize VQ tokens from
    # the source, synthesize with the TARGET speaker's conditioning
    # (x-vectors there, enrollment-mean embeddings or ids here)
    python - <<'EOF'
import random
random.seed(7)
utts, spks = [], {}
for ln in open("data/tts/utt2spk_id"):
    u, s = ln.split()
    utts.append(u); spks[u] = s
all_spk = sorted(set(spks.values()))
with open("data/tts/trials_vc", "w") as wf:
    for u in utts[:40]:
        others = [s for s in all_spk if s != spks[u]]
        wf.write(f"{u} {random.choice(others)}\n")
print(f"wrote {min(len(utts),40)} VC trials")
EOF
    if [ "${use_spk_embed}" = "true" ]; then
        # targets are speaker ids in the trials; spk_emb_mean.scp is keyed
        # by the same ids (extract_spk_emb --spk_mean over utt2spk_id)
        ${PY} vae_npvc_tpu.bin.decode_tts -c ${tts_config} \
            --checkpoint exp/token_tts/model.loss.best \
            --tokens data/tts/tokens.txt --trials data/tts/trials_vc \
            --spk_emb data/tts/spk_emb_mean.scp \
            --output-dir exp/token_tts/convert
    else
        ${PY} vae_npvc_tpu.bin.decode_tts -c ${tts_config} \
            --checkpoint exp/token_tts/model.loss.best \
            --tokens data/tts/tokens.txt --trials data/tts/trials_vc \
            --output-dir exp/token_tts/convert
    fi
    sim_line=$(${PY} vae_npvc_tpu.bin.eval_similarity -c ${tts_config} \
        --train_dir data/tts \
        --converted_scp exp/token_tts/convert/feats.scp \
        --trials data/tts/trials_vc --enroll_dir data/tts \
        --steps 800 | tail -1) || sim_line=""
    echo "${sim_line}"
    cossim=$(echo "${sim_line}" | grep -oE 'COSSIM: [-0-9.]+' | cut -d' ' -f2) || true
    plda=$(echo "${sim_line}" | grep -oE 'PLDA: [-0-9.]+' | cut -d' ' -f2) || true
    echo "RESULT token_vc  PLDA: ${plda:-n/a}  COSSIM: ${cossim:-n/a}"
fi

if [ "${stage}" -le 5 ] && [ "${stop_stage}" -ge 5 ]; then
    echo "stage 5: Waveform synthesis (voc=${voc})"
    for outdir in exp/token_tts/decode exp/token_tts/convert; do
        [ -f ${outdir}/feats.scp ] || continue
        denorm=${outdir}_denorm
        ${PY} vae_npvc_tpu.bin.apply_cmvn apply --reverse data/cmvn.ark \
            scp:${outdir}/feats.scp ${denorm}
        if [ "${voc}" = "JPWG" ]; then
            # native in-framework vocoder (models/pwg.py); trains once on
            # the corpus wavs, upsample_scales product must equal ${n_shift}
            if [ ! -f ${jpwg_expdir}/model.final ]; then
                ${PY} vae_npvc_tpu.bin.train_pwg -c ${jpwg_config} \
                    --train_dir data/all --output_dir ${jpwg_expdir}
            fi
            python - <<EOF
from vae_npvc_tpu.infer.vocoder import jpwg_decode_scp
n = jpwg_decode_scp("${denorm}/feats.scp", "${denorm}/wav",
                    "${jpwg_config}", "${jpwg_expdir}/model.final")
print(f"JPWG synthesized {n} wavs -> ${denorm}/wav")
EOF
        else
            ${PY} vae_npvc_tpu.bin.convert_fbank --fs ${fs} \
                --n_fft ${n_fft} --n_shift ${n_shift} --n_mels ${n_mels} \
                --iters ${griffin_lim_iters} ${denorm}/feats.scp ${denorm}/wav
        fi
    done
fi
echo "Finished."
