#!/usr/bin/env bash
# AISHELL-3 Mandarin voice-conversion recipe: flat EMA-VQ-VAE + VQ-token
# extraction feeding a token-to-mel TTS stage.
# Stage layout mirrors the reference (reference: egs/aishell3/vc2/run_vae.sh):
#   0 list gen  1 fbank+CMVN  2 spk ids + train/valid split + dump
#   3 train  4 VQ-token (csid) extraction  5 conversion
set -euo pipefail

stage=0
stop_stage=100

# feature extraction (44.1 kHz / 160 mels / hop 550 ≈ 80 fps)
fs=44100
fmax=""
fmin=""
n_mels=160
n_fft=2048
n_shift=550

aishell3_root=downloads/aishell3
train_config=conf/train_vqvae.yaml
tag=""
num_train=60000
num_valid=3200
no_pipe=true          # plain wav paths + in-framework resampling (no sox)

. ../../utils/parse_flags.sh

all_set=all
train_set=train
dev_set=dev
dumpdir=dump
PY="python -m"
export PYTHONPATH="$(cd ../../.. && pwd):${PYTHONPATH:-}"

expname=${train_set}_$(basename ${train_config%.*})${tag:+_$tag}
expdir=exp/${expname}

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "stage 0: Data list generation"
    pipe_flag=""; [ "${no_pipe}" = "true" ] && pipe_flag="--no-pipe"
    python local/data_prep.py -d "${aishell3_root}" -l data/${all_set} -f ${fs} ${pipe_flag}
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "stage 1: Feature generation + CMVN stats"
    ${PY} vae_npvc_tpu.bin.make_fbank --fs ${fs} ${fmax:+--fmax ${fmax}} ${fmin:+--fmin ${fmin}} \
        --n_fft ${n_fft} --n_shift ${n_shift} --n_mels ${n_mels} \
        data/${all_set} fbank/${all_set}
    for f in utt2spk spk2utt; do cp data/${all_set}/${f} fbank/${all_set}/ 2>/dev/null || true; done
    ${PY} vae_npvc_tpu.bin.apply_cmvn compute scp:fbank/${all_set}/feats.scp \
        data/cmvn.ark
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
    echo "stage 2: Speaker ids + random train/valid split + CMVN dump"
    ${PY} vae_npvc_tpu.bin.make_spk_id fbank/${all_set}
    ${PY} vae_npvc_tpu.bin.apply_cmvn apply data/cmvn.ark \
        scp:fbank/${all_set}/feats.scp ${dumpdir}/${all_set}
    for f in utt2num_frames utt2spk_id utt2spk spk2spk_id; do
        cp fbank/${all_set}/${f} ${dumpdir}/${all_set}/ 2>/dev/null || true
    done
    cp fbank/${all_set}/utt2spk ${dumpdir}/${all_set}/utt2spk 2>/dev/null || true
    touch ${dumpdir}/${all_set}/wav.scp
    ${PY} vae_npvc_tpu.bin.subset_data_into_tr_cv ${dumpdir}/${all_set} \
        ${dumpdir}/${train_set} ${dumpdir}/${dev_set} \
        -nt ${num_train} -nv ${num_valid} --seed 777
    for x in ${train_set} ${dev_set}; do
        # re-derive utt2spk_id for the subset
        python - "$x" "${dumpdir}" <<'EOF'
import sys
x, dump = sys.argv[1], sys.argv[2]
ids = dict(l.split() for l in open(f"{dump}/all/utt2spk_id"))
utts = [l.split()[0] for l in open(f"{dump}/{x}/utt2spk")]
with open(f"{dump}/{x}/utt2spk_id", "w") as wf:
    for u in utts:
        wf.write(f"{u} {ids[u]}\n")
EOF
        # the speaker-name -> id map rides along: stage 5's trials name
        # targets by speaker (decode resolves them via spk2spk_id,
        # reference decoder/basic.py:50-53)
        cp ${dumpdir}/${all_set}/spk2spk_id ${dumpdir}/${x}/ 2>/dev/null || true
    done
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    echo "stage 3: Training"
    mkdir -p ${expdir}
    ${PY} vae_npvc_tpu.bin.train -c ${train_config} \
        --train_dir ${dumpdir}/${train_set} --valid_dir ${dumpdir}/${dev_set} \
        --output_dir ${expdir}
fi

if [ "${stage}" -le 4 ] && [ "${stop_stage}" -ge 4 ]; then
    echo "stage 4: VQ-token (csid) extraction for the TTS stage"
    ${PY} vae_npvc_tpu.bin.extract_bnf -c ${train_config} \
        -m ${expdir}/model.loss.best -k csid \
        --durations ${expdir}/vq_durations.txt \
        scp:${dumpdir}/${all_set}/feats.scp ${expdir}/vq_tokens.txt
    echo "VQ token transcripts: ${expdir}/vq_tokens.txt"
fi

if [ "${stage}" -le 5 ] && [ "${stop_stage}" -ge 5 ]; then
    echo "stage 5: Any-to-many conversion over the dev split"
    # random source/target trials (reference uses make_trials.py variants)
    python ../../vcc20/vae2/local/make_trials.py ${dumpdir}/${dev_set} -n 50 --seed 777
    ${PY} vae_npvc_tpu.bin.decode -c ${train_config}         --checkpoint ${expdir}/model.loss.best         --decode-dir ${dumpdir}/${dev_set}         --output-dir ${expdir}/decode_${dev_set}
fi

if [ "${stage}" -le 6 ] && [ "${stop_stage}" -ge 6 ]; then
    echo "stage 6: Serving-bundle export (StableHLO deployment artifact)"
    ${PY} vae_npvc_tpu.bin.export_serving -c ${train_config} \
        -m ${expdir}/model.loss.best -o ${expdir}/serving_bundle \
        --max_frames 2048 --spk2spk_id ${dumpdir}/${train_set}/spk2spk_id
    ${PY} vae_npvc_tpu.bin.bundle_check \
        --bundle ${expdir}/serving_bundle \
        --decode_dir ${dumpdir}/${dev_set} \
        --offline_scp ${expdir}/decode_${dev_set}/feats.scp
fi
echo "Finished."
