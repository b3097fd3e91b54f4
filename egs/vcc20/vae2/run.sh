#!/usr/bin/env bash
# VCC2020 flat VQ-VAE voice-conversion recipe (TPU-native framework).
# Stage layout mirrors the reference recipe (reference: egs/vcc20/vae2/run.sh)
# with all external Kaldi/ESPnet binaries replaced by in-framework CLIs:
#   0 data-list generation  1 fbank+CMVN stats  2 spk ids + CMVN dump
#   3 train  5 conversion  6 Griffin-Lim synthesis  7 objective eval (MCD)
set -euo pipefail

stage=0
stop_stage=100

# feature extraction
fs=24000
fmax=7600
fmin=80
n_mels=80
n_fft=1024
n_shift=256

# data roots (set these to your corpus copies)
vctk_root=downloads/VCTK-Corpus/wav
vcc2020_root=downloads/vcc2020

train_config=conf/train_vqvae2.yaml
tag=""
srcspk=SEF1
trgspk=TEF1
griffin_lim_iters=64
no_pipe=true          # plain wav paths + in-framework resampling (no sox)

. ../../utils/parse_flags.sh

train_set=train
dev_set=dev
eval_set=eval
dumpdir=dump
PY="python -m"
export PYTHONPATH="$(cd ../../.. && pwd):${PYTHONPATH:-}"

expname=${train_set}_$(basename ${train_config%.*})${tag:+_$tag}
expdir=exp/${expname}

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "stage 0: Data list generation"
    pipe_flag=""; [ "${no_pipe}" = "true" ] && pipe_flag="--no-pipe"
    # vae2 VCTK split: no test set, dev = utts 1-50 (reference
    # egs/vcc20/vae2/local/generate_vctk_list.py:56-60)
    python local/generate_vctk_list.py -d "${vctk_root}" -l data -f ${fs} ${pipe_flag} \
        --test_hi 0 --dev_lo 1 --dev_hi 50
    python local/generate_vcc2020_traindev_list.py -d "${vcc2020_root}" -l data -f ${fs} ${pipe_flag}
    python local/generate_vcc2020_eval_list.py -d "${vcc2020_root}" -l data -f ${fs} ${pipe_flag}
    for pair in "train vctk_train vcc2020_train" "dev vctk_dev vcc2020_dev" "eval vcc2020_test"; do
        set -- ${pair}; out=$1; shift
        mkdir -p data/${out}
        for f in wav.scp utt2spk; do
            cat $(for d in "$@"; do echo data/${d}/${f}; done) | sort > data/${out}/${f}
        done
        python - "$out" <<'EOF'
import sys
from collections import defaultdict
out = sys.argv[1]
spk2utt = defaultdict(list)
for line in open(f"data/{out}/utt2spk"):
    u, s = line.split()
    spk2utt[s].append(u)
with open(f"data/{out}/spk2utt", "w") as wf:
    for s, us in spk2utt.items():
        wf.write(f"{s} {' '.join(us)}\n")
EOF
    done
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "stage 1: Feature generation (device-batched fbank) + CMVN stats"
    for x in ${train_set} ${dev_set} ${eval_set}; do
        ${PY} vae_npvc_tpu.bin.make_fbank --fs ${fs} ${fmax:+--fmax ${fmax}} ${fmin:+--fmin ${fmin}} \
            --n_fft ${n_fft} --n_shift ${n_shift} --n_mels ${n_mels} \
            data/${x} fbank/${x}
        for f in utt2spk spk2utt; do cp data/${x}/${f} fbank/${x}/ 2>/dev/null || true; done
    done
    ${PY} vae_npvc_tpu.bin.apply_cmvn compute scp:fbank/${train_set}/feats.scp \
        data/${train_set}_cmvn.ark
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
    echo "stage 2: Speaker ids + CMVN dump"
    ${PY} vae_npvc_tpu.bin.make_spk_id fbank/${train_set}
    ${PY} vae_npvc_tpu.bin.make_spk_id fbank/${dev_set} --spk2spk_id fbank/${train_set}/spk2spk_id
    for x in ${train_set} ${dev_set} ${eval_set}; do
        ${PY} vae_npvc_tpu.bin.apply_cmvn apply data/${train_set}_cmvn.ark \
            scp:fbank/${x}/feats.scp ${dumpdir}/${x}
        for f in utt2num_frames utt2spk_id utt2spk spk2spk_id; do
            cp fbank/${x}/${f} ${dumpdir}/${x}/ 2>/dev/null || true
        done
    done
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    echo "stage 3: Training"
    mkdir -p ${expdir}
    ${PY} vae_npvc_tpu.bin.train -c ${train_config} \
        --train_dir ${dumpdir}/${train_set} --valid_dir ${dumpdir}/${dev_set} \
        --output_dir ${expdir}
fi

outdir=${expdir}/outputs_model.loss.best
if [ "${stage}" -le 5 ] && [ "${stop_stage}" -ge 5 ]; then
    echo "stage 5: Conversion ${srcspk} -> ${trgspk}"
    python local/make_trials.py ${dumpdir}/${eval_set} -s ${srcspk} -t ${trgspk}
    cp ${dumpdir}/${train_set}/spk2spk_id ${dumpdir}/${eval_set}/ 2>/dev/null || true
    ${PY} vae_npvc_tpu.bin.decode -c ${train_config} \
        --checkpoint ${expdir}/model.loss.best \
        --decode-dir ${dumpdir}/${eval_set} \
        --output-dir ${outdir}/${srcspk}_${trgspk}
fi

if [ "${stage}" -le 6 ] && [ "${stop_stage}" -ge 6 ]; then
    echo "stage 6: Griffin-Lim synthesis"
    denorm=${outdir}_denorm/${srcspk}_${trgspk}
    ${PY} vae_npvc_tpu.bin.apply_cmvn apply --reverse data/${train_set}_cmvn.ark \
        scp:${outdir}/${srcspk}_${trgspk}/feats.scp ${denorm}
    ${PY} vae_npvc_tpu.bin.convert_fbank --fs ${fs} ${fmax:+--fmax ${fmax}} ${fmin:+--fmin ${fmin}} \
        --n_fft ${n_fft} --n_shift ${n_shift} --n_mels ${n_mels} \
        --iters ${griffin_lim_iters} ${denorm}/feats.scp ${denorm}/wav
fi

if [ "${stage}" -le 7 ] && [ "${stop_stage}" -ge 7 ]; then
    echo "stage 7: Objective evaluation (MCD vs target-speaker references)"
    python - <<EOF
from vae_npvc_tpu.eval.mcd import mcd_from_scp
try:
    mean, per_utt = mcd_from_scp(
        "${outdir}_denorm/${srcspk}_${trgspk}/feats.scp",
        "fbank/${eval_set}/feats.scp")
    print(f"MCD: {mean:.3f} dB over {len(per_utt)} utterances")
except ValueError as e:
    print(f"MCD skipped: {e}")
EOF
    ${PY} vae_npvc_tpu.bin.eval_similarity -c ${train_config} \
        --train_dir ${dumpdir}/${train_set} \
        --converted_scp ${outdir}/${srcspk}_${trgspk}/feats.scp \
        --trials ${dumpdir}/${eval_set}/trials \
        --enroll_dir ${dumpdir}/${train_set} --steps 1000 || \
        echo "similarity eval skipped"
fi
echo "Finished."
