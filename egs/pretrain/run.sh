#!/usr/bin/env bash
# Large-batch data-parallel VQ-VAE pretrain over the combined
# AISHELL-3 + VCC2020/VCTK corpora (BASELINE config 5).
#
# No reference counterpart: the reference's recipes are single-corpus; this
# recipe realizes the BASELINE.json "Large-batch data-parallel VQ-VAE
# pretrain on combined AISHELL-3+VCC2020 across a TPU slice" workload.
#
# Every corpus is extracted with ONE shared front-end (fs/n_mels below):
# AISHELL-3's native recipe front-end is 44.1 kHz/160 mel and VCC2020's is
# 24 kHz/80 mel — dumped dirs from those recipes can NOT be concatenated
# directly, so stage 1 re-extracts here (make_fbank resamples in-framework).
# CMVN is per-corpus (each recipe normalizes its own dump; concatenation
# happens after normalization). Speaker ids are remapped into disjoint
# ranges by local/combine_data.py; dev dirs carry each corpus's FULL
# spk2spk_id so the train/dev remaps agree.
#
#   0 data lists   1 shared-front-end fbank + per-corpus CMVN
#   2 spk ids + dump + combine   3 train (DP over all visible chips)
set -euo pipefail

stage=0
stop_stage=100

# shared front-end (VCC2020's; AISHELL-3 audio is resampled in-framework)
fs=24000
fmax=7600
fmin=80
n_mels=80
n_fft=1024
n_shift=256

# corpus roots
vctk_root=downloads/VCTK-Corpus/wav
vcc2020_root=downloads/vcc2020
aishell3_root=downloads/aishell3

# AISHELL-3 train/valid utterance split (reference run_vae.sh:108-111 takes
# 60000/3200 at full scale)
num_train=60000
num_valid=3200

train_config=conf/train_dp_large.yaml
tag=""
no_pipe=true

. ../utils/parse_flags.sh

dumpdir=dump
PY="python -m"
export PYTHONPATH="$(cd ../.. && pwd):${PYTHONPATH:-}"

expname=pretrain_$(basename ${train_config%.*})${tag:+_$tag}
expdir=exp/${expname}

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "stage 0: Data list generation (both corpora)"
    pipe_flag=""; [ "${no_pipe}" = "true" ] && pipe_flag="--no-pipe"
    python ../vcc20/vae1/local/generate_vctk_list.py -d "${vctk_root}" -l data -f ${fs} ${pipe_flag}
    python ../vcc20/vae1/local/generate_vcc2020_traindev_list.py -d "${vcc2020_root}" -l data -f ${fs} ${pipe_flag}
    python ../aishell3/vc2/local/data_prep.py -d "${aishell3_root}" -l data/aishell3_all -f ${fs} ${pipe_flag}
    # merge the VCC2020-side lists (same merge as vcc20/vae1 stage 0)
    for pair in "vcc20_train vctk_train vcc2020_train" "vcc20_dev vctk_dev vcc2020_dev"; do
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
    echo "stage 1: Shared-front-end fbank + per-corpus CMVN stats"
    for x in vcc20_train vcc20_dev aishell3_all; do
        ${PY} vae_npvc_tpu.bin.make_fbank --fs ${fs} ${fmax:+--fmax ${fmax}} ${fmin:+--fmin ${fmin}} \
            --n_fft ${n_fft} --n_shift ${n_shift} --n_mels ${n_mels} \
            data/${x} fbank/${x}
        for f in utt2spk spk2utt; do cp data/${x}/${f} fbank/${x}/ 2>/dev/null || true; done
    done
    ${PY} vae_npvc_tpu.bin.apply_cmvn compute scp:fbank/vcc20_train/feats.scp data/vcc20_cmvn.ark
    ${PY} vae_npvc_tpu.bin.apply_cmvn compute scp:fbank/aishell3_all/feats.scp data/aishell3_cmvn.ark
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
    echo "stage 2: Speaker ids + CMVN dump + combine"
    ${PY} vae_npvc_tpu.bin.make_spk_id fbank/vcc20_train
    ${PY} vae_npvc_tpu.bin.make_spk_id fbank/vcc20_dev --spk2spk_id fbank/vcc20_train/spk2spk_id
    ${PY} vae_npvc_tpu.bin.make_spk_id fbank/aishell3_all
    for x in vcc20_train vcc20_dev aishell3_all; do
        src=data/vcc20_cmvn.ark; [ "${x}" = "aishell3_all" ] && src=data/aishell3_cmvn.ark
        ${PY} vae_npvc_tpu.bin.apply_cmvn apply ${src} scp:fbank/${x}/feats.scp ${dumpdir}/${x}
        for f in utt2num_frames utt2spk_id utt2spk; do
            cp fbank/${x}/${f} ${dumpdir}/${x}/ 2>/dev/null || true
        done
    done
    # both vcc20 splits resolve speakers through the TRAIN map
    cp fbank/vcc20_train/spk2spk_id ${dumpdir}/vcc20_train/
    cp fbank/vcc20_train/spk2spk_id ${dumpdir}/vcc20_dev/
    cp fbank/aishell3_all/spk2spk_id ${dumpdir}/aishell3_all/
    # AISHELL-3 train/valid split (utt2spk_id + full spk map ride along)
    touch ${dumpdir}/aishell3_all/wav.scp
    ${PY} vae_npvc_tpu.bin.subset_data_into_tr_cv ${dumpdir}/aishell3_all \
        ${dumpdir}/aishell3_train ${dumpdir}/aishell3_dev \
        -nt ${num_train} -nv ${num_valid} --seed 777
    for x in aishell3_train aishell3_dev; do
        python - "$x" "${dumpdir}" <<'EOF'
import sys
x, dump = sys.argv[1], sys.argv[2]
ids = dict(l.split() for l in open(f"{dump}/aishell3_all/utt2spk_id"))
utts = [l.split()[0] for l in open(f"{dump}/{x}/utt2spk")]
with open(f"{dump}/{x}/utt2spk_id", "w") as wf:
    for u in utts:
        wf.write(f"{u} {ids[u]}\n")
EOF
        cp ${dumpdir}/aishell3_all/spk2spk_id ${dumpdir}/${x}/
    done
    # disjoint-speaker-range concatenation (dir order pins the id ranges —
    # keep train and dev orders identical)
    python local/combine_data.py ${dumpdir}/combined_train \
        ${dumpdir}/vcc20_train ${dumpdir}/aishell3_train
    python local/combine_data.py ${dumpdir}/combined_dev \
        ${dumpdir}/vcc20_dev ${dumpdir}/aishell3_dev
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    echo "stage 3: Large-batch DP training (all visible chips)"
    mkdir -p ${expdir}
    ${PY} vae_npvc_tpu.bin.train -c ${train_config} \
        --train_dir ${dumpdir}/combined_train --valid_dir ${dumpdir}/combined_dev \
        --output_dir ${expdir}
fi
