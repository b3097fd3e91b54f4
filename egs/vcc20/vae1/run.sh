#!/usr/bin/env bash
# VCC2020 flat VQ-VAE voice-conversion recipe (TPU-native framework).
# Stage layout mirrors the reference recipe (reference: egs/vcc20/vae1/run.sh)
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
vcc2020_eval_root=""          # defaults to ${vcc2020_root}
transcriptions=""             # master "<utt> <text>" file enabling CER/WER
                              # eval (the synthetic corpus writes one;
                              # reference analog: Eng_transcriptions.txt,
                              # evaluate.sh:104)

train_config=conf/train_vqvae.yaml
tag=""
srcspk=SEF1
trgspk=TEF1
voc=GL                        # GL (Griffin-Lim), PWG / MG (external
                              # parallel_wavegan package + pretrained
                              # ParallelWaveGAN / Multi-Band-MelGAN model,
                              # reference run.sh:192-239), or JPWG (the
                              # NATIVE in-framework JAX vocoder — trains on
                              # this corpus, no downloads)
voc_expdir=exp/parallel_wavegan
mg_expdir=exp/multiband_melgan
jpwg_config=conf/train_jpwg.yaml
jpwg_expdir=exp/jpwg
griffin_lim_iters=64
eval_checkpoint=model.loss.best   # stage 5-7 checkpoint (e.g. iter.3000 —
                                  # per-checkpoint eval ladders, reproduce.sh)
shared_asr_ckpt=""            # score with ONE recognizer across expdirs
shared_lm_ckpt=""             # (A/B fairness + per-checkpoint eval ladders)
shared_embedder_ckpt=""       # likewise for the speaker embedder
asr_steps=3000                # CTC-proxy recognizer training steps (stage 7)
asr_arch=conv                 # CTC-proxy encoder: conv | transformer (the
                              # reference eval ASR's architecture family)
asr_decode_config=conf/ob_eval/decode_asr.yaml  # beam/LM decode knobs
                              # (reference evaluate.sh:134-136 decode yaml)
asr_frontend=mel              # mel: score the converted mel features
                              # directly; fbank_pitch: the reference chain —
                              # re-extract 16 kHz fbank+pitch from the
                              # synthesized wavs (make_fbank_pitch.sh analog,
                              # reference evaluate.sh:110-115 + conf/pitch.conf)
                              # and train/score the CTC proxy on those;
                              # needs stage 6 (voc) output
sim_steps=1000                # speaker-embedder training steps (stage 7)
sim_frontend=mel              # mel: embed dump-dir mels directly; mfcc_vad:
                              # the reference's wav-domain chain (30-dim
                              # Kaldi-semantics MFCC + energy VAD over the
                              # synthesized wavs, conf/mfcc.conf+vad.conf —
                              # reference evaluate_similarity.sh:82-104);
                              # needs stage 6 (voc) output
mcd_gt_root=""                # target-speaker ground-truth wav root; when
                              # set, stage 7 computes wav-domain mcep MCD
                              # with the reference knob set (evaluate.sh:57-69)
mcep_dim=34
shiftms=5
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
    python local/generate_vctk_list.py -d "${vctk_root}" -l data -f ${fs} ${pipe_flag}
    python local/generate_vcc2020_traindev_list.py -d "${vcc2020_root}" -l data -f ${fs} ${pipe_flag}
    python local/generate_vcc2020_eval_list.py -d "${vcc2020_eval_root:-${vcc2020_root}}" -l data -f ${fs} ${pipe_flag}
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
    if [ -n "${transcriptions}" ] && [ -f "${transcriptions}" ]; then
        for x in ${train_set} ${dev_set} ${eval_set}; do
            python - "${transcriptions}" "data/${x}" <<'EOF'
import sys
master = dict(line.split(maxsplit=1)
              for line in open(sys.argv[1]) if line.strip())
utts = [line.split()[0] for line in open(f"{sys.argv[2]}/utt2spk")]
with open(f"{sys.argv[2]}/text", "w") as wf:
    for u in utts:
        if u in master:
            wf.write(f"{u} {master[u].strip()}\n")
EOF
        done
    fi
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
        cp data/${x}/text ${dumpdir}/${x}/ 2>/dev/null || true
    done
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    echo "stage 3: Training"
    mkdir -p ${expdir}
    ${PY} vae_npvc_tpu.bin.train -c ${train_config} \
        --train_dir ${dumpdir}/${train_set} --valid_dir ${dumpdir}/${dev_set} \
        --output_dir ${expdir}
fi

outdir=${expdir}/outputs_${eval_checkpoint}
if [ "${stage}" -le 5 ] && [ "${stop_stage}" -ge 5 ]; then
    echo "stage 5: Conversion ${srcspk} -> ${trgspk}"
    python local/make_trials.py ${dumpdir}/${eval_set} -s ${srcspk} -t ${trgspk}
    cp ${dumpdir}/${train_set}/spk2spk_id ${dumpdir}/${eval_set}/ 2>/dev/null || true
    ${PY} vae_npvc_tpu.bin.decode -c ${train_config} \
        --checkpoint ${expdir}/${eval_checkpoint} \
        --decode-dir ${dumpdir}/${eval_set} \
        --output-dir ${outdir}/${srcspk}_${trgspk}
fi

if [ "${stage}" -le 6 ] && [ "${stop_stage}" -ge 6 ]; then
    echo "stage 6: Waveform synthesis (voc=${voc})"
    denorm=${outdir}_denorm/${srcspk}_${trgspk}
    ${PY} vae_npvc_tpu.bin.apply_cmvn apply --reverse data/${train_set}_cmvn.ark \
        scp:${outdir}/${srcspk}_${trgspk}/feats.scp ${denorm}
    if [ "${voc}" = "PWG" ] || [ "${voc}" = "MG" ]; then
        # optional external backends (reference run.sh:192-239); need the
        # parallel_wavegan package + a pretrained model dir
        if [ "${voc}" = "MG" ]; then voc_expdir=${mg_expdir}; fi
        python - <<EOF
from vae_npvc_tpu.infer.vocoder import external_decode_scp
n = external_decode_scp("${denorm}/feats.scp", "${denorm}/wav",
                        "${voc_expdir}")
print(f"${voc} synthesized {n} wavs")
EOF
    elif [ "${voc}" = "JPWG" ]; then
        # NATIVE neural vocoder: the in-framework JAX Parallel WaveGAN
        # (models/pwg.py) — no external package or downloaded model; trains
        # once on the experiment's own corpus, then vocodes batched
        if [ ! -f ${jpwg_expdir}/model.final ]; then
            ${PY} vae_npvc_tpu.bin.train_pwg -c ${jpwg_config} \
                --train_dir data/${train_set} --output_dir ${jpwg_expdir}
        fi
        python - <<EOF
from vae_npvc_tpu.infer.vocoder import jpwg_decode_scp
n = jpwg_decode_scp("${denorm}/feats.scp", "${denorm}/wav",
                    "${jpwg_config}", "${jpwg_expdir}/model.final")
print(f"JPWG synthesized {n} wavs")
EOF
    else
        ${PY} vae_npvc_tpu.bin.convert_fbank --fs ${fs} ${fmax:+--fmax ${fmax}} ${fmin:+--fmin ${fmin}} \
            --n_fft ${n_fft} --n_shift ${n_shift} --n_mels ${n_mels} \
            --iters ${griffin_lim_iters} ${denorm}/feats.scp ${denorm}/wav
    fi
fi

if [ "${stage}" -le 7 ] && [ "${stop_stage}" -ge 7 ]; then
    echo "stage 7: Objective evaluation (MCD / CER / WER / PLDA / COSSIM)"
    obdir=${outdir}.ob_eval
    pair=${srcspk}_${trgspk}
    mkdir -p ${obdir}/asr/${pair} ${obdir}/asv/${pair}

    if [ -n "${mcd_gt_root}" ] && [ -d "${outdir}_denorm/${pair}/wav" ]; then
        # reference-faithful mode: wav-domain mcep MCD against the target
        # speaker's ground-truth recordings, per-speaker f0 range from
        # conf/<trgspk>.f0 (reference evaluate.sh:57-69)
        f0_conf=""
        [ -f conf/${trgspk}.f0 ] && f0_conf="conf/${trgspk}.f0"
        mcd=$(python - <<EOF
from vae_npvc_tpu.eval.mcd import mcd_from_wavdirs
try:
    mean, per_utt = mcd_from_wavdirs(
        "${outdir}_denorm/${pair}/wav", "${mcd_gt_root}/${trgspk}",
        f0_conf="${f0_conf}" or None,
        mcep_dim=${mcep_dim}, shiftms=${shiftms})
    print(f"{mean:.3f}")
except ValueError:
    print("n/a")
EOF
)
    else
        # mel-proxy mode (documented deviation, eval/mcd.py): DCT-of-log-mel
        # cepstra of converted features vs the source eval features
        mcd=$(python - <<EOF
from vae_npvc_tpu.eval.mcd import mcd_from_scp
try:
    mean, per_utt = mcd_from_scp(
        "${outdir}_denorm/${pair}/feats.scp",
        "fbank/${eval_set}/feats.scp")
    print(f"{mean:.3f}")
except ValueError:
    print("n/a")
EOF
)
    fi
    echo "MCD: ${mcd}"

    cer=n/a; wer=n/a
    if [ -f ${dumpdir}/${train_set}/text ] && [ -f data/${eval_set}/text ]; then
        # CER/WER of converted speech, scored against the source-utterance
        # transcripts with the in-framework CTC proxy recognizer (the
        # reference downloads a pretrained ESPnet ASR, evaluate.sh:72-155)
        asr_train_dir=${dumpdir}/${train_set}
        asr_scp=${outdir}/${pair}/feats.scp
        asr_ckpt=${expdir}/ctc_proxy.msgpack
        if [ "${asr_frontend}" = "fbank_pitch" ] && [ ! -d "${outdir}_denorm/${pair}/wav" ]; then
            echo "ERROR: --asr_frontend fbank_pitch needs the synthesized wavs"
            echo "       (${outdir}_denorm/${pair}/wav missing; run stage 6)"
            exit 1
        fi
        if [ "${asr_frontend}" = "fbank_pitch" ]; then
            # reference-chain mode: 16 kHz fbank+pitch re-extracted from the
            # synthesized wavs (in-framework make_fbank_pitch.sh)
            fpdir=fbank_pitch
            if [ ! -f ${fpdir}/${train_set}/feats.scp ]; then
                ${PY} vae_npvc_tpu.bin.make_fbank --fs 16000 --n_fft 512 \
                    --n_shift 160 --n_mels 80 --fmin 20 --fmax 7600 --pitch \
                    data/${train_set} ${fpdir}/${train_set}
                cp ${dumpdir}/${train_set}/text ${fpdir}/${train_set}/text
            fi
            convdir=${fpdir}/${pair}_converted
            mkdir -p ${convdir}
            (cd ${outdir}_denorm/${pair}/wav && \
                for f in *.wav; do echo "${f%.wav} $(pwd)/${f}"; done) \
                > ${convdir}/wav.scp
            ${PY} vae_npvc_tpu.bin.make_fbank --fs 16000 --n_fft 512 \
                --n_shift 160 --n_mels 80 --fmin 20 --fmax 7600 --pitch \
                ${convdir} ${convdir}
            asr_train_dir=${fpdir}/${train_set}
            asr_scp=${convdir}/feats.scp
            asr_ckpt=${expdir}/ctc_proxy_fbank_pitch.msgpack
        fi
        # decode knobs from the reference-shaped yaml (beam-size/lm-weight/
        # lm-order/penalty; reference conf/ob_eval/decode_asr.yaml)
        if [ -n "${shared_asr_ckpt}" ]; then asr_ckpt=${shared_asr_ckpt}; fi
        asr_decode_opts=""
        if [ -f "${asr_decode_config}" ]; then
            # missing keys fall back to defaults (the reference's actual
            # decode_asr.yaml has no lm-order key)
            knob () { v=$(grep -E "^$1:" ${asr_decode_config} | head -1 \
                      | sed -e 's/#.*//' | awk -F': *' '{print $2}'); \
                      echo "${v:-$2}"; }
            asr_decode_opts="--beam_size $(knob beam-size 10) \
                --lm_weight $(knob lm-weight 0.6) \
                --lm_type $(knob lm-type ngram) \
                --lm_order $(knob lm-order 3) \
                --penalty $(knob penalty 0.0) \
                --lm_ckpt ${shared_lm_ckpt:-${expdir}/char_lm.msgpack}"
        fi
        asr_line=$(${PY} vae_npvc_tpu.bin.eval_asr \
            --train_dir ${asr_train_dir} \
            --eval_scp ${asr_scp} \
            --ref_text data/${eval_set}/text \
            --output_dir ${obdir}/asr/${pair} --steps ${asr_steps} \
            --arch ${asr_arch} \
            ${asr_decode_opts} \
            --recognizer_ckpt ${asr_ckpt} | tail -1)
        echo "${asr_line}"
        cer=$(echo "${asr_line}" | grep -oE 'CER: [0-9.]+' | cut -d' ' -f2) || true
        wer=$(echo "${asr_line}" | grep -oE 'WER: [0-9.]+' | cut -d' ' -f2) || true
    else
        echo "CER/WER skipped: no transcripts (set --transcriptions)"
    fi

    sim_extra=""
    if [ "${sim_frontend}" = "mfcc_vad" ] && [ ! -d "${outdir}_denorm/${pair}/wav" ]; then
        echo "ERROR: --sim_frontend mfcc_vad needs the synthesized wavs"
        echo "       (${outdir}_denorm/${pair}/wav missing; run stage 6)"
        exit 1
    fi
    if [ "${sim_frontend}" = "mfcc_vad" ]; then
        sim_extra="--frontend mfcc_vad --converted_wav_dir ${outdir}_denorm/${pair}/wav"
        sim_extra="${sim_extra} --train_wav_scp data/${train_set}/wav.scp"
        sim_extra="${sim_extra} --enroll_wav_scp data/${train_set}/wav.scp"
    fi
    sim_line=$(${PY} vae_npvc_tpu.bin.eval_similarity -c ${train_config} \
        --train_dir ${dumpdir}/${train_set} \
        --converted_scp ${outdir}/${pair}/feats.scp \
        --trials ${dumpdir}/${eval_set}/trials \
        --enroll_dir ${dumpdir}/${train_set} --steps ${sim_steps} \
        --embedder_ckpt ${shared_embedder_ckpt:-${expdir}/spk_embedder_${sim_frontend}.msgpack} \
        ${sim_extra} \
        --output_dir ${obdir}/asv/${pair} | tail -1) || sim_line=""
    echo "${sim_line}"
    plda=$(echo "${sim_line}" | grep -oE 'PLDA: [-0-9.]+' | cut -d' ' -f2) || true
    cossim=$(echo "${sim_line}" | grep -oE 'COSSIM: [-0-9.]+' | cut -d' ' -f2) || true

    # the reference's one-line summary (reference test.sh:16-24); also
    # persisted machine-readably for cross-run summaries (tools/*_summary.py)
    result_line="RESULT ${pair}  MCD: ${mcd}  CER: ${cer:-n/a}  WER: ${wer:-n/a}  PLDA: ${plda:-n/a}  COSSIM: ${cossim:-n/a}"
    echo "${result_line}"
    echo "${result_line}" > ${obdir}/RESULT.${pair}
fi

if [ "${stage}" -le 8 ] && [ "${stop_stage}" -ge 8 ]; then
    echo "stage 8: Serving-bundle export (StableHLO deployment artifact)"
    ${PY} vae_npvc_tpu.bin.export_serving -c ${train_config} \
        -m ${expdir}/model.loss.best -o ${expdir}/serving_bundle \
        --max_frames 2048 --spk2spk_id ${dumpdir}/${train_set}/spk2spk_id
    # smoke: convert one eval utterance through the artifacts and compare
    # against the stage-5 offline output (compression-level tolerance)
    ${PY} vae_npvc_tpu.bin.bundle_check \
        --bundle ${expdir}/serving_bundle \
        --decode_dir ${dumpdir}/${eval_set} \
        --offline_scp ${outdir}/${srcspk}_${trgspk}/feats.scp
fi
echo "Finished."
