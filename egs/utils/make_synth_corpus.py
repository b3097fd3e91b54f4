#!/usr/bin/env python3
"""Synthetic formant corpus generator (VCTK + VCC2020 layouts, transcribed).

The reference recipes assume the real VCTK and VCC2020 downloads; neither
corpus (nor any network) exists in this environment, so this tool generates a
deterministic synthetic speech-like corpus in the exact directory layouts the
recipe list generators expect (reference:
egs/vcc20/vae1/local/generate_vctk_list.py, generate_vcc2020_traindev_list.py,
generate_vcc2020_eval_list.py), **with transcripts**, so the full pipeline —
train → convert → Griffin-Lim → MCD/CER/WER/PLDA/COSSIM — runs end to end
offline (the reference's ASR refs come from the corpus transcription file,
evaluate.sh's Eng_transcriptions.txt).

Speech model: an utterance is a sequence of "phones" from a small alphabet;
each phone is a fixed-length two-formant harmonic tone, with per-speaker
pitch (f0) and formant-scale timbre. Content = the letter sequence (the
transcript); speaker identity = pitch + formant shift. A CTC recognizer can
learn the content; a VC model can re-render it with another speaker's timbre.

Layout written under --out:
    vctk/<pNNN>/<pNNN>_<num>.wav         num 1..n_vctk_utts
    vcc2020/<SPK>/E100<NN>.wav           NN 01..70 (train 1-50, dev 51-70)
    vcc2020_eval/<SEXn>/E200<NN>.wav     source speakers, eval utterances
    text                                 master transcript: "<utt> <chars>"
"""

import argparse
import wave
from pathlib import Path

import numpy as np

ALPHABET = "abcdefgh"
# per-phone formant pairs (Hz) — spread over the mel range, distinct patterns
FORMANTS = {
    "a": (700, 1200), "b": (450, 1800), "c": (300, 2400), "d": (600, 2800),
    "e": (900, 1600), "f": (350, 1000), "g": (800, 2100), "h": (500, 3200),
}
VCC_SPEAKERS = ["SEF1", "SEF2", "SEM1", "SEM2", "TEF1", "TEF2", "TEM1",
                "TEM2"]
SOURCE_SPEAKERS = ["SEF1", "SEF2", "SEM1", "SEM2"]


def speaker_profile(rng):
    return {"f0": float(rng.uniform(90, 280)),
            "scale": float(rng.uniform(0.85, 1.2)),
            "tilt": float(rng.uniform(0.5, 1.0))}


def synth_utt(text, prof, fs, phone_sec=0.12, rng=None):
    n = int(phone_sec * fs)
    t = np.arange(n) / fs
    env = np.hanning(n) * 0.6 + 0.4
    sig = []
    for ch in text:
        f1, f2 = FORMANTS[ch]
        f1, f2 = f1 * prof["scale"], f2 * prof["scale"]
        x = (0.45 * np.sin(2 * np.pi * f1 * t)
             + 0.45 * prof["tilt"] * np.sin(2 * np.pi * f2 * t)
             + 0.25 * np.sin(2 * np.pi * prof["f0"] * t))
        sig.append(x * env)
    out = np.concatenate(sig)
    if rng is not None:
        out = out + 0.003 * rng.standard_normal(out.shape)
    return np.clip(out * 0.5, -0.99, 0.99)


def write_wav(path, x, fs):
    path.parent.mkdir(parents=True, exist_ok=True)
    pcm = (x * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(fs)
        w.writeframes(pcm.tobytes())


def random_text(rng, lo=4, hi=9):
    n = int(rng.integers(lo, hi))
    return "".join(rng.choice(list(ALPHABET), size=n))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--fs", type=int, default=24000)
    p.add_argument("--n_vctk_spk", type=int, default=6)
    p.add_argument("--n_vctk_utts", type=int, default=60)
    p.add_argument("--n_eval_utts", type=int, default=10)
    p.add_argument("--n_aishell_spk", type=int, default=0,
                   help="also emit an AISHELL-3-layout corpus "
                        "(aishell3/train/wav/SSBnnnn/...) with this many "
                        "speakers — for the combined-corpus pretrain recipe")
    p.add_argument("--n_aishell_utts", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    out = Path(args.out)
    texts = {}

    def gen(spk_root, spk, utt, prof):
        text = random_text(rng)
        write_wav(spk_root / f"{utt}.wav",
                  synth_utt(text, prof, args.fs, rng=rng), args.fs)
        return text

    # VCTK-style speakers
    for s in range(args.n_vctk_spk):
        spk = f"p{225 + s}"
        prof = speaker_profile(rng)
        for u in range(1, args.n_vctk_utts + 1):
            utt = f"{spk}_{u:03d}"
            texts[utt] = gen(out / "vctk" / spk, spk, utt, prof)

    # VCC2020 task speakers: train 1-50, dev 51-70 (reference numbering:
    # int(stem[-2:]), generate_vcc2020_traindev_list.py)
    profiles = {}
    for spk in VCC_SPEAKERS:
        profiles[spk] = speaker_profile(rng)
        for u in range(1, 71):
            stem = f"E100{u:02d}"
            utt = f"{spk}_{stem}"  # utt id = SPK_stem per the list generator
            text = random_text(rng)
            write_wav(out / "vcc2020" / spk / f"{stem}.wav",
                      synth_utt(text, profiles[spk], args.fs, rng=rng),
                      args.fs)
            texts[utt] = text

    # evaluation utterances (separate root, like the reference's separate
    # eval download). PARALLEL across all task speakers — every speaker
    # records the same eval sentences, so target-speaker ground truth exists
    # for MCD (the VCC2020 convention the reference's mcd stage relies on,
    # evaluate.sh:60-69). The eval *list* only indexes the source speakers;
    # the target-speaker recordings are ground truth for scoring.
    eval_texts = [random_text(rng) for _ in range(args.n_eval_utts)]
    for spk in VCC_SPEAKERS:
        for u in range(1, args.n_eval_utts + 1):
            stem = f"E200{u:02d}"
            utt = f"{spk}_{stem}"
            text = eval_texts[u - 1]
            write_wav(out / "vcc2020_eval" / spk / f"{stem}.wav",
                      synth_utt(text, profiles[spk], args.fs, rng=rng),
                      args.fs)
            texts[utt] = text

    # AISHELL-3-layout corpus (train/wav/<SPK>/<SPK>Wxxxx.wav, the
    # convention local/data_prep.py walks) — same synthetic speech model,
    # distinct speaker names, shares the master transcript file
    for s in range(args.n_aishell_spk):
        spk = f"SSB{s:04d}"
        prof = speaker_profile(rng)
        for u in range(1, args.n_aishell_utts + 1):
            utt = f"{spk}W{u:04d}"
            texts[utt] = gen(out / "aishell3" / "train" / "wav" / spk,
                             spk, utt, prof)

    with open(out / "text", "w") as f:
        for utt in sorted(t for t in texts if texts[t]):
            f.write(f"{utt} {texts[utt]}\n")
    print(f"synthetic corpus at {out}: {len(texts)} utterances, "
          f"{args.n_vctk_spk} VCTK + {len(VCC_SPEAKERS)} VCC speakers")


if __name__ == "__main__":
    main()
