#!/usr/bin/env python3
"""AISHELL-3 corpus → one Kaldi data dir (wav.scp with sox-resample pipes).

Layout expected: <root>/train/wav/<SPK>/<SPK>Wxxxx.wav (AISHELL-3 convention;
reference: egs/aishell3/vc2/local/data_prep.sh).
"""

import argparse
from collections import defaultdict
from pathlib import Path


def main(data_root, list_dir, fs, no_pipe=False):
    data_root = Path(data_root)
    out = Path(list_dir)
    out.mkdir(parents=True, exist_ok=True)
    wav_root = data_root / "train" / "wav"
    if not wav_root.is_dir():
        wav_root = data_root  # allow pointing straight at the wav tree
    spk2utt = defaultdict(list)
    n = 0
    with open(out / "wav.scp", "w") as ws, open(out / "utt2spk", "w") as us:
        for spk_dir in sorted(wav_root.glob("*")):
            if not spk_dir.is_dir():
                continue
            spk = spk_dir.name
            for wav in sorted(spk_dir.glob("*.wav")):
                utt = wav.stem
                cmd = (str(wav.absolute()) if no_pipe else
                       f"sox {wav.absolute()} -c 1 -r {fs} -b 16 -t wav - |")
                ws.write(f"{utt} {cmd}\n")
                us.write(f"{utt} {spk}\n")
                spk2utt[spk].append(utt)
                n += 1
    with open(out / "spk2utt", "w") as f:
        for spk, utts in spk2utt.items():
            f.write(f"{spk} {' '.join(utts)}\n")
    print(f"{n} utterances from {len(spk2utt)} speakers -> {out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--data_root", type=str, required=True)
    p.add_argument("-l", "--list_dir", type=str, default="data/all")
    p.add_argument("-f", "--fs", type=int, default=44100)
    p.add_argument("--no-pipe", action="store_true",
                   help="plain wav paths (in-framework resampling)")
    a = p.parse_args()
    main(a.data_root, a.list_dir, a.fs, no_pipe=a.no_pipe)
