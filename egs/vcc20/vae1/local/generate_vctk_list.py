#!/usr/bin/env python3
"""VCTK corpus → Kaldi data lists with sox-resample wav.scp pipes.

Split by utterance number, exposed as flags because the two recipes differ
(reference behavior):
- vae1 (egs/vcc20/vae1/local/generate_vctk_list.py:56-67): test = utt 1-25,
  dev = 26-50, train = 51+  (the defaults here);
- vae2 (egs/vcc20/vae2/local/generate_vctk_list.py:56-60): no test
  (test_hi=0), dev = 1-50, train = 51+ — the vae2 recipe passes
  --test_hi 0 --dev_lo 1.
"""

import argparse
from collections import defaultdict
from pathlib import Path


def write_lists(list_dir, name, rows):
    d = Path(list_dir) / name
    d.mkdir(parents=True, exist_ok=True)
    spk2utt = defaultdict(list)
    with open(d / "wav.scp", "w") as ws, open(d / "utt2spk", "w") as us:
        for utt, spk, cmd in rows:
            ws.write(f"{utt} {cmd}\n")
            us.write(f"{utt} {spk}\n")
            spk2utt[spk].append(utt)
    with open(d / "spk2utt", "w") as f:
        for spk, utts in spk2utt.items():
            if utts:
                f.write(f"{spk} {' '.join(utts)}\n")


def main(data_root, list_dir, fs, dev_lo=26, dev_hi=50, test_hi=25):
    data_root = Path(data_root)
    splits = {"vctk_train": [], "vctk_dev": [], "vctk_test": []}
    for spk_dir in sorted(data_root.glob("*")):
        spk = spk_dir.stem
        for wav in sorted(spk_dir.glob("*.wav")):
            utt = wav.stem
            cmd = (str(wav.absolute()) if fs is None else
                   f"sox {wav.absolute()} -c 1 -r {fs} -b 16 -t wav - |")
            num = int(utt.split("_")[-1])
            if num <= test_hi:
                splits["vctk_test"].append((utt, spk, cmd))
            elif dev_lo <= num <= dev_hi:
                splits["vctk_dev"].append((utt, spk, cmd))
            else:
                splits["vctk_train"].append((utt, spk, cmd))
    for name, rows in splits.items():
        write_lists(list_dir, name, rows)
        print(f"{name}: {len(rows)} utterances")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--data_root", type=str, required=True)
    p.add_argument("-l", "--list_dir", type=str, default="data")
    p.add_argument("-f", "--fs", type=int, default=48000)
    p.add_argument("--no-pipe", action="store_true",
                   help="emit plain wav paths (in-framework resampling) "
                        "instead of sox pipes")
    p.add_argument("--test_hi", type=int, default=25,
                   help="utt numbers <= this go to vctk_test (vae2: 0)")
    p.add_argument("--dev_lo", type=int, default=26,
                   help="low bound of the vctk_dev range (vae2: 1)")
    p.add_argument("--dev_hi", type=int, default=50)
    a = p.parse_args()
    main(a.data_root, a.list_dir, None if a.no_pipe else a.fs,
         dev_lo=a.dev_lo, dev_hi=a.dev_hi, test_hi=a.test_hi)
