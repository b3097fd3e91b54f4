#!/usr/bin/env python3
"""VCC2020 train corpus → Kaldi train/dev lists.

Reference behavior (egs/vcc20/vae1/local/generate_vcc2020_traindev_list.py):
the 8 task speakers SEF1/SEF2/SEM1/SEM2/TEF1/TEF2/TEM1/TEM2; utterances 51-70
form the dev split, the rest train.
"""

import argparse
from pathlib import Path

import sys

sys.path.insert(0, str(Path(__file__).parent))
from generate_vctk_list import write_lists  # noqa: E402

SPEAKERS = ["SEF1", "SEF2", "SEM1", "SEM2", "TEF1", "TEF2", "TEM1", "TEM2"]


def main(data_root, list_dir, fs, dev_lo=51, dev_hi=70):
    data_root = Path(data_root)
    train_rows, dev_rows = [], []
    for spk in SPEAKERS:
        spk_dir = data_root / spk
        if not spk_dir.is_dir():
            print(f"warning: missing speaker dir {spk_dir}")
            continue
        for wav in sorted(spk_dir.glob("*.wav")):
            utt = f"{spk}_{wav.stem}" if not wav.stem.startswith(spk) \
                else wav.stem
            cmd = (str(wav.absolute()) if fs is None else
                   f"sox {wav.absolute()} -c 1 -r {fs} -b 16 -t wav - |")
            # reference semantics: the utterance number is the LAST TWO
            # digits of the stem (E10051 -> 51), reference
            # generate_vcc2020_traindev_list.py:45 `int(data_file.stem[-2:])`
            digits = "".join(c for c in wav.stem if c.isdigit())
            num = int(digits[-2:]) if digits else 0
            (dev_rows if dev_lo <= num <= dev_hi
             else train_rows).append((utt, spk, cmd))
    write_lists(list_dir, "vcc2020_train", train_rows)
    write_lists(list_dir, "vcc2020_dev", dev_rows)
    print(f"vcc2020_train: {len(train_rows)}, vcc2020_dev: {len(dev_rows)}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--data_root", type=str, required=True)
    p.add_argument("-l", "--list_dir", type=str, default="data")
    p.add_argument("-f", "--fs", type=int, default=24000)
    p.add_argument("--no-pipe", action="store_true",
                   help="emit plain wav paths (in-framework resampling) "
                        "instead of sox pipes")
    a = p.parse_args()
    main(a.data_root, a.list_dir, None if a.no_pipe else a.fs)
