#!/usr/bin/env python3
"""Random-sampled conversion trials (reference behavior:
egs/vcc20/vae2/local/make_trials.py — random source/target sampling with
``--num_of_trials``; ``--parallel`` pairs same-utterance source/target)."""

import argparse
import random
from collections import defaultdict
from pathlib import Path


def main(data_dir, num_of_trials, parallel, seed):
    data_dir = Path(data_dir)
    random.seed(seed)
    utt2spk = [line.split() for line in
               open(data_dir / "utt2spk").read().splitlines() if line]
    spk2utts = defaultdict(list)
    for utt, spk in utt2spk:
        spk2utts[spk].append(utt)
    speakers = sorted(spk2utts)
    n = 0
    with open(data_dir / "trials", "w") as wf:
        for _ in range(num_of_trials):
            src, tgt = random.sample(speakers, 2)
            utt = random.choice(spk2utts[src])
            if parallel:
                wf.write(f"{utt} {src} {tgt}\n")
            else:
                wf.write(f"{utt} {tgt}\n")
            n += 1
    print(f"wrote {n} random trials to {data_dir / 'trials'}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("data_dir", type=str)
    p.add_argument("-n", "--num_of_trials", type=int, default=100)
    p.add_argument("--parallel", action="store_true")
    p.add_argument("--seed", type=int, default=777)
    a = p.parse_args()
    main(a.data_dir, a.num_of_trials, a.parallel, a.seed)
