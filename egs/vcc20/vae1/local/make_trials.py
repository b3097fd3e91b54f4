#!/usr/bin/env python3
"""Build a conversion ``trials`` file: lines ``utt SPK [SPK...]``.

Format-string driven like the reference tool
(egs/vcc20/vae1/local/make_trials.py): ``--format S-T`` emits
``utt <source> <target>`` per source-speaker utterance.
"""

import argparse
from pathlib import Path


def main(data_dir, source, target, fmt):
    data_dir = Path(data_dir)
    utt2spk = [line.split() for line in
               open(data_dir / "utt2spk").read().splitlines() if line]
    kinds = fmt.split("-")
    n = 0
    with open(data_dir / "trials", "w") as wf:
        for utt, spk in utt2spk:
            if source and spk != source:
                continue
            cols = [utt]
            for kind in kinds:
                if kind.upper() in ("S", "SOURCE"):
                    cols.append(spk)
                elif kind.upper() in ("T", "TARGET"):
                    cols.append(target)
            wf.write(" ".join(cols) + "\n")
            n += 1
    print(f"wrote {n} trials to {data_dir / 'trials'}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("data_dir", type=str)
    p.add_argument("-s", "--source", type=str, default="")
    p.add_argument("-t", "--target", type=str, required=True)
    p.add_argument("-f", "--format", type=str, default="T",
                   help='columns after utt: "S"=source, "T"=target, e.g. S-T')
    a = p.parse_args()
    main(a.data_dir, a.source, a.target, a.format)
