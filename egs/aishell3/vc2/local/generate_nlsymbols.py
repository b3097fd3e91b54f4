#!/usr/bin/env python3
"""Build the VQ-token symbol dictionary for the token-to-mel TTS stage.

Reference behavior (egs/aishell3/vc2/local/generate_nlsymbols.py): one
``<i>`` symbol per VQ codebook entry, written one-per-line (non-linguistic
symbol list consumed by the TTS frontend).
"""

import argparse


def main(z_num, out_path):
    with open(out_path, "w") as f:
        for i in range(z_num):
            f.write(f"<{i}>\n")
    print(f"wrote {z_num} symbols to {out_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-n", "--z_num", type=int, default=128,
                   help="codebook size (number of token symbols)")
    p.add_argument("-o", "--out", type=str, default="nlsyms.txt")
    a = p.parse_args()
    main(a.z_num, a.out)
