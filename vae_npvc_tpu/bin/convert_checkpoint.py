"""Convert a reference PyTorch checkpoint to this framework's format.

Usage:
    python -m vae_npvc_tpu.bin.convert_checkpoint -c conf/train.yaml \
        reference_ckpt/model.loss.best converted/model.loss.best
"""

from __future__ import annotations

import argparse

import yaml


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("torch_ckpt", type=str)
    parser.add_argument("out_path", type=str)
    parser.add_argument("-c", "--config", type=str, required=True,
                        help="the experiment YAML (same keys both frameworks)")
    args = parser.parse_args()

    from ..utils.torch_convert import convert_checkpoint_file

    config = yaml.safe_load(open(args.config))
    it = convert_checkpoint_file(args.torch_ckpt, config, args.out_path)
    print(f"Converted {args.torch_ckpt} (iteration {it}) -> {args.out_path}")


if __name__ == "__main__":
    main()
