"""Export one of our checkpoints to the reference's PyTorch format.

Inverse of ``bin/convert_checkpoint.py``: makes migration two-way (train or
fine-tune here, then evaluate/serve/resume with the reference's torch
tooling — its ``--checkpoint`` resume path loads the produced file,
reference: vae_npvc/train.py:55-57, trainer/basic.py:109-115).

Usage:
    vae-npvc-export-checkpoint exp/.../model.loss.best -c conf/train.yaml \
        -o exp/.../model.loss.best.pt
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Export a vae_npvc_tpu checkpoint to reference torch "
                    "format")
    parser.add_argument("our_ckpt", type=str)
    parser.add_argument("-c", "--config", required=True,
                        help="experiment YAML (reference flat key set)")
    parser.add_argument("-o", "--out_path", required=True)
    args = parser.parse_args(argv)

    import yaml

    config = yaml.safe_load(open(args.config))
    from ..utils.torch_export import export_checkpoint_file

    it = export_checkpoint_file(args.our_ckpt, config, args.out_path)
    print(f"Exported {args.our_ckpt} (iteration {it}) -> {args.out_path}")


if __name__ == "__main__":
    main()
