"""Conversion CLI (reference: vae_npvc/bin/decode.py:23-101 — same flags).

Usage:
    python -m vae_npvc_tpu.bin.decode -c conf/train.yaml \
        --checkpoint exp/vqvae/model.loss.best \
        --decode-dir dump/eval --output-dir exp/vqvae/decode
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import yaml


def decode(args):
    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    logger = logging.getLogger("vae_npvc_tpu.convert")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(message)s", datefmt="%m-%d %H:%M:%S")
    for h in (logging.StreamHandler(),
              logging.FileHandler(str(output_dir / "decode.log"))):
        h.setFormatter(fmt)
        logger.addHandler(h)

    config = yaml.safe_load(open(args.config))

    from ..infer.convert import Converter

    # reference-compatible decoder driver dispatch (decode.py:34); the basic
    # any-to-many driver is the only one shipped (as in the reference)
    decoder_type = config.get("decoder_type", "vae_npvc.decoder.basic")
    if decoder_type.split(":")[0] not in (
            "vae_npvc.decoder.basic", "basic", "converter"):
        raise KeyError(f"unknown decoder_type {decoder_type!r}")
    converter = Converter(config)
    assert args.checkpoint is not None
    it = converter.load_checkpoint(args.checkpoint)
    logger.info(f"Decoding dataset: {args.decode_dir}")
    logger.info(f"Decoding model: {args.checkpoint} (iteration {it})")
    logger.info("Start decoding...")
    if getattr(args, "all_targets", None):
        targets = args.all_targets.split(",")
        n = converter.sweep(args.decode_dir, output_dir, targets)
        logger.info(f"Finished sweep ({n} conversions)")
    else:
        n = converter.decode(args.decode_dir, output_dir)
        logger.info(f"Finished ({n} utterances)")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True,
                        help="YAML experiment config")
    parser.add_argument("--output-dir", "--output_dir", dest="output_dir",
                        type=str, required=True)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--decode-dir", "--decode_dir", dest="decode_dir",
                        type=str, required=True)
    parser.add_argument("-g", "--gpu", type=str, default=None,
                        help="ignored (device selection is automatic)")
    parser.add_argument("--all-targets", "--all_targets", dest="all_targets",
                        type=str, default=None,
                        help="comma-separated target speakers: convert EVERY "
                             "utterance in feats.scp to every listed target "
                             "(no trials file needed)")
    decode(parser.parse_args())


if __name__ == "__main__":
    main()
