"""Speaker-similarity CLI: train embedder → embed → cosine report.

Self-contained replacement for the reference's external x-vector/PLDA stage
(reference: egs/vcc20/vae1/local/ob_eval/evaluate_similarity.sh).

Usage:
    python -m vae_npvc_tpu.bin.eval_similarity -c conf/train.yaml \
        --train_dir dump/train --converted_scp decode_out/feats.scp \
        --trials dump/eval/trials --enroll_dir dump/train
"""

from __future__ import annotations

import argparse

import yaml


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("--train_dir", type=str, required=True,
                        help="dump dir to train the speaker embedder on")
    parser.add_argument("--converted_scp", type=str, required=True)
    parser.add_argument("--trials", type=str, required=True,
                        help="trials file: utt TARGET_SPK(or id) lines")
    parser.add_argument("--enroll_dir", type=str, required=True,
                        help="data dir with feats.scp + utt2spk(_id) of real "
                             "target-speaker utterances")
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from pathlib import Path

    from ..data import kaldi_io
    from ..eval.similarity import (cosine_similarity_report, embed_scp,
                                   train_embedder)

    config = yaml.safe_load(open(args.config))
    model, params = train_embedder(args.train_dir, config, steps=args.steps)

    conv_embs = embed_scp(model, params, args.converted_scp)
    enroll_dir = Path(args.enroll_dir)
    enroll_embs = embed_scp(model, params, enroll_dir / "feats.scp")
    # enrollment speakers by NAME when available, else by id; trial targets
    # may be either — normalize through spk2spk_id if present
    if (enroll_dir / "utt2spk").exists():
        enroll_utt2spk = kaldi_io.load_dict_data(enroll_dir / "utt2spk")
    else:
        enroll_utt2spk = kaldi_io.load_dict_data(enroll_dir / "utt2spk_id")
    utt2target = {p[0]: p[1] for p in kaldi_io.load_list_data(args.trials)}
    enroll_spks = set(enroll_utt2spk.values())
    missing = [t for t in set(utt2target.values()) if t not in enroll_spks]
    if missing and (enroll_dir / "spk2spk_id").exists():
        name2id = kaldi_io.load_dict_data(enroll_dir / "spk2spk_id")
        id2name = {str(int(v)): k for k, v in name2id.items()}
        remap = {**{k: k for k in enroll_spks}, **name2id, **id2name}
        utt2target = {u: remap.get(t, t) for u, t in utt2target.items()}

    mean, per_utt = cosine_similarity_report(conv_embs, enroll_embs,
                                             utt2target, enroll_utt2spk)
    print(f"COSSIM: {mean:.4f} over {len(per_utt)} utterances")


if __name__ == "__main__":
    main()
