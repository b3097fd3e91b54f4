"""Token-to-mel synthesis CLI: token transcripts + speaker → mel arks.

Completes the in-framework second-stage pipeline (reference run_tts.sh decodes
with external ESPnet tts_decode, egs/aishell3/vc2/run_tts.sh:223-256).

Usage:
    python -m vae_npvc_tpu.bin.decode_tts -c conf/train_token_tts.yaml \
        --checkpoint exp/token_tts/model.loss.best \
        --tokens data/tts/text --spk 3 --output-dir exp/token_tts/decode
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import yaml


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--tokens", type=str, required=True,
                        help="token transcript file: utt <i><j>... lines")
    parser.add_argument("--spk", type=str, default=None,
                        help="target speaker id (int), or utt2spk_id file "
                             "for per-utterance speakers")
    parser.add_argument("--spk_emb", type=str, default=None,
                        help="continuous speaker embedding(s): an scp/ark of "
                             "per-utterance (1, E) matrices, or one matrix "
                             "file used for every utterance (unseen-speaker "
                             "synthesis, the x-vector analog)")
    parser.add_argument("--trials", type=str, default=None,
                        help="voice-conversion trials file 'utt TARGET': "
                             "synthesize each utterance's tokens with the "
                             "TARGET speaker (resolved through --spk (ids) "
                             "or --spk_emb keyed by speaker, e.g. "
                             "spk_emb_mean.scp)")
    parser.add_argument("--output-dir", "--output_dir", dest="output_dir",
                        type=str, required=True)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ..data import kaldi_io
    from ..data.token_mel import parse_token_line
    from ..models import build_model

    if not args.spk and not args.spk_emb:
        raise SystemExit("pass --spk (ids) or --spk_emb (embeddings)")
    config = yaml.safe_load(open(args.config))
    model = build_model(config)
    L = config.get("max_tokens", 128)

    use_emb = bool(args.spk_emb) or config.get("use_spk_embed", False)
    emb_dim = config.get("spk_embed_dim", 64)
    y_tpl = (jnp.zeros((1, emb_dim), jnp.float32) if use_emb
             else jnp.zeros((1,), jnp.int32))
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, L), jnp.int32), jnp.zeros((1, L), jnp.int32),
        jnp.zeros((1, config.get("max_frames", 512),
                   config.get("mel_dim", 80)), jnp.float32),
        y_tpl, jnp.ones((1,), jnp.int32),
        jnp.ones((1,), jnp.int32), train=True)
    with open(args.checkpoint, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(dict(variables)["params"],
                                           payload["model"])
    v = {"params": params}
    infer = jax.jit(lambda toks, y, lens: model.apply(v, toks, y, lens,
                                                      method="infer"))

    utt2target = None
    if args.trials:
        utt2target = {ln.split()[0]: ln.split()[1]
                      for ln in open(args.trials) if ln.strip()}
    utt2spk = utt2emb = fixed_emb = None
    if args.spk_emb:
        emb_path = Path(args.spk_emb)
        if emb_path.suffix == ".scp" or "scp" in emb_path.name:
            utt2emb = kaldi_io.load_dict_data(emb_path)
        else:
            fixed_emb = kaldi_io.load_mat(str(emb_path))[0]
    else:
        spk_file = Path(args.spk)
        utt2spk = (kaldi_io.load_dict_data(spk_file) if spk_file.exists()
                   else None)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    with kaldi_io.ArkWriter(out_dir / "mel.ark", out_dir / "feats.scp") as w:
        for utt, line in kaldi_io.load_dict_data(args.tokens).items():
            if utt2target is not None and utt not in utt2target:
                continue
            toks = parse_token_line(line)[:L]
            pad = np.zeros((1, L), np.int32)
            pad[0, :len(toks)] = toks
            if utt2target is not None:
                # VC trials: the speaker source is keyed by TARGET speaker
                # (embedding table like spk_emb_mean.scp, or an int id)
                tgt = utt2target[utt]
                if utt2emb is not None:
                    y = jnp.asarray(kaldi_io.load_mat(utt2emb[tgt])[:1],
                                    jnp.float32)
                else:
                    y = jnp.asarray([int(tgt)], jnp.int32)
            elif utt2emb is not None:
                y = jnp.asarray(kaldi_io.load_mat(utt2emb[utt])[:1],
                                jnp.float32)
            elif fixed_emb is not None:
                y = jnp.asarray(fixed_emb[None, :], jnp.float32)
            else:
                spk = int(utt2spk[utt]) if utt2spk else int(args.spk)
                y = jnp.asarray([spk], jnp.int32)
            mel, lens = infer(jnp.asarray(pad), y,
                              jnp.asarray([len(toks)], jnp.int32))
            w.write(utt, np.asarray(mel)[0, :int(lens[0])])
            n += 1
    print(f"Synthesized {n} utterances -> {out_dir}")


if __name__ == "__main__":
    main()
