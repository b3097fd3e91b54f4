"""BNF / VQ-token extraction: mel features → code-id transcripts.

Re-design of the reference extractor (reference: vae_npvc/bin/extract_bnf.py
:25-74): stream an rspecifier, run the model's encoder+quantizer, emit one of

- ``id``:    the full per-frame code-id sequence
- ``csid``:  consecutive duplicates collapsed (the VQ-token "transcripts" the
             AISHELL-3 TTS recipe trains on, run_vae.sh:158-171)
- ``token``: the id matrix (for ark output)

as ``<i><j>...`` text lines or a Kaldi ark. The reference's ark branch is
broken (undefined variable, extract_bnf.py:44); it works here.

TPU-first: utterances are bucketed/padded and encoded in batches under one
compiled fn per bucket (length masks make padding exact; flat-model path).
Hierarchical models fall back to per-utterance encode (ids of the FINEST level
are emitted, matching the flat model's role as BNF extractor).
"""

from __future__ import annotations

import numpy as np

from ..data import kaldi_io
from ..models import build_model


def collapse_consecutive(ids):
    """Run-length collapse (torch.unique_consecutive equivalent)."""
    ids = np.asarray(ids).reshape(-1)
    if ids.size == 0:
        return ids
    keep = np.ones(ids.shape, bool)
    keep[1:] = ids[1:] != ids[:-1]
    return ids[keep]


def collapse_with_durations(ids):
    """Run-length collapse returning (tokens, run_lengths) — the duration
    targets for the token-to-mel synthesizer (models/token_tts.py)."""
    ids = np.asarray(ids).reshape(-1)
    if ids.size == 0:
        return ids, ids
    keep = np.ones(ids.shape, bool)
    keep[1:] = ids[1:] != ids[:-1]
    starts = np.flatnonzero(keep)
    lengths = np.diff(np.append(starts, ids.size))
    return ids[starts], lengths.astype(np.int64)


class BnfExtractor:
    def __init__(self, config):
        import jax

        self.config = config
        self.model = build_model(config)
        self.bucket_size = config.get("decode_bucket_size", 256)
        self.batch_size = config.get("decode_batch_size", 8)
        from ..models.vqvae import Encoder as _Enc
        from .convert import encoder_archs
        self.min_frames = _Enc.min_input_frames(encoder_archs(config))
        self.variables = None
        self._encode_jit = jax.jit(
            lambda v, x, lengths: self.model.apply(v, x, lengths,
                                                   method="encode"))
        self._is_flat = type(self.model).__module__.endswith(".vqvae")

    def load_checkpoint(self, path):
        import jax
        import jax.numpy as jnp
        from flax import serialization

        enc = self.config.get("encoder",
                              self.config.get("encoder.0", {}))
        D = enc.get("in_channels", [80])[0]
        variables = self.model.init(
            {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
            jnp.zeros((1, max(32, self.min_frames), D), jnp.float32),
            jnp.zeros((1,), jnp.int32), train=True)
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        variables = dict(variables)
        template = variables.pop("params")
        from ..utils.migrate import maybe_migrate_model
        model_tree, _ = maybe_migrate_model(
            payload, serialization.to_state_dict(template))
        params = serialization.from_state_dict(template, model_tree)
        ema = serialization.from_state_dict(variables, payload.get("ema", {}))
        from ..utils.device import device_commit
        self.variables = device_commit({"params": params, **ema})
        return payload.get("iteration", 0)

    def _encode_batch(self, feats, lengths, n_valid=None):
        """(B, T, D), (B,) → list of per-utterance id arrays (true length).

        ``n_valid``: real rows in the batch (the hierarchical branch runs
        per-utterance eager encodes — no reason to encode fixed-batch pad
        rows whose results are discarded; the flat branch keeps the full
        padded batch for one compiled shape per bucket)."""
        import jax.numpy as jnp

        from ..models.vqvae import Encoder

        if self._is_flat:
            ids = np.asarray(self._encode_jit(
                self.variables, jnp.asarray(feats),
                jnp.asarray(lengths, jnp.int32)))
            out_lens = Encoder.out_lengths(
                self.config.get("encoder", {}),
                np.asarray(lengths, np.int64))
            return [ids[b, :out_lens[b]] for b in range(ids.shape[0])]
        # hierarchical: per-utterance, finest VQ level. Inputs shorter than
        # the hierarchy's total downsampling keep their padding (with the
        # real length threaded) so no level's time axis is empty.
        outs = []
        for b in range(feats.shape[0] if n_valid is None else n_valid):
            T = max(int(lengths[b]), self.min_frames)
            enc = self.model.apply(
                self.variables, jnp.asarray(feats[b:b + 1, :T]),
                jnp.asarray(lengths[b:b + 1], jnp.int32), method="encode")
            ids = enc[0] if isinstance(enc, tuple) else enc
            if isinstance(ids, (list, tuple)):
                ids = ids[-1]
            # finest level = the first encoder's time transform of the real
            # length ("encoder" covers the flat-key VAE family on this path)
            fin_len = int(np.asarray(Encoder.out_lengths(
                self.config.get("encoder.0", self.config.get("encoder", {})),
                np.asarray(lengths[b:b + 1], np.int64)))[0])
            outs.append(np.asarray(ids)[0, :fin_len])
        return outs

    def extract(self, rspecifier, wspecifier, bnf_kind="csid",
                output_txt=True, durations_path=None):
        items = list(kaldi_io.read_ark(rspecifier))
        output_txt = output_txt and bnf_kind in ("id", "csid")

        # bucket + batch
        buckets: dict[int, list] = {}
        for utt, feat in items:
            T = feat.shape[0]
            T_pad = max(-(-T // self.bucket_size) * self.bucket_size,
                        self.min_frames)
            buckets.setdefault(T_pad, []).append((utt, feat))

        results = {}
        for T_pad in sorted(buckets):
            group = buckets[T_pad]
            for lo in range(0, len(group), self.batch_size):
                chunk = group[lo:lo + self.batch_size]
                D = chunk[0][1].shape[1]
                feats = np.zeros((self.batch_size, T_pad, D), np.float32)
                lengths = np.ones((self.batch_size,), np.int32)
                for b, (utt, feat) in enumerate(chunk):
                    feats[b, :feat.shape[0]] = feat
                    lengths[b] = feat.shape[0]
                id_list = self._encode_batch(feats, lengths,
                                             n_valid=len(chunk))
                for (utt, _), ids in zip(chunk, id_list):
                    results[utt] = ids

        n = 0
        if durations_path is not None:
            with open(durations_path, "w") as df:
                for utt, _ in items:
                    _, runs = collapse_with_durations(results[utt])
                    df.write(f"{utt} " + " ".join(map(str, runs)) + "\n")
        if output_txt:
            with open(wspecifier, "w") as wf:
                for utt, _ in items:
                    ids = results[utt]
                    if bnf_kind == "csid":
                        ids = collapse_consecutive(ids)
                    wf.write(f"{utt} "
                             + "".join(f"<{i}>" for i in ids.reshape(-1))
                             + "\n")
                    n += 1
        else:
            with kaldi_io.write_helper(wspecifier,
                                       compression_method=1) as wf:
                for utt, _ in items:
                    ids = results[utt]
                    if bnf_kind == "csid":
                        ids = collapse_consecutive(ids)
                    wf.write(utt, ids.reshape(-1, 1).astype(np.float32))
                    n += 1
        return n
