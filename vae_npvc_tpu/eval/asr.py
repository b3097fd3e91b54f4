"""Intelligibility evaluation: pluggable recognizer + in-framework CTC proxy.

The reference's intelligibility stage downloads a pretrained ESPnet
LibriSpeech transformer ASR + RNNLM and decodes converted audio with beam
search (reference: egs/vcc20/vae1/local/ob_eval/evaluate.sh:72-155). Neither
the download nor ESPnet exists here, so the harness splits into:

- a *recognizer interface* — anything with ``transcribe_scp(scp) -> {utt:
  text}`` — resolved from a ``module.path:ClassName`` spec like every other
  pluggable component in the framework (reference config convention,
  bin/train.py:33-34), so a real pretrained ASR can be dropped in where one
  is available;
- ``CTCRecognizer`` — a small in-framework conv+CTC character recognizer
  trainable on the experiment's own (mel, transcript) pairs. Good enough to
  rank conversion intelligibility on the synthetic corpus and to make the
  CER/WER columns of the reference's metric line real
  (reference: egs/vcc20/vae1/test.sh:16-24).

Scoring itself lives in ``eval/wer.py`` (sclite semantics).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Mapping

import numpy as np

BLANK = 0  # CTC blank id; vocab ids start at 1


# ---------------------------------------------------------------------------
# vocab
# ---------------------------------------------------------------------------

def build_vocab(texts) -> Dict[str, int]:
    """Character vocabulary from an iterable of transcripts (space kept)."""
    chars = sorted({c for t in texts for c in t})
    return {c: i + 1 for i, c in enumerate(chars)}


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

def _ctc_model(vocab_size: int, width: int = 192, blocks: int = 3,
               arch: str = "conv", heads: int = 4):
    import jax.numpy as jnp
    from flax import linen as nn

    class CTCEncoder(nn.Module):
        """Mel (B, T, D) → log-probs (B, ceil(T/2), vocab+1)."""

        @nn.compact
        def __call__(self, x, lengths=None):
            h = nn.Conv(width, (5,), strides=(2,), name="sub")(x)
            h = nn.relu(h)
            out_len = (None if lengths is None
                       else (lengths + 1) // 2)
            for i in range(blocks):
                r = nn.Conv(width, (3,), kernel_dilation=2 ** i,
                            name=f"conv_{i}")(h)
                h = h + nn.relu(r)
            logits = nn.Dense(vocab_size + 1, name="out")(h)
            return logits, out_len

    class TransformerCTCEncoder(nn.Module):
        """Transformer-encoder CTC recognizer — the architecture family of
        the reference's downloaded eval ASR (an ESPnet LibriSpeech
        *transformer*, reference: egs/vcc20/vae1/local/ob_eval/
        evaluate.sh:72-91); the decoder side is CTC rather than attention
        (offline-trainable, and the CER/WER chain only needs 1-best text).

        ESPnet-shaped front: conv subsampling to T/2 (one stride-2 conv —
        the synthetic-corpus phones are short; ESPnet's T/4 Conv2d front
        would halve the already-few frames per phone), sinusoidal positions,
        then ``blocks`` pre-LN self-attention+FFN layers. Attention softmax
        and LayerNorms run fp32 (the framework's measured-bf16-NaN
        convention, nn/gst.py). Mel (B, T, D) → (B, ceil(T/2), vocab+1)."""

        @nn.compact
        def __call__(self, x, lengths=None):
            # pre-LN attention+FFN blocks are the shared TransformerBlock
            # (models/token_tts.py) — fp32 LN/softmax convention and the
            # fused Pallas attention gating live there, once
            from ..models.token_tts import TransformerBlock
            from ..nn.blocks import length_mask, sinusoidal_positions

            h = nn.Conv(width, (5,), strides=(2,), name="sub")(x)
            h = nn.relu(h)
            T = h.shape[1]
            out_len = (None if lengths is None
                       else (lengths + 1) // 2)
            # sinusoidal positional encoding (fp32, added once)
            h = h + sinusoidal_positions(T, width)[None]
            mask = (length_mask(out_len, T) if out_len is not None
                    else jnp.ones((h.shape[0], T, 1), h.dtype))
            for i in range(blocks):
                h = TransformerBlock(width, heads, 4 * width,
                                     name=f"blk_{i}")(h, mask)
            h = nn.LayerNorm(dtype=jnp.float32, name="ln_out")(h)
            logits = nn.Dense(vocab_size + 1, name="out")(h)
            return logits, out_len

    return (TransformerCTCEncoder() if arch == "transformer"
            else CTCEncoder())


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def _load_corpus(data_dir, max_frames):
    from ..data import kaldi_io

    data_dir = Path(data_dir)
    scp = kaldi_io.read_scp(data_dir / "feats.scp")
    texts = kaldi_io.load_dict_data(data_dir / "text")
    items = []
    for utt, rx in scp.items():
        if utt in texts:
            items.append((utt, kaldi_io.load_mat(rx)[:max_frames],
                          texts[utt]))
    if not items:
        raise ValueError(f"no (feats, text) pairs under {data_dir}")
    return items


def spec_augment(rng, feats, flens, *, n_time_masks=2, time_width=20,
                 n_freq_masks=2, freq_width=8):
    """SpecAugment (time + frequency masking) on a padded (B, T, D) batch.

    The reference's eval-ASR stack ships a specaug.yaml for its downloaded
    ESPnet model (reference: egs/vcc20/vae1/conf/specaug.yaml); this is the
    in-framework analog used when training the CTC proxy. Warping is
    omitted (static-shape-hostile, minor effect at this scale).
    """
    import jax
    import jax.numpy as jnp

    B, T, D = feats.shape
    mask = jnp.ones((B, T, D), feats.dtype)
    for i in range(n_time_masks):
        rng, k1, k2 = jax.random.split(rng, 3)
        w = jax.random.randint(k1, (B, 1), 0, time_width + 1)
        t0 = (jax.random.uniform(k2, (B, 1))
              * jnp.maximum(flens[:, None] - w, 1)).astype(jnp.int32)
        t = jnp.arange(T)[None, :]
        mask = mask * ((t < t0) | (t >= t0 + w))[:, :, None]
    for i in range(n_freq_masks):
        rng, k1, k2 = jax.random.split(rng, 3)
        w = jax.random.randint(k1, (B, 1), 0, freq_width + 1)
        f0 = jax.random.randint(k2, (B, 1), 0, max(D - freq_width, 1))
        f = jnp.arange(D)[None, :]
        mask = mask * ((f < f0) | (f >= f0 + w))[:, None, :]
    return feats * mask


def train_ctc(data_dir, *, steps: int = 3000, batch_size: int = 16,
              lr: float = 1e-3, width: int = 192, max_frames: int = 1200,
              seed: int = 0, log_every: int = 500, specaug: bool = False,
              arch: str = "conv"):
    """Train the CTC proxy on a data dir with ``feats.scp`` + ``text``.

    Returns a ready ``CTCRecognizer``. ``specaug`` applies time/frequency
    masking during training (the reference eval stack's specaug.yaml analog).
    ``arch``: 'conv' (dilated-conv encoder) or 'transformer' (the reference
    eval model's architecture family, see TransformerCTCEncoder).
    """
    import jax
    import jax.numpy as jnp
    import optax

    items = _load_corpus(data_dir, max_frames)
    vocab = build_vocab(t for _, _, t in items)
    model = _ctc_model(len(vocab), width, arch=arch)

    T_max = max(mat.shape[0] for _, mat, _ in items)
    L_max = max(len(t) for _, _, t in items)
    D = items[0][1].shape[1]
    batch_size = min(batch_size, len(items))

    tx = optax.adam(lr)

    @jax.jit
    def step(params, opt_state, feats, flens, labels, llens, aug_rng):
        if specaug:
            feats = spec_augment(aug_rng, feats, flens)

        def loss_fn(p):
            logits, out_len = model.apply({"params": p}, feats, flens)
            t = jnp.arange(logits.shape[1])[None, :]
            logit_pad = (t >= out_len[:, None]).astype(jnp.float32)
            lt = jnp.arange(labels.shape[1])[None, :]
            label_pad = (lt >= llens[:, None]).astype(jnp.float32)
            per_seq = optax.ctc_loss(logits, logit_pad, labels, label_pad,
                                     blank_id=BLANK)
            return jnp.mean(per_seq / jnp.maximum(llens, 1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    feats0 = np.zeros((batch_size, T_max, D), np.float32)
    import jax.numpy as jnp  # noqa: F811 (local alias for init below)
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(feats0),
                        jnp.ones((batch_size,), jnp.int32))["params"]
    opt_state = tx.init(params)

    def make_batch(idx):
        feats = np.zeros((batch_size, T_max, D), np.float32)
        flens = np.zeros((batch_size,), np.int32)
        labels = np.zeros((batch_size, L_max), np.int32)
        llens = np.zeros((batch_size,), np.int32)
        for b, k in enumerate(idx):
            _, mat, text = items[k]
            feats[b, :mat.shape[0]] = mat
            flens[b] = mat.shape[0]
            ids = [vocab[c] for c in text]
            labels[b, :len(ids)] = ids
            llens[b] = len(ids)
        return (jnp.asarray(feats), jnp.asarray(flens),
                jnp.asarray(labels), jnp.asarray(llens))

    loss = None
    base_rng = jax.random.PRNGKey(seed + 1)
    for i in range(steps):
        idx = rng.choice(len(items), size=batch_size,
                         replace=len(items) < batch_size)
        params, opt_state, loss = step(params, opt_state, *make_batch(idx),
                                       jax.random.fold_in(base_rng, i))
        if log_every and i % log_every == 0:
            print(f"ctc step {i}: loss {float(loss):.4f}")
    # steps=0 is legal (score with random init / caller expected a ckpt hit
    # — e.g. an --arch flag mismatching the stored arch falls through here)
    print("ctc final loss: "
          + (f"{float(loss):.4f}" if loss is not None else "n/a (0 steps)"))
    return CTCRecognizer(model, params, vocab, arch=arch)


# ---------------------------------------------------------------------------
# decoding
# ---------------------------------------------------------------------------

def ctc_prefix_beam_search(log_probs: np.ndarray, *, beam_size: int = 10,
                           blank: int = BLANK, lm=None,
                           lm_weight: float = 0.6, penalty: float = 0.0,
                           id2char: Mapping[int, str] | None = None):
    """CTC prefix beam search with optional shallow LM fusion.

    The reference's eval ASR decodes with beam search + a shallow-fused
    RNNLM (reference: egs/vcc20/vae1/conf/ob_eval/decode_asr.yaml —
    ``beam-size: 10, lm-weight: 0.6, penalty: 0.0``; evaluate.sh:150-152).
    This is the CTC-only analog (Hannun-style prefix search): prefixes carry
    separate blank/non-blank path masses so repeats merge exactly, and each
    prefix extension adds ``lm_weight * log P_lm(c | prefix) + penalty``
    (ESPnet's per-token insertion bonus). EOS is scored at finalization.

    ``log_probs``: (T, V) log-softmaxed frame posteriors. Returns the best
    prefix as a list of non-blank label ids.
    """
    neg_inf = -np.inf
    T, V = log_probs.shape
    if lm is not None and id2char is None:
        raise ValueError("id2char required for LM fusion")

    # prefix (tuple of ids) -> [log P(ending in blank), log P(non-blank)]
    beams: Dict[tuple, List[float]] = {(): [0.0, neg_inf]}
    lm_scores: Dict[tuple, float] = {(): 0.0}

    def lm_score(prefix: tuple) -> float:
        s = lm_scores.get(prefix)
        if s is None:
            parent = prefix[:-1]
            s = lm_scores[parent] + penalty
            if lm is not None:
                ctx = [id2char[i] for i in parent]
                s += lm_weight * lm.logp(ctx, id2char[prefix[-1]])
            lm_scores[prefix] = s
        return s

    for t in range(T):
        frame = log_probs[t]
        nxt: Dict[tuple, List[float]] = {}

        def acc(prefix, slot, val):
            entry = nxt.setdefault(prefix, [neg_inf, neg_inf])
            entry[slot] = np.logaddexp(entry[slot], val)

        for prefix, (lp_b, lp_nb) in beams.items():
            lp_tot = np.logaddexp(lp_b, lp_nb)
            acc(prefix, 0, lp_tot + frame[blank])
            if prefix:
                acc(prefix, 1, lp_nb + frame[prefix[-1]])
            for c in range(V):
                if c == blank:
                    continue
                # a repeat char can only extend via the blank-ended path
                base = lp_b if (prefix and c == prefix[-1]) else lp_tot
                if base == neg_inf:
                    continue
                acc(prefix + (c,), 1, base + frame[c])

        # LM-score only an acoustically-plausible shortlist: scoring every
        # candidate is O(beam*V) LM calls per frame — cheap for English char
        # vocabs, pathological for large token sets (e.g. aishell3 Mandarin)
        cands = sorted(nxt.items(),
                       key=lambda kv: np.logaddexp(kv[1][0], kv[1][1]),
                       reverse=True)[:max(5 * beam_size, 30)]
        scored = sorted(
            cands,
            key=lambda kv: np.logaddexp(kv[1][0], kv[1][1]) + lm_score(kv[0]),
            reverse=True)
        beams = dict(scored[:beam_size])
        # drop cache entries for prefixes that fell out of the beam — future
        # lm_score calls only ever look up a current beam as the parent
        lm_scores = {p: lm_scores[p] for p in beams}

    def final_score(prefix, lps):
        s = np.logaddexp(lps[0], lps[1]) + lm_score(prefix)
        if lm is not None:
            s += lm_weight * lm.logp_eos([id2char[i] for i in prefix])
        return s

    best = max(beams.items(), key=lambda kv: final_score(*kv))[0]
    return list(best)


# ---------------------------------------------------------------------------
# recognizer interface
# ---------------------------------------------------------------------------

class CTCRecognizer:
    """CTC recognizer satisfying the recognizer interface.

    Decoding is greedy collapse by default; ``beam_size > 1`` switches to
    prefix beam search with optional character-n-gram shallow fusion
    (the reference's decode_asr.yaml surface — see ctc_prefix_beam_search).
    """

    def __init__(self, model, params, vocab: Mapping[str, int],
                 arch: str = "conv"):
        self.model = model
        self.params = params
        self.vocab = dict(vocab)
        self.arch = arch
        self.id2char = {i: c for c, i in self.vocab.items()}

    def transcribe_scp(self, scp, *, batch_size: int = 16,
                       bucket: int = 256, max_frames: int = 3000,
                       beam_size: int = 1, lm=None, lm_weight: float = 0.6,
                       penalty: float = 0.0) -> Dict[str, str]:
        import jax
        import jax.numpy as jnp

        from ..data import kaldi_io

        apply_jit = jax.jit(
            lambda x, l: self.model.apply({"params": self.params}, x, l))

        items = [(u, kaldi_io.load_mat(rx)[:max_frames])
                 for u, rx in kaldi_io.read_scp(scp).items()]
        buckets: dict = {}
        for u, mat in items:
            T_pad = -(-mat.shape[0] // bucket) * bucket
            buckets.setdefault(T_pad, []).append((u, mat))

        out: Dict[str, str] = {}
        for T_pad in sorted(buckets):
            group = buckets[T_pad]
            for lo in range(0, len(group), batch_size):
                chunk = group[lo:lo + batch_size]
                D = chunk[0][1].shape[1]
                x = np.zeros((batch_size, T_pad, D), np.float32)
                lens = np.ones((batch_size,), np.int32)
                for b, (u, mat) in enumerate(chunk):
                    x[b, :mat.shape[0]] = mat
                    lens[b] = mat.shape[0]
                logits, out_len = apply_jit(jnp.asarray(x), jnp.asarray(lens))
                out_len = np.asarray(out_len)
                if beam_size > 1:
                    lp = np.asarray(jax.nn.log_softmax(logits, axis=-1),
                                    np.float64)
                    for b, (u, _) in enumerate(chunk):
                        ids = ctc_prefix_beam_search(
                            lp[b, :out_len[b]], beam_size=beam_size, lm=lm,
                            lm_weight=lm_weight, penalty=penalty,
                            id2char=self.id2char)
                        out[u] = "".join(self.id2char.get(i, "")
                                         for i in ids)
                else:
                    ids = np.asarray(jnp.argmax(logits, axis=-1))
                    for b, (u, _) in enumerate(chunk):
                        out[u] = self._collapse(ids[b, :out_len[b]])
        return out

    def _collapse(self, frame_ids) -> str:
        chars: List[str] = []
        prev = BLANK
        for i in frame_ids:
            if i != BLANK and i != prev:
                chars.append(self.id2char.get(int(i), ""))
            prev = i
        return "".join(chars)

    # -------------------------------------------------------- serialization
    def save(self, path):
        from flax import serialization

        path = Path(path)
        payload = {"params": serialization.to_state_dict(self.params),
                   "vocab": json.dumps(self.vocab), "arch": self.arch}
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(payload))

    @classmethod
    def load(cls, path, width: int | None = None):
        """Restore a recognizer; the model width and encoder arch are read
        from the stored payload/conv shapes, so callers need not remember
        the training --width/--arch (``width`` remains as an override;
        pre-arch checkpoints restore as 'conv' by structure sniffing)."""
        import jax
        import jax.numpy as jnp
        from flax import serialization

        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        vocab = json.loads(payload["vocab"])
        arch = payload.get("arch")
        if arch is None:
            # transformer blocks are blk_i (shared TransformerBlock since
            # ae6b8bd; mha_i in checkpoints saved before the rename)
            arch = ("transformer" if any(
                k.startswith(("blk_", "mha_")) for k in payload["params"])
                else "conv")
        if isinstance(arch, bytes):
            arch = arch.decode()
        if width is None:
            width = int(np.asarray(
                payload["params"]["sub"]["kernel"]).shape[-1])
        blocks = len([k for k in payload["params"]
                      if k.startswith(("conv_", "blk_"))])
        if any(k.startswith("mha_") for k in payload["params"]):
            raise ValueError(
                f"{path} is a pre-ae6b8bd transformer recognizer checkpoint "
                "(mha_i param layout); retrain it — eval recognizers are "
                "per-run artifacts, not long-lived models")
        model = _ctc_model(len(vocab), width, blocks=blocks or 3, arch=arch)
        # template params for the restore tree structure
        tpl = model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 8, 1), jnp.float32),
                         jnp.ones((1,), jnp.int32))["params"]
        # feature dim mismatch is fine for tree structure except the first
        # conv kernel; from_state_dict replaces leaves wholesale
        from ..utils.device import device_commit
        params = device_commit(
            serialization.from_state_dict(tpl, payload["params"]))
        return cls(model, params, vocab, arch=arch)


def get_recognizer(spec: str, **kwargs):
    """Resolve ``module.path:ClassName`` → instantiated recognizer."""
    import importlib

    mod_name, _, cls_name = spec.partition(":")
    cls = getattr(importlib.import_module(mod_name), cls_name)
    return cls(**kwargs)
