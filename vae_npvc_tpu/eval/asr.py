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

def _ctc_model(vocab_size: int, width: int = 192, blocks: int = 3):
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

    return CTCEncoder()


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
              seed: int = 0, log_every: int = 500, specaug: bool = False):
    """Train the CTC proxy on a data dir with ``feats.scp`` + ``text``.

    Returns a ready ``CTCRecognizer``. ``specaug`` applies time/frequency
    masking during training (the reference eval stack's specaug.yaml analog).
    """
    import jax
    import jax.numpy as jnp
    import optax

    items = _load_corpus(data_dir, max_frames)
    vocab = build_vocab(t for _, _, t in items)
    model = _ctc_model(len(vocab), width)

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
    print(f"ctc final loss: {float(loss):.4f}")
    return CTCRecognizer(model, params, vocab)


# ---------------------------------------------------------------------------
# recognizer interface
# ---------------------------------------------------------------------------

class CTCRecognizer:
    """Greedy-decode CTC recognizer satisfying the recognizer interface."""

    def __init__(self, model, params, vocab: Mapping[str, int]):
        self.model = model
        self.params = params
        self.vocab = dict(vocab)
        self.id2char = {i: c for c, i in self.vocab.items()}

    def transcribe_scp(self, scp, *, batch_size: int = 16,
                       bucket: int = 256, max_frames: int = 3000
                       ) -> Dict[str, str]:
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
                ids = np.asarray(jnp.argmax(logits, axis=-1))
                out_len = np.asarray(out_len)
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
                   "vocab": json.dumps(self.vocab),
                   "width": self.model.__dict__.get("width", 0)}
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(payload))

    @classmethod
    def load(cls, path, width: int = 192):
        import jax
        import jax.numpy as jnp
        from flax import serialization

        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        vocab = json.loads(payload["vocab"])
        model = _ctc_model(len(vocab), width)
        # template params for the restore tree structure
        tpl = model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 8, 1), jnp.float32),
                         jnp.ones((1,), jnp.int32))["params"]
        # feature dim mismatch is fine for tree structure except the first
        # conv kernel; from_state_dict replaces leaves wholesale
        params = serialization.from_state_dict(tpl, payload["params"])
        return cls(model, params, vocab)


def get_recognizer(spec: str, **kwargs):
    """Resolve ``module.path:ClassName`` → instantiated recognizer."""
    import importlib

    mod_name, _, cls_name = spec.partition(":")
    cls = getattr(importlib.import_module(mod_name), cls_name)
    return cls(**kwargs)
