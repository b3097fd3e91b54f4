"""Neural character LM for shallow fusion in ASR decoding.

The reference's intelligibility eval fuses a *neural* RNNLM into beam search
(reference: egs/vcc20/vae1/local/ob_eval/evaluate.sh:84-91 downloads a
pretrained LibriSpeech RNNLM; conf/ob_eval/decode_asr.yaml ``lm-weight: 0.6``
feeds --rnnlm at evaluate.sh:150-152). That download is impossible here
(zero egress), so this module provides the architecture-faithful in-framework
analog: a character-level LSTM LM trained on the experiment's own
transcripts, exposed through the same ``logp``/``logp_eos`` interface as the
Witten-Bell n-gram stand-in (eval/lm.py) so either can back
``ctc_prefix_beam_search`` — selected by the ``lm-type`` knob in the
reference-shaped decode yaml.

Design notes (TPU-idiomatic even though LM training is a CPU-scale job):
training runs as one jitted step over padded (B, L) batches with masked
cross-entropy; incremental decode scoring uses a single-step jitted cell with
per-prefix carry caching (beam search extends prefixes one char at a time, so
each new prefix costs exactly one cell step).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

BOS = "\x02"
EOS = "\x03"


def _build_vocab(texts):
    chars = sorted({c for t in texts for c in t})
    # id 0 = BOS (never predicted), id 1 = EOS
    itos = [BOS, EOS] + chars
    stoi = {c: i for i, c in enumerate(itos)}
    return itos, stoi


class CharLstmLM:
    """Flax LSTM char LM wrapped with train/score/save/load conveniences."""

    def __init__(self, vocab: Sequence[str], embed=64, hidden=256, layers=2):
        import flax.linen as nn
        import jax
        import jax.numpy as jnp

        self.itos = list(vocab)
        self.stoi = {c: i for i, c in enumerate(self.itos)}
        self.embed, self.hidden, self.layers = embed, hidden, layers
        V = len(self.itos)

        class Net(nn.Module):
            """(B, L) tokens -> ((B, L, V) logits, final carries).

            The same compact body serves full-sequence training
            (``carries=None``) and incremental one-token decode steps
            (``carries`` from the previous call) — nn.RNN threads the
            explicit initial carry either way, so params are shared."""
            @nn.compact
            def __call__(self, tokens, carries=None):
                h = nn.Embed(V, embed, name="embed")(tokens)
                new_carries = []
                for i in range(layers):
                    rnn = nn.RNN(nn.OptimizedLSTMCell(hidden),
                                 name=f"lstm_{i}")
                    if carries is None:
                        c, h = rnn(h, return_carry=True)
                    else:
                        c, h = rnn(h, initial_carry=carries[i],
                                   return_carry=True)
                    new_carries.append(c)
                return nn.Dense(V, name="out")(h), new_carries

        self.net = Net()
        self.params = None
        self._jax, self._jnp = jax, jnp
        self._step_fn = None
        self._first_fn = None
        self._cache: dict = {}

    # ----------------------------------------------------------------- train
    def train(self, texts: Iterable[str], *, steps=600, batch=32, lr=2e-3,
              max_len=128, seed=0, log_every=0):
        import jax
        import jax.numpy as jnp
        import optax

        texts = [t[: max_len - 1] for t in texts if t]
        if not texts:
            raise ValueError("no training texts")
        L = max(len(t) + 1 for t in texts)  # +1 for EOS
        ids = np.zeros((len(texts), L + 1), np.int32)  # col 0 = BOS
        mask = np.zeros((len(texts), L), np.float32)
        for i, t in enumerate(texts):
            seq = [self.stoi[c] for c in t] + [self.stoi[EOS]]
            ids[i, 1:1 + len(seq)] = seq
            mask[i, :len(seq)] = 1.0

        tx = optax.adam(lr)
        variables = self.net.init(jax.random.PRNGKey(seed),
                                  jnp.zeros((1, 4), jnp.int32))
        params = variables["params"]
        opt_state = tx.init(params)

        @jax.jit
        def train_step(params, opt_state, inp, tgt, m):
            def loss_fn(p):
                logits, _ = self.net.apply({"params": p}, inp)
                lp = jax.nn.log_softmax(logits)
                nll = -jnp.take_along_axis(lp, tgt[..., None],
                                           axis=-1)[..., 0]
                return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        rng = np.random.default_rng(seed)
        n = len(texts)
        for s in range(steps):
            idx = rng.integers(0, n, size=min(batch, n))
            inp = jnp.asarray(ids[idx, :-1])
            tgt = jnp.asarray(ids[idx, 1:])
            m = jnp.asarray(mask[idx])
            params, opt_state, loss = train_step(params, opt_state, inp,
                                                 tgt, m)
            if log_every and (s + 1) % log_every == 0:
                print(f"lm step {s + 1}: nll/char {float(loss):.4f}")
        self.params = jax.device_get(params)
        self._cache.clear()
        self._step_fn = None
        return self

    # ----------------------------------------------------------------- score
    def _ensure_step(self):
        if self._step_fn is None:
            jax = self._jax
            self._step_fn = jax.jit(
                lambda p, tok, carries: self.net.apply(
                    {"params": p}, tok, carries))
            self._first_fn = jax.jit(
                lambda p, tok: self.net.apply({"params": p}, tok))

    def _store(self, prefix, entry):
        if len(self._cache) > 20000:
            # evict the oldest half (insertion order) — never the full
            # cache: live beam prefixes' ancestors usually survive, and a
            # miss replays iteratively from the deepest surviving ancestor
            for k in list(self._cache)[:10000]:
                del self._cache[k]
        self._cache[prefix] = entry
        return entry

    def _state(self, prefix: tuple):
        """(carries, log-softmax over next char) after consuming prefix.

        Iterative: walks back to the deepest cached ancestor and replays
        forward one jitted step per char (a recursive version hit Python's
        recursion limit on long-utterance beam decodes after evictions).
        """
        if prefix in self._cache:
            return self._cache[prefix]
        self._ensure_step()
        jax, jnp = self._jax, self._jnp
        i = len(prefix)
        while i > 0 and prefix[:i] not in self._cache:
            i -= 1
        if i == 0 and () not in self._cache:
            tok = jnp.full((1, 1), self.stoi[BOS], jnp.int32)
            logits, carries = self._first_fn(self.params, tok)
            self._store((), (carries,
                             np.asarray(jax.nn.log_softmax(logits[0, 0]))))
        entry = self._cache[prefix[:i]]
        for j in range(i, len(prefix)):
            carries = entry[0]
            cid = self.stoi.get(prefix[j])
            if cid is None:  # OOV char: keep state, uniform-floor the score
                entry = self._store(prefix[:j + 1], (carries, None))
                continue
            tok = jnp.full((1, 1), cid, jnp.int32)
            logits, carries = self._step_fn(self.params, tok, carries)
            entry = self._store(
                prefix[:j + 1],
                (carries, np.asarray(jax.nn.log_softmax(logits[0, 0]))))
        return entry

    def _floor(self):
        return float(-np.log(len(self.itos)))

    def logp(self, context: Sequence[str], char: str) -> float:
        _, logps = self._state(tuple(context))
        cid = self.stoi.get(char)
        if logps is None or cid is None:
            return self._floor()
        return float(logps[cid])

    def logp_eos(self, context: Sequence[str]) -> float:
        _, logps = self._state(tuple(context))
        if logps is None:
            return self._floor()
        return float(logps[self.stoi[EOS]])

    def next_logps(self, context: Sequence[str],
                   chars: Sequence[str]) -> np.ndarray:
        _, logps = self._state(tuple(context))
        if logps is None:
            return np.full(len(chars), self._floor())
        return np.array([logps[self.stoi[c]] if c in self.stoi
                         else self._floor() for c in chars])

    @property
    def vocab(self):
        return [c for c in self.itos if c not in (BOS, EOS)]

    # ------------------------------------------------------------------- io
    def save(self, path):
        from flax import serialization
        payload = {
            "vocab": "".join(self.itos[2:]),
            "embed": self.embed, "hidden": self.hidden, "layers": self.layers,
            "params": serialization.to_state_dict(self.params),
        }
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(payload))

    @classmethod
    def load(cls, path):
        import jax
        import jax.numpy as jnp
        from flax import serialization
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        lm = cls([BOS, EOS] + list(payload["vocab"]),
                 embed=int(payload["embed"]), hidden=int(payload["hidden"]),
                 layers=int(payload["layers"]))
        template = lm.net.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 4), jnp.int32))["params"]
        lm.params = serialization.from_state_dict(template,
                                                  payload["params"])
        return lm


def train_char_lm(texts, *, steps=600, embed=64, hidden=256, layers=2,
                  seed=0, log_every=0):
    """Train a CharLstmLM on an iterable of transcript strings."""
    texts = [t for t in texts if t]
    itos, _ = _build_vocab(texts)
    lm = CharLstmLM(itos, embed=embed, hidden=hidden, layers=layers)
    return lm.train(texts, steps=steps, seed=seed, log_every=log_every)
