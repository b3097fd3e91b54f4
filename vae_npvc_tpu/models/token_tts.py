"""Token→mel synthesizer: the in-framework second-stage TTS.

The reference's AISHELL-3 pipeline feeds collapsed VQ-token transcripts to an
*external* ESPnet Tacotron2/Transformer (reference: egs/aishell3/vc2/
run_tts.sh:201-217 — the TTS model never lived in the reference repo). This is
a TPU-native non-autoregressive realization (FastSpeech-style): attention-free,
all convs, static shapes — so it jits cleanly and rides the MXU:

  token embed (+ speaker embed) → conv encoder → duration predictor
  → length regulation (true durations at train time, predicted at inference)
  → conv decoder → mel

The duration targets are the csid run lengths the extractor already computes
(infer/bnf.py) — no learned alignment needed.

Config keys: ``token_num`` (VQ codebook size), ``token_dim``, ``y_num/y_dim``,
``mel_dim``, ``hidden``, ``enc_stacks``/``dec_stacks``, ``dur_weight``,
``max_tokens``/``max_frames``. Loss = masked frame-mean Gaussian NLL on mel
(the reference's 'X like' metric) + ``dur_weight`` · masked MSE on
log-durations. Detail keys: {Total, X like, DUR loss}.
"""

from __future__ import annotations

import math
from typing import Any, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import Conditions, ConvResStack, WNConv1d, length_mask

LOG_2PI = math.log(2.0 * math.pi)


def length_regulate(enc, durations, max_frames):
    """Expand (B, L, C) token features to (B, T, C) frames by durations.

    Frame t takes the features of the token whose cumulative-duration interval
    contains t (positions past the total duration repeat the last token and
    are masked by the caller).
    """
    cum = jnp.cumsum(durations, axis=1)                   # (B, L)
    t = jnp.arange(max_frames)[None, :]                   # (1, T)
    # index of first token with cum > t
    frame_tok = jnp.sum((t[:, :, None] >= cum[:, None, :]).astype(jnp.int32),
                        axis=-1)                          # (B, T)
    frame_tok = jnp.minimum(frame_tok, enc.shape[1] - 1)
    return jnp.take_along_axis(enc, frame_tok[:, :, None], axis=1)


class Model(nn.Module):
    arch: Mapping[str, Any]
    dtype: Any = jnp.float32

    def setup(self):
        a = dict(self.arch)
        self.token_num = a.get("token_num", a.get("z_num", 128))
        self.token_dim = a.get("token_dim", 128)
        self.hidden = a.get("hidden", 256)
        self.mel_dim = a.get("mel_dim", 80)
        self.enc_stacks = a.get("enc_stacks", 4)
        self.dec_stacks = a.get("dec_stacks", 4)
        self.dur_weight = a.get("dur_weight", 0.1)
        self.max_frames = a.get("max_frames", 512)

        self.tok_embed = nn.Embed(self.token_num, self.token_dim,
                                  name="tok_embed")
        self.spk_embed = Conditions(a.get("y_num", 10), a.get("y_dim", 128),
                                    normalize=False, dtype=self.dtype,
                                    name="spk_embed")

    @nn.compact
    def _network(self, tokens, durations, y_idx, tok_lens, mel_frames,
                 use_true_dur):
        B, L = tokens.shape
        tok_mask = length_mask(tok_lens, L)
        h = self.tok_embed(tokens).astype(self.dtype) * tok_mask
        h = WNConv1d(self.hidden, 1, dtype=self.dtype, name="enc_in")(h)
        for j in range(self.enc_stacks):
            h = ConvResStack(self.hidden, 3, layers=1, dilation=2 ** (j % 3),
                             dtype=self.dtype, name=f"enc_{j}")(h, tok_mask)
        enc = h

        # duration predictor on detached encodings (FastSpeech convention)
        d = jax.lax.stop_gradient(enc)
        d = WNConv1d(self.hidden // 2, 3, dtype=self.dtype, name="dur_0")(d)
        d = nn.relu(d)
        d = WNConv1d(1, 1, dtype=self.dtype, name="dur_1")(d)
        log_dur_pred = d[..., 0].astype(jnp.float32)       # (B, L)

        if use_true_dur:
            durs = durations
        else:
            durs = jnp.clip(jnp.round(jnp.expm1(log_dur_pred)), 1, None)
            durs = (durs * tok_mask[..., 0]).astype(jnp.int32)
        frames = length_regulate(enc, durs, mel_frames)

        y = self.spk_embed(y_idx.reshape(y_idx.shape[0], -1)[:, 0])
        h = frames + WNConv1d(self.hidden, 1, dtype=self.dtype,
                              name="spk_proj")(y[:, None, :])
        mel_lens = jnp.minimum(jnp.sum(durs, axis=1), mel_frames)
        mel_mask = length_mask(mel_lens, mel_frames)
        for j in range(self.dec_stacks):
            h = ConvResStack(self.hidden, 3, layers=1, dilation=2 ** (j % 3),
                             dtype=self.dtype, name=f"dec_{j}")(h, mel_mask)
        mel = WNConv1d(self.mel_dim, 1, dtype=self.dtype, name="mel_out")(h)
        mel = mel.astype(jnp.float32) * mel_mask
        return mel, log_dur_pred, mel_lens

    def __call__(self, tokens, durations, mels, y_idx, tok_lens, mel_lens,
                 train: bool = True):
        B, T, D = mels.shape
        mel_hat, log_dur_pred, _ = self._network(
            tokens, durations, y_idx, tok_lens, T, use_true_dur=True)

        mel_mask = length_mask(mel_lens, T)
        n_frames = jnp.maximum(jnp.sum(mel_lens), 1)
        mel_elem = 0.5 * (LOG_2PI + (mels - mel_hat) ** 2) * mel_mask
        x_loss = jnp.sum(mel_elem) / (n_frames * 1.0)

        tok_mask = length_mask(tok_lens, tokens.shape[1])[..., 0]
        dur_target = jnp.log1p(durations.astype(jnp.float32))
        dur_elem = (log_dur_pred - dur_target) ** 2 * tok_mask
        dur_loss = jnp.sum(dur_elem) / jnp.maximum(jnp.sum(tok_mask), 1)

        loss = x_loss + self.dur_weight * dur_loss
        detail = {"Total": loss, "X like": x_loss, "DUR loss": dur_loss}
        return mel_hat, loss, detail

    def infer(self, tokens, y_idx, tok_lens, max_frames=None):
        """→ (mel (B, T, D), mel_lens) with predicted durations."""
        T = max_frames or self.max_frames
        mel, _, mel_lens = self._network(
            tokens, jnp.zeros_like(tokens), y_idx, tok_lens, T,
            use_true_dur=False)
        return mel, mel_lens
