"""Token→mel synthesizer: the in-framework second-stage TTS.

The reference's AISHELL-3 pipeline feeds collapsed VQ-token transcripts to an
*external* ESPnet Tacotron2/Transformer conditioned on Kaldi x-vector speaker
embeddings (reference: egs/aishell3/vc2/run_tts.sh:153-192,201-217 — the TTS
model never lived in the reference repo). This is a TPU-native
non-autoregressive realization (FastSpeech2-style): attention-free, all convs,
static shapes — so it jits cleanly and rides the MXU:

  token embed (+ speaker condition) → conv encoder → duration predictor
  → length regulation (true durations at train time, predicted at inference)
  → variance adaptor (pitch + energy predictors, FastSpeech2)
  → conv decoder → mel → conv postnet residual (Tacotron2 convention)

Speaker conditioning is dual-mode (dispatch on the dtype of the speaker
input): int32 ids use a learned table; float (B, E) CONTINUOUS embeddings —
the x-vector analog from the eval/similarity embedder — are projected with a
Dense layer, so unseen speakers synthesize from an enrollment embedding alone
(reference run_tts.sh:153-192 uses x-vectors for exactly this).

Variance targets need no extra data: energy = per-frame mel mean, pitch = the
mel-bin spectral centroid (a documented proxy — the reference's external
stage extracts true f0 with Kaldi; no wav access exists in this data
contract). Predicted values are used at inference; teacher values train the
conditioning projections.

The duration targets are the csid run lengths the extractor already computes
(infer/bnf.py) — no learned alignment needed.

Config keys: ``token_num`` (VQ codebook size), ``token_dim``, ``y_num/y_dim``,
``spk_embed_dim`` (continuous-mode input dim, optional), ``mel_dim``,
``hidden``, ``enc_stacks``/``dec_stacks``, ``postnet_layers`` (0 disables),
``variance_predictor`` (false disables), ``dur_weight``, ``var_weight``,
``max_tokens``/``max_frames``. Loss = masked frame-mean Gaussian NLL on the
postnet mel + pre-net mel + ``dur_weight``·MSE(log-durations) +
``var_weight``·(MSE(pitch) + MSE(energy)). Detail keys: {Total, X like,
X pre like, DUR loss, PITCH loss, ENERGY loss}.

Two backbone families, mirroring the reference's choice of Tacotron2 vs
Transformer TTS configs (reference:
egs/aishell3/vc2/conf/train_pytorch_{tacotron2,transformer}+spkemb.yaml):

- ``block_type: conv`` (default) — dilated conv residual stacks;
- ``block_type: transformer`` — pre-LN self-attention blocks with sinusoidal
  positions and key-padding masks (= FastSpeech2 proper, the NAR analog of
  the reference's e2e_tts_transformer). Accepts the reference's key names:
  ``adim`` (model dim), ``aheads``, ``elayers``/``dlayers`` (block counts),
  ``eunits``/``dunits`` (FFN widths); attention softmax runs fp32 (the
  measured-bf16-NaN convention from the GST layer, nn/gst.py).
"""

from __future__ import annotations

import math
from typing import Any, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import Conditions, ConvResStack, WNConv1d, length_mask
from ..nn.gst import MultiHeadedAttention

LOG_2PI = math.log(2.0 * math.pi)


def sinusoidal_positions(length: int, dim: int) -> jnp.ndarray:
    """(length, dim) fixed sinusoidal position table (Vaswani convention)."""
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / dim))
    angles = pos * div[None, :]
    pe = jnp.zeros((length, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles[:, : dim // 2]))
    return pe


class TransformerBlock(nn.Module):
    """Pre-LN self-attention + FFN with key-padding masking.

    The NAR-TTS analog of the reference's transformer encoder/decoder layers
    (ESPnet e2e_tts_transformer, selected by the reference's
    train_pytorch_transformer+spkemb.yaml). LayerNorm statistics and the
    attention softmax run fp32 regardless of ``dtype`` (params/norm-stats
    fp32 convention; bf16 softmax NaN hazard measured on the GST layer).
    """
    hidden: int
    heads: int
    ffn: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        # mask: (B, T, 1) — 1 for valid positions; padded keys are excluded
        # from every softmax, so padded batches equal unpadded runs exactly
        # (the framework-wide masked-inference contract).
        key_mask = mask[:, None, :, 0] > 0               # (B, 1=q, T=k)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln_attn")(x) \
            .astype(self.dtype)
        h = MultiHeadedAttention(self.heads, self.hidden, dtype=self.dtype,
                                 name="mha")(h, h, h, mask=key_mask)
        x = x + h * mask.astype(h.dtype)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln_ffn")(x) \
            .astype(self.dtype)
        h = nn.Dense(self.ffn, dtype=self.dtype, name="ffn_in")(h)
        h = nn.relu(h)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="ffn_out")(h)
        return x + h * mask.astype(h.dtype)


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


def mel_pitch_proxy(mel):
    """(B, T, D) mel → (B, T) spectral-centroid pitch proxy in [0, 1].

    Softmax over mel bins as a per-frame spectral distribution; the expected
    normalized bin index tracks pitch/brightness. A documented stand-in for
    true f0 (no waveform access in the token-mel data contract)."""
    p = jax.nn.softmax(mel.astype(jnp.float32), axis=-1)
    bins = jnp.linspace(0.0, 1.0, mel.shape[-1])
    return jnp.sum(p * bins, axis=-1)


def mel_energy(mel):
    """(B, T, D) mel → (B, T) per-frame mean log-mel energy."""
    return jnp.mean(mel.astype(jnp.float32), axis=-1)


class Model(nn.Module):
    arch: Mapping[str, Any]
    dtype: Any = jnp.float32

    def setup(self):
        a = dict(self.arch)
        self.token_num = a.get("token_num", a.get("z_num", 128))
        self.token_dim = a.get("token_dim", 128)
        self.block_type = a.get("block_type", "conv")
        if self.block_type == "transformer":
            # reference key names (train_pytorch_transformer+spkemb.yaml)
            self.hidden = a.get("adim", a.get("hidden", 256))
            self.heads = a.get("aheads", 4)
            self.enc_stacks = a.get("elayers", a.get("enc_stacks", 4))
            self.dec_stacks = a.get("dlayers", a.get("dec_stacks", 4))
            self.eunits = a.get("eunits", 4 * self.hidden)
            self.dunits = a.get("dunits", 4 * self.hidden)
        elif self.block_type == "conv":
            self.hidden = a.get("hidden", 256)
            self.enc_stacks = a.get("enc_stacks", 4)
            self.dec_stacks = a.get("dec_stacks", 4)
        else:
            raise ValueError(f"unknown block_type {self.block_type!r}")
        self.mel_dim = a.get("mel_dim", 80)
        self.postnet_layers = a.get("postnet_layers", 3)
        self.use_variance = a.get("variance_predictor", True)
        self.dur_weight = a.get("dur_weight", 0.1)
        self.var_weight = a.get("var_weight", 0.1)
        self.max_frames = a.get("max_frames", 512)

        self.tok_embed = nn.Embed(self.token_num, self.token_dim,
                                  name="tok_embed")
        self.spk_embed = Conditions(a.get("y_num", 10), a.get("y_dim", 128),
                                    normalize=False, dtype=self.dtype,
                                    name="spk_embed")
        # continuous-embedding projection (x-vector analog); built lazily
        # inside the compact _network (needs the input dim at trace time)
        self.y_dim = a.get("y_dim", 128)

    def _speaker_vector(self, y):
        """(B,) int ids → table lookup; (B, E) float → Dense projection."""
        if jnp.issubdtype(y.dtype, jnp.floating):
            y2 = y.reshape(y.shape[0], -1).astype(self.dtype)
            return nn.Dense(self.y_dim, dtype=self.dtype,
                            name="spk_emb_proj")(y2)
        return self.spk_embed(y.reshape(y.shape[0], -1)[:, 0])

    def _predictor(self, h, name):
        """Small conv stack → per-position scalar (duration/pitch/energy)."""
        d = WNConv1d(self.hidden // 2, 3, dtype=self.dtype,
                     name=f"{name}_0")(h)
        d = nn.relu(d)
        d = WNConv1d(1, 1, dtype=self.dtype, name=f"{name}_1")(d)
        return d[..., 0].astype(jnp.float32)

    @nn.compact
    def _network(self, tokens, durations, y, tok_lens, mel_frames,
                 use_true_dur, target_mel=None):
        B, L = tokens.shape
        tok_mask = length_mask(tok_lens, L)
        h = self.tok_embed(tokens).astype(self.dtype) * tok_mask
        h = WNConv1d(self.hidden, 1, dtype=self.dtype, name="enc_in")(h)
        # speaker condition enters the ENCODER too so durations/variance can
        # be speaker-dependent (ESPnet's spkemb integration point)
        spk = self._speaker_vector(y)
        h = h + WNConv1d(self.hidden, 1, dtype=self.dtype,
                         name="spk_proj_enc")(spk[:, None, :])
        if self.block_type == "transformer":
            h = (h + sinusoidal_positions(L, self.hidden)[None]
                 .astype(h.dtype)) * tok_mask.astype(h.dtype)
            for j in range(self.enc_stacks):
                h = TransformerBlock(self.hidden, self.heads, self.eunits,
                                     dtype=self.dtype,
                                     name=f"enc_{j}")(h, tok_mask)
        else:
            for j in range(self.enc_stacks):
                h = ConvResStack(self.hidden, 3, layers=1,
                                 dilation=2 ** (j % 3), dtype=self.dtype,
                                 name=f"enc_{j}")(h, tok_mask)
        enc = h

        # duration predictor on detached encodings (FastSpeech convention)
        log_dur_pred = self._predictor(jax.lax.stop_gradient(enc), "dur")

        if use_true_dur:
            durs = durations
        else:
            durs = jnp.clip(jnp.round(jnp.expm1(log_dur_pred)), 1, None)
            durs = (durs * tok_mask[..., 0]).astype(jnp.int32)
        frames = length_regulate(enc, durs, mel_frames)

        mel_lens = jnp.minimum(jnp.sum(durs, axis=1), mel_frames)
        mel_mask = length_mask(mel_lens, mel_frames)

        # ----------------------------------------------- variance adaptor
        pitch_pred = energy_pred = None
        if self.use_variance:
            vin = jax.lax.stop_gradient(frames)
            pitch_pred = self._predictor(vin, "pitch")    # (B, T)
            energy_pred = self._predictor(vin, "energy")  # (B, T)
            if target_mel is not None:
                pitch_c = mel_pitch_proxy(target_mel)
                energy_c = mel_energy(target_mel)
            else:
                pitch_c, energy_c = pitch_pred, energy_pred
            frames = frames \
                + WNConv1d(self.hidden, 1, dtype=self.dtype,
                           name="pitch_proj")(pitch_c[..., None]
                                              .astype(self.dtype)) \
                + WNConv1d(self.hidden, 1, dtype=self.dtype,
                           name="energy_proj")(energy_c[..., None]
                                               .astype(self.dtype))

        h = frames + WNConv1d(self.hidden, 1, dtype=self.dtype,
                              name="spk_proj")(spk[:, None, :])
        if self.block_type == "transformer":
            h = (h + sinusoidal_positions(mel_frames, self.hidden)[None]
                 .astype(h.dtype)) * mel_mask.astype(h.dtype)
            for j in range(self.dec_stacks):
                h = TransformerBlock(self.hidden, self.heads, self.dunits,
                                     dtype=self.dtype,
                                     name=f"dec_{j}")(h, mel_mask)
        else:
            for j in range(self.dec_stacks):
                h = ConvResStack(self.hidden, 3, layers=1,
                                 dilation=2 ** (j % 3), dtype=self.dtype,
                                 name=f"dec_{j}")(h, mel_mask)
        mel_pre = WNConv1d(self.mel_dim, 1, dtype=self.dtype,
                           name="mel_out")(h).astype(jnp.float32) * mel_mask

        # ------------------------------------------------------- postnet
        if self.postnet_layers > 0:
            p = mel_pre.astype(self.dtype)
            for j in range(self.postnet_layers):
                p = WNConv1d(self.hidden // 2 if j < self.postnet_layers - 1
                             else self.mel_dim, 5, dtype=self.dtype,
                             name=f"postnet_{j}")(p)
                if j < self.postnet_layers - 1:
                    p = jnp.tanh(p) * mel_mask.astype(p.dtype)
            mel = mel_pre + p.astype(jnp.float32) * mel_mask
        else:
            mel = mel_pre
        return (mel, mel_pre, log_dur_pred, pitch_pred, energy_pred,
                mel_lens, mel_mask)

    def __call__(self, tokens, durations, mels, y_idx, tok_lens, mel_lens,
                 train: bool = True):
        B, T, D = mels.shape
        (mel_hat, mel_pre, log_dur_pred, pitch_pred, energy_pred, _,
         _) = self._network(tokens, durations, y_idx, tok_lens, T,
                            use_true_dur=True, target_mel=mels)

        mel_mask = length_mask(mel_lens, T)
        n_frames = jnp.maximum(jnp.sum(mel_lens), 1)
        x_loss = jnp.sum(0.5 * (LOG_2PI + (mels - mel_hat) ** 2)
                         * mel_mask) / (n_frames * 1.0)
        x_pre = jnp.sum(0.5 * (LOG_2PI + (mels - mel_pre) ** 2)
                        * mel_mask) / (n_frames * 1.0)

        tok_mask = length_mask(tok_lens, tokens.shape[1])[..., 0]
        dur_target = jnp.log1p(durations.astype(jnp.float32))
        dur_loss = jnp.sum((log_dur_pred - dur_target) ** 2 * tok_mask) \
            / jnp.maximum(jnp.sum(tok_mask), 1)

        loss = x_loss + x_pre + self.dur_weight * dur_loss
        detail = {"X like": x_loss, "X pre like": x_pre,
                  "DUR loss": dur_loss}
        if self.use_variance:
            fmask = mel_mask[..., 0]
            nf = jnp.maximum(jnp.sum(fmask), 1)
            p_loss = jnp.sum((pitch_pred - mel_pitch_proxy(mels)) ** 2
                             * fmask) / nf
            e_loss = jnp.sum((energy_pred - mel_energy(mels)) ** 2
                             * fmask) / nf
            loss = loss + self.var_weight * (p_loss + e_loss)
            detail["PITCH loss"] = p_loss
            detail["ENERGY loss"] = e_loss
        detail["Total"] = loss
        return mel_hat, loss, detail

    def infer(self, tokens, y_idx, tok_lens, max_frames=None):
        """→ (mel (B, T, D), mel_lens) with predicted durations/variance.

        ``y_idx`` may be int32 speaker ids (B,) or continuous float speaker
        embeddings (B, E) for unseen speakers."""
        T = max_frames or self.max_frames
        out = self._network(tokens, jnp.zeros_like(tokens), y_idx, tok_lens,
                            T, use_true_dur=False)
        return out[0], out[5]
