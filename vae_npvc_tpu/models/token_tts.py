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

Three backbone families, covering the reference's Tacotron2/Transformer
config pair (reference:
egs/aishell3/vc2/conf/train_pytorch_{tacotron2,transformer}+spkemb.yaml):

- ``block_type: conv`` (default) — dilated conv residual stacks;
- ``block_type: transformer`` — pre-LN self-attention blocks with sinusoidal
  positions and key-padding masks (= FastSpeech2 proper, the NAR analog of
  the reference's e2e_tts_transformer). Accepts the reference's key names:
  ``adim`` (model dim), ``aheads``, ``elayers``/``dlayers`` (block counts),
  ``eunits``/``dunits`` (FFN widths); attention softmax runs fp32 (the
  measured-bf16-NaN convention from the GST layer, nn/gst.py);
- ``block_type: tacotron2`` — the reference's DEFAULT family: autoregressive
  prenet + location-sensitive-attention + stop-token decoder (Tacotron2Net
  below), scanned over static T/r steps; losses become
  {X like, X pre like, STOP loss} and durations are unused (alignment is
  learned). The NAR families remain the recommended TPU-first default.
"""

from __future__ import annotations

import math
from typing import Any, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import (Conditions, ConvResStack, WNConv1d, length_mask,
                         sinusoidal_positions)
from ..nn.gst import MultiHeadedAttention

LOG_2PI = math.log(2.0 * math.pi)


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
    fused_attention: str = "auto"   # Pallas core on TPU (nn/gst.py)

    @nn.compact
    def __call__(self, x, mask):
        # mask: (B, T, 1) — 1 for valid positions; padded keys are excluded
        # from every softmax, so padded batches equal unpadded runs exactly
        # (the framework-wide masked-inference contract). The mask is a
        # contiguous length prefix, so it is carried as per-row lengths —
        # the form the fused attention kernel masks with.
        lengths = jnp.sum(mask[:, :, 0] > 0, axis=1).astype(jnp.int32)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln_attn")(x) \
            .astype(self.dtype)
        h = MultiHeadedAttention(self.heads, self.hidden, dtype=self.dtype,
                                 fused=self.fused_attention,
                                 name="mha")(h, h, h, lengths=lengths)
        x = x + h * mask.astype(h.dtype)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln_ffn")(x) \
            .astype(self.dtype)
        h = nn.Dense(self.ffn, dtype=self.dtype, name="ffn_in")(h)
        h = nn.relu(h)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="ffn_out")(h)
        return x + h * mask.astype(h.dtype)


class Tacotron2Net(nn.Module):
    """Tacotron2-style autoregressive token→mel network.

    The reference's *default* second-stage config is ESPnet Tacotron2 with a
    location-sensitive-attention AR decoder (reference:
    egs/aishell3/vc2/conf/train_pytorch_tacotron2+spkemb.yaml,
    run_tts.sh:201-217); this realizes that architecture family in-framework
    with the reference's key names: ``embed-dim``, ``econv-layers/chans/
    filts``, ``elayers``/``eunits`` (BiLSTM), ``dlayers``/``dunits`` (decoder
    LSTM), ``prenet-layers/units``, ``postnet-layers/chans/filts``, ``adim``/
    ``aconv-chans``/``aconv-filts`` (location attention),
    ``cumulate-att-w``, ``use-concate``, ``bce-pos-weight``,
    ``reduction-factor``, ``zoneout-rate``, ``dropout-rate``.

    TPU-first realization: the decoder recurrence is one ``nn.scan`` over
    static ``T/r`` steps (teacher-forced at train time; free-running with
    parameter sharing at inference), so the whole AR loop is a single XLA
    while-free compiled program — no per-step Python dispatch, no dynamic
    shapes. Semantics follow ESPnet's decoder ordering: the attention query
    is the FIRST decoder-LSTM layer's hidden state from the previous step;
    the context is concatenated with the prenet output before the LSTM
    stack; the frame/stop projections read ``concat([top hidden, context])``
    when ``use-concate`` (ESPnet e2e_tts_tacotron2 decoder conventions).

    Documented deviations (stateless-TPU choices): LayerNorm replaces
    batchnorm in the encoder convs (``use-batch-norm``; same stabilization
    role, no cross-batch state). Stochasticity draws from the ``vq`` rng
    collection with ESPnet's per-site gating: PRENET dropout is active
    whenever that rng is provided (ESPnet keeps prenet dropout on even at
    inference — pass an rng to ``infer`` to reproduce that); LSTM zoneout
    and encoder-conv dropout are additionally gated on ``train`` (ESPnet
    disables both in eval mode). Without an rng everything is
    deterministic.
    """
    cfg: Mapping[str, Any]
    mel_dim: int
    y_num: int
    y_dim: int
    dtype: Any = jnp.float32

    def _k(self, name, default):
        """Reference keys are dashed (tacotron2+spkemb.yaml); accept both."""
        a = self.cfg
        return a.get(name, a.get(name.replace("-", "_"), default))

    @nn.compact
    def __call__(self, tokens, y, tok_lens, mels=None, mel_lens=None,
                 max_frames=None, train: bool = True,
                 free_run: bool = False):
        """→ (mel (B, T, D), mel_pre, stop_logits (B, T)).

        Teacher-forced when ``free_run=False`` (``mels`` required);
        free-running AR generation over ``max_frames`` otherwise. Both paths
        trace the same submodules, so parameters are shared."""
        a = self._k
        embed_dim = a("embed-dim", 512)
        econv_layers = a("econv-layers", 3)
        econv_chans = a("econv-chans", 512)
        econv_filts = a("econv-filts", 5)
        eunits = a("eunits", 512)
        dlayers = a("dlayers", 2)
        dunits = a("dunits", 1024)
        prenet_layers = a("prenet-layers", 2)
        prenet_units = a("prenet-units", 256)
        postnet_layers = a("postnet-layers", 5)
        postnet_chans = a("postnet-chans", 512)
        postnet_filts = a("postnet-filts", 5)
        adim = a("adim", 128)
        aconv_chans = a("aconv-chans", 32)
        aconv_filts = a("aconv-filts", 15)
        cumulate = a("cumulate-att-w", True)
        use_concate = a("use-concate", True)
        r = a("reduction-factor", 2)
        zoneout = a("zoneout-rate", 0.1)
        dropout = a("dropout-rate", 0.5)
        use_rng = self.has_rng("vq")

        B, L = tokens.shape
        tok_mask = length_mask(tok_lens, L)                   # (B, L, 1)

        # ----------------------------------------------------------- encoder
        h = nn.Embed(a("token_num", 128), embed_dim,
                     name="tok_embed")(tokens).astype(self.dtype) * tok_mask
        for j in range(econv_layers):
            h = nn.Conv(econv_chans, (econv_filts,), dtype=self.dtype,
                        name=f"econv_{j}")(h * tok_mask.astype(h.dtype))
            h = nn.LayerNorm(dtype=jnp.float32,
                             name=f"enorm_{j}")(h).astype(self.dtype)
            h = nn.relu(h)
            if use_rng and train and dropout > 0:
                keep = jax.random.bernoulli(self.make_rng("vq"),
                                            1.0 - dropout, h.shape)
                h = jnp.where(keep, h / (1.0 - dropout), 0.0)
        # BiLSTM: forward pass + an index-flipped backward pass so padded
        # batches equal unpadded runs exactly (the masked-inference contract)
        half = eunits // 2
        fwd = nn.RNN(nn.OptimizedLSTMCell(half), name="blstm_fwd")(h)
        t_idx = jnp.arange(L)[None, :]
        flip = jnp.clip(tok_lens[:, None] - 1 - t_idx, 0, L - 1)
        h_rev = jnp.take_along_axis(h, flip[..., None], axis=1)
        bwd = nn.RNN(nn.OptimizedLSTMCell(half), name="blstm_bwd")(h_rev)
        bwd = jnp.take_along_axis(bwd, flip[..., None], axis=1)
        hs = jnp.concatenate([fwd, bwd], axis=-1) * tok_mask.astype(fwd.dtype)

        # speaker conditioning: projected vector added to encoder outputs
        # (the spkemb integration point; run_tts.sh conditions on x-vectors)
        if jnp.issubdtype(y.dtype, jnp.floating):
            spk = nn.Dense(eunits, name="spk_proj")(
                y.reshape(B, -1).astype(hs.dtype))
        else:
            spk = nn.Embed(self.y_num, eunits, name="spk_embed")(
                y.reshape(B, -1)[:, 0]).astype(hs.dtype)
        hs = (hs + spk[:, None, :]) * tok_mask.astype(hs.dtype)

        # precomputed attention key projection W_h·hs (shared by every step)
        keys_proj = nn.Dense(adim, use_bias=False, name="att_enc_proj")(hs)
        kmask = tok_mask[..., 0] > 0                          # (B, L) bool

        # ------------------------------------------------- scanned decoder
        if free_run:
            T = int(max_frames)
        else:
            T = mels.shape[1]
        pad = (-T) % r
        Tr = (T + pad) // r

        if free_run:
            teacher = jnp.zeros((Tr, B, self.mel_dim), jnp.float32)
        else:
            mels_p = jnp.pad(mels, ((0, 0), (0, pad), (0, 0)))
            last = mels_p[:, r - 1::r, :]                     # (B, Tr, D)
            teacher = jnp.concatenate(
                [jnp.zeros((B, 1, self.mel_dim)), last[:, :-1]],
                axis=1).transpose(1, 0, 2)                    # (Tr, B, D)

        cell = nn.scan(
            _Tacotron2Cell, variable_broadcast="params",
            split_rngs={"params": False, "vq": True},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, 0),
            out_axes=0)(
                dunits=dunits, dlayers=dlayers,
                prenet_layers=prenet_layers, prenet_units=prenet_units,
                adim=adim, aconv_chans=aconv_chans, aconv_filts=aconv_filts,
                mel_dim=self.mel_dim, r=r, cumulate=cumulate,
                use_concate=use_concate, zoneout=zoneout, dropout=dropout,
                free_run=free_run, train=train, dtype=self.dtype,
                name="dec_cell")

        # initial state: uniform attention over valid keys, zero LSTM/context
        w0 = (kmask.astype(jnp.float32)
              / jnp.maximum(jnp.sum(kmask, axis=1, keepdims=True), 1))
        carry0 = {
            "att_w": w0, "att_w_cum": w0,
            "context": jnp.zeros((B, hs.shape[-1]), hs.dtype),
            "c": tuple(jnp.zeros((B, dunits), jnp.float32)
                       for _ in range(dlayers)),
            "h": tuple(jnp.zeros((B, dunits), jnp.float32)
                       for _ in range(dlayers)),
            "prev": jnp.zeros((B, self.mel_dim), jnp.float32),
        }
        _, (groups, stops) = cell(carry0, hs, keys_proj, kmask, teacher)
        # groups (Tr, B, r*D) → (B, T, D); stops (Tr, B, r) → (B, T)
        mel_pre = groups.transpose(1, 0, 2).reshape(B, Tr * r, self.mel_dim)
        mel_pre = mel_pre[:, :T].astype(jnp.float32)
        stop_logits = stops.transpose(1, 0, 2).reshape(B, Tr * r)[:, :T] \
            .astype(jnp.float32)

        # ------------------------------------------------------- postnet
        # masked first: the decoder free-runs over padded steps, and the
        # postnet's receptive field would otherwise leak padded-region
        # output into the last valid frames (breaking padded == unpadded)
        if mel_lens is not None:
            mel_mask = length_mask(mel_lens, T)
            mel_pre = mel_pre * mel_mask
            stop_logits = stop_logits * mel_mask[..., 0]
        p = mel_pre.astype(self.dtype)
        for j in range(postnet_layers):
            p = nn.Conv(postnet_chans if j < postnet_layers - 1
                        else self.mel_dim, (postnet_filts,),
                        dtype=self.dtype, name=f"postnet_{j}")(p)
            if j < postnet_layers - 1:
                p = jnp.tanh(p)
                if mel_lens is not None:
                    p = p * mel_mask.astype(p.dtype)
        mel = mel_pre + p.astype(jnp.float32)
        if mel_lens is not None:
            mel = mel * mel_mask
        return mel, mel_pre, stop_logits


class _Tacotron2Cell(nn.Module):
    """One decoder step: prenet → LSTM stack → location attention → frame/stop.

    Scanned over time by ``Tacotron2Net``; ``free_run`` feeds back the last
    predicted frame of the previous group instead of the teacher frame
    (same parameters either way)."""
    dunits: int
    dlayers: int
    prenet_layers: int
    prenet_units: int
    adim: int
    aconv_chans: int
    aconv_filts: int
    mel_dim: int
    r: int
    cumulate: bool
    use_concate: bool
    zoneout: float
    dropout: float
    free_run: bool
    train: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, hs, keys_proj, kmask, teacher_t):
        use_rng = self.has_rng("vq")
        prev = carry["prev"] if self.free_run else teacher_t

        # prenet (dropout active whenever an rng is available — the
        # tacotron2 convention keeps it on at inference too if one is given)
        p = prev.astype(self.dtype)
        for j in range(self.prenet_layers):
            p = nn.Dense(self.prenet_units, name=f"prenet_{j}")(p)
            p = nn.relu(p)
            if use_rng and self.dropout > 0:
                keep = jax.random.bernoulli(self.make_rng("vq"),
                                            1.0 - self.dropout, p.shape)
                p = jnp.where(keep, p / (1.0 - self.dropout), 0.0)

        # location-sensitive attention; query = first LSTM layer's hidden
        # from the PREVIOUS step (ESPnet decoder ordering)
        att_prev = carry["att_w_cum"] if self.cumulate else carry["att_w"]
        f = nn.Conv(self.aconv_chans, (2 * self.aconv_filts + 1,),
                    use_bias=False, dtype=self.dtype,
                    name="loc_conv")(att_prev[..., None].astype(self.dtype))
        f = nn.Dense(self.adim, use_bias=False, name="att_loc_proj")(f)
        q = nn.Dense(self.adim, use_bias=False, name="att_query_proj")(
            carry["h"][0].astype(self.dtype))[:, None, :]
        e = nn.Dense(1, use_bias=False, name="att_v")(
            jnp.tanh(q + keys_proj + f))[..., 0]
        e = jnp.where(kmask, e.astype(jnp.float32), -1e9)
        att_w = jax.nn.softmax(e, axis=-1) * kmask            # fp32, exact-0
        context = jnp.einsum("bl,blc->bc", att_w.astype(hs.dtype), hs)

        # LSTM stack with zoneout (train only)
        x = jnp.concatenate([context.astype(jnp.float32),
                             p.astype(jnp.float32)], axis=-1)
        cs, hs_new = [], []
        for l in range(self.dlayers):
            cell = nn.OptimizedLSTMCell(self.dunits, name=f"lstm_{l}")
            (c_new, h_new), _ = cell((carry["c"][l], carry["h"][l]), x)
            if self.train and use_rng and self.zoneout > 0:
                kc = jax.random.bernoulli(self.make_rng("vq"), self.zoneout,
                                          c_new.shape)
                kh = jax.random.bernoulli(self.make_rng("vq"), self.zoneout,
                                          h_new.shape)
                c_new = jnp.where(kc, carry["c"][l], c_new)
                h_new = jnp.where(kh, carry["h"][l], h_new)
            cs.append(c_new)
            hs_new.append(h_new)
            x = h_new

        zcs = (jnp.concatenate([hs_new[-1],
                                context.astype(jnp.float32)], axis=-1)
               if self.use_concate else hs_new[-1])
        group = nn.Dense(self.mel_dim * self.r, use_bias=False,
                         name="feat_out")(zcs.astype(self.dtype))
        stop = nn.Dense(self.r, name="prob_out")(zcs.astype(self.dtype))

        new_carry = {
            "att_w": att_w,
            "att_w_cum": carry["att_w_cum"] + att_w if self.cumulate
            else att_w,
            "context": context,
            "c": tuple(cs), "h": tuple(hs_new),
            "prev": group.astype(jnp.float32)[:, -self.mel_dim:],
        }
        return new_carry, (group, stop)


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
        self.fused_attn = a.get("fused_attention", "auto")
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
        elif self.block_type == "tacotron2":
            # AR attention decoder (reference's default second-stage family,
            # train_pytorch_tacotron2+spkemb.yaml); all structure keys are
            # read by Tacotron2Net with the reference's dashed names
            self.tac2 = Tacotron2Net(
                cfg=dict(a, token_num=self.token_num),
                mel_dim=a.get("mel_dim", 80), y_num=a.get("y_num", 10),
                y_dim=a.get("y_dim", 128), dtype=self.dtype, name="tac2")
            self.bce_pos_weight = a.get("bce-pos-weight",
                                        a.get("bce_pos_weight", 3.0))
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
                                     fused_attention=self.fused_attn,
                                     name=f"enc_{j}")(h, tok_mask)
        else:
            # padded==unpadded contract: the embed/speaker biases make
            # padded positions nonzero, and ConvResStack masks only its
            # stats/output — zero the conv INPUT too, like the transformer
            # branch, or dilated convs pull padding into valid frames
            h = h * tok_mask.astype(h.dtype)
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
        # padded==unpadded at the frame axis: length_regulate fills frames
        # beyond sum(durs) with the LAST token's (valid, nonzero) encoding
        # when the token axis has no padding — mask them here so the
        # variance predictors' kernel-3 convs don't read past mel_lens
        frames = frames * mel_mask.astype(frames.dtype)

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
                                     fused_attention=self.fused_attn,
                                     name=f"dec_{j}")(h, mel_mask)
        else:
            h = h * mel_mask.astype(h.dtype)
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
        if self.block_type == "tacotron2":
            # durations are unused: alignment is learned by the attention
            return self._tacotron_loss(tokens, mels, y_idx, tok_lens,
                                       mel_lens, train)
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

    def _tacotron_loss(self, tokens, mels, y_idx, tok_lens, mel_lens, train):
        """Teacher-forced AR forward + the tacotron2 loss set: Gaussian NLL
        on post/pre-postnet mels (the framework's X-like convention) +
        weighted stop-token BCE (``bce-pos-weight``, reference yaml)."""
        B, T, D = mels.shape
        mel_hat, mel_pre, stop_logits = self.tac2(
            tokens, y_idx, tok_lens, mels=mels, mel_lens=mel_lens,
            train=train)

        mel_mask = length_mask(mel_lens, T)
        n_frames = jnp.maximum(jnp.sum(mel_lens), 1)
        x_loss = jnp.sum(0.5 * (LOG_2PI + (mels - mel_hat) ** 2)
                         * mel_mask) / (n_frames * 1.0)
        x_pre = jnp.sum(0.5 * (LOG_2PI + (mels - mel_pre) ** 2)
                        * mel_mask) / (n_frames * 1.0)

        # stop targets: 1 at the utterance's final valid frame, else 0
        fmask = mel_mask[..., 0]
        t = jnp.arange(T)[None, :]
        stop_target = (t == (mel_lens[:, None] - 1)).astype(jnp.float32)
        logp = jax.nn.log_sigmoid(stop_logits)
        log1mp = jax.nn.log_sigmoid(-stop_logits)
        bce = -(self.bce_pos_weight * stop_target * logp
                + (1.0 - stop_target) * log1mp)
        stop_loss = jnp.sum(bce * fmask) / jnp.maximum(jnp.sum(fmask), 1)

        loss = x_loss + x_pre + stop_loss
        detail = {"X like": x_loss, "X pre like": x_pre,
                  "STOP loss": stop_loss, "Total": loss}
        return mel_hat, loss, detail

    def infer(self, tokens, y_idx, tok_lens, max_frames=None):
        """→ (mel (B, T, D), mel_lens) with predicted durations/variance
        (NAR backbones) or free-running attention decoding + stop-token
        lengths (``block_type: tacotron2``).

        ``y_idx`` may be int32 speaker ids (B,) or continuous float speaker
        embeddings (B, E) for unseen speakers."""
        T = max_frames or self.max_frames
        if self.block_type == "tacotron2":
            mel, _, stop_logits = self.tac2(
                tokens, y_idx, tok_lens, max_frames=T, train=False,
                free_run=True)
            stopped = jax.nn.sigmoid(stop_logits) > 0.5       # (B, T)
            any_stop = jnp.any(stopped, axis=1)
            first = jnp.argmax(stopped, axis=1)               # 0 if none
            mel_lens = jnp.where(any_stop, first + 1, T).astype(jnp.int32)
            return mel * length_mask(mel_lens, T), mel_lens
        out = self._network(tokens, jnp.zeros_like(tokens), y_idx, tok_lens,
                            T, use_true_dur=False)
        return out[0], out[5]
