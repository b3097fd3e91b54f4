"""Hierarchical VQ-VAE v2b: independent per-level decoders + fusion decoder.

TPU-native re-design of the reference variant (reference:
vae_npvc/model/vqvae2b.py — Model). Structure (vqvae2b.py:100-141):

- every level quantizes its encoder output directly (pooled to one frame at
  the top when ``pooling_last``, GST optional at the top);
- each level is decoded **independently** to time-aligned features by its own
  decoder conditioned on its own speaker embedding table — per-level speaker
  control (decode uses ``ys[:, i]`` per level, vqvae2b.py:78);
- a dedicated ``final_decoder`` fuses the channel-concat of all level decodes,
  unconditioned (cond=None, vqvae2b.py:90,135).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import Conditions
from ..nn.gst import StyleTokenLayer
from ..ops import vq as vq_ops
from ..ops.jitter import jitter as jitter_op
from ..ops.losses import log_loss
from ..ops.upsample import nearest_upsample, nearest_upsample_masked
from .hier_common import HierVQMixin
from .vqvae import Decoder, Encoder


class Model(HierVQMixin, nn.Module):
    arch: Mapping[str, Any]
    dtype: Any = jnp.float32

    def setup(self):
        a = dict(self.arch)
        self.levels = a.get("levels", 3)
        self.use_gst = a.get("use_gst", True) if self.levels > 1 else False
        self.use_ema = a.get("use_ema", True)
        self.beta = a.get("beta", 0.01)
        self.jitter_p = a.get("jitter_p", 0.0)
        self.pooling_last = a.get("pooling_last", True)
        self.upsample_last = a.get("upsample_last", False)

        self.encoders = [Encoder(a[f"encoder.{i}"], dtype=self.dtype,
                                 return_hidden=True, name=f"encoder_{i}")
                         for i in range(self.levels)]
        self.decoders = [Decoder(a[f"decoder.{i}"], dtype=self.dtype,
                                 name=f"decoder_{i}")
                         for i in range(self.levels)]
        self.final_decoder = Decoder(a["final_decoder"], dtype=self.dtype,
                                     name="final_decoder")

        y_num, y_dim = a.get("y_num", 10), a.get("y_dim", 128)
        self.embeds = [Conditions(y_num, y_dim, normalize=False,
                                  dtype=self.dtype, name=f"embeds_{i}")
                       for i in range(self.levels)]

        self.q_args = [dict(a.get(f"quantizer.{i}", {}))
                       for i in range(self.levels)]
        gst_layer = None
        vq_embs = {}
        ema_states = {}
        for i in range(self.levels):
            q = self.q_args[i]
            if self.use_gst and i == self.levels - 1:
                gst_layer = StyleTokenLayer(
                    ref_embed_dim=q.get("ref_embed_dim", 128),
                    gst_tokens=q.get("gst_tokens", 10),
                    gst_token_dim=q.get("gst_token_dim", 256),
                    gst_heads=q.get("gst_heads", 4),
                    # fp32-pinned like vqvae2: bf16 attention scores on
                    # large reference embeddings NaN (negligible FLOPs)
                    dtype=jnp.float32, name="gst")
            elif self.use_ema:
                ema_states[i] = self.variable(
                    "ema", f"quantizer_{i}",
                    lambda q=q: vq_ops.ema_vq_init(q.get("z_num", 512),
                                                   q.get("z_dim", 128)))
            else:
                vq_embs[i] = self.param(
                    f"quantizer_embedding_{i}", nn.initializers.normal(1.0),
                    (q.get("z_num", 512), q.get("z_dim", 128)), jnp.float32)
        self.gst_layer = gst_layer
        self.vq_embs = vq_embs
        self.ema_states = ema_states

    # ---------------------------------------------------------------- helpers
    def _is_gst_level(self, i):
        return self.use_gst and i == self.levels - 1

    def _len_chain(self, lengths):
        """Real latent length per level; pooled/GST tops collapse to 1."""
        if lengths is None:
            return [None] * self.levels
        a = dict(self.arch)
        lens, cur = [], lengths
        for i in range(self.levels):
            cur = Encoder.out_lengths(a[f"encoder.{i}"], cur)
            if ((self.pooling_last or self._is_gst_level(i))
                    and i == self.levels - 1):
                cur = jnp.ones_like(cur)
            lens.append(cur)
        return lens

    def _level_decode(self, i, z_vq, y, time, z_len=None, out_len=None):
        """Decode one level to ``time``-aligned features (vqvae2b.py:126-131).
        ``z_len``/``out_len`` are real lengths for masked padded batches."""
        dec_arch = dict(self.arch)[f"decoder.{i}"]
        if self.upsample_last:
            out = self.decoders[i](z_vq.astype(self.dtype),
                                   nearest_upsample(y, z_vq.shape[1]), z_len)
            dec_len = (None if z_len is None
                       else Decoder.out_lengths(dec_arch, z_len))
            return self._upsample(out, time, dec_len, out_len)
        return self.decoders[i](
            self._upsample(z_vq, time, z_len, out_len).astype(self.dtype),
            nearest_upsample(y, time), out_len)

    # ---------------------------------------------------------------- forward
    def __call__(self, x, y_idx, train: bool = True):
        y_first = y_idx.reshape(y_idx.shape[0], -1)[:, 0]
        time = x.shape[1]
        z_qut_losses, z_enc_losses, vq_details = [], [], []
        level_feats = []
        h = x.astype(self.dtype)
        for i in range(self.levels):
            z, h = self.encoders[i](h)
            if self.pooling_last and i == self.levels - 1:
                z = jnp.mean(z.astype(jnp.float32), axis=1, keepdims=True)
            if self._is_gst_level(i):
                z_vq = self.gst_layer(
                    jnp.asarray(z, jnp.float32)[:, 0, :])[:, None, :]
            else:
                z_vq, qut, enc, detail = self._quantize(i, z, train)
                z_qut_losses.append(qut)
                z_enc_losses.append(enc)
                detail = dict(detail)
                detail["quanti_err"] = enc
                detail["z_rms"] = jnp.sqrt(jnp.mean(
                    jnp.square(jnp.asarray(z, jnp.float32))))
                vq_details.append(detail)
                if train and self.jitter_p > 0.0:
                    z_vq = jitter_op(self.make_rng("vq"), z_vq, self.jitter_p)
            y = self.embeds[i](y_first)[:, None, :]
            level_feats.append(self._level_decode(i, z_vq, y, time))

        fused = jnp.concatenate(level_feats, axis=-1).astype(self.dtype)
        xhat = self.final_decoder(fused, None).astype(jnp.float32)

        x_loss = log_loss(xhat, x.astype(jnp.float32))
        z_qut_loss = sum(z_qut_losses) if z_qut_losses else 0.0
        z_enc_loss = sum(z_enc_losses) if z_enc_losses else 0.0
        loss = x_loss + z_qut_loss + self.beta * z_enc_loss
        detail = {"Total": loss, "VQ loss": z_enc_loss, "X like": x_loss}
        for i, d in enumerate(vq_details):
            detail.update({f"{k}.{i}": v for k, v in d.items()})
        return xhat, loss, detail

    # ------------------------------------------------------------ inference
    def encode(self, x, lengths=None):
        """→ tuple over levels: ids (B, T_i) / style (B, D) for a GST top
        (vqvae2b.py:52-70). With ``lengths``, padded batches match unpadded
        runs exactly (ids beyond the per-level length are garbage)."""
        out = []
        a = dict(self.arch)
        h = x.astype(self.dtype)
        cur_len = lengths
        for i in range(self.levels):
            z, h = self.encoders[i](h, cur_len)
            if cur_len is not None:
                cur_len = Encoder.out_lengths(a[f"encoder.{i}"], cur_len)
            if self.pooling_last and i == self.levels - 1:
                z = self._masked_mean(z.astype(jnp.float32), cur_len)
            if self._is_gst_level(i):
                out.append(self.gst_layer(
                    jnp.asarray(z, jnp.float32)[:, 0, :]))
            else:
                out.append(self._vq_encode(i, z))
        return tuple(out)

    def decode(self, zs, ys, target_len=None, lengths=None):
        """``ys`` (B,) or (B, levels): per-level speaker ids
        (vqvae2b.py:73-90). ``lengths`` are the real OUTPUT frame counts."""
        ys = ys.reshape(ys.shape[0], -1)
        if target_len is None:
            # finest VQ level's length (the GST entry is (B, D), not temporal)
            target_len = max(zs[i].shape[-1] for i in range(self.levels)
                             if not self._is_gst_level(i))
        z_lens = self._len_chain(lengths)
        level_feats = []
        for i in range(self.levels):
            y = self.embeds[i](ys[:, min(i, ys.shape[1] - 1)])[:, None, :]
            if self._is_gst_level(i):
                z_vq = zs[i][:, None, :]
            else:
                z_vq = self._vq_decode(i, zs[i])
            level_feats.append(self._level_decode(i, z_vq, y, target_len,
                                                  z_len=z_lens[i],
                                                  out_len=lengths))
        fused = jnp.concatenate(level_feats, axis=-1).astype(self.dtype)
        return self.final_decoder(fused, None, lengths).astype(jnp.float32)

    def infer(self, x, y_idx, lengths=None):
        return self.decode(self.encode(x, lengths), y_idx,
                           target_len=x.shape[1], lengths=lengths)
