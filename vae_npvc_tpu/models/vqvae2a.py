"""Hierarchical VQ-VAE v2a: per-level direct quantization, cascaded decode.

TPU-native re-design of the reference variant (reference:
vae_npvc/model/vqvae2a.py — Model). Differences from vqvae2 (vqvae2a.py
:131-196):

- every level quantizes its encoder output directly (no intermediate decoder
  refinement before quantization);
- decode cascades top-down: ``xhat = dec_i(upsample(cat(z_vq_i, xhat)))``,
  optionally decoding first then upsampling (``upsample_last``,
  vqvae2a.py:114-119);
- options: ``pooling_last`` mean-pools the top level to one frame
  (vqvae2a.py:81-82); ``use_quantizers=False`` shares ONE quantizer across
  levels (vqvae2a.py:43-48); ``use_embeds`` gives each level its own speaker
  table, enabling per-level speaker control at decode time (ys[:, i],
  vqvae2a.py:111).

Known-bug fix (SURVEY.md §7): the reference ``decode`` reads an undefined
``x`` for the level-0 time (vqvae2a.py:107); here the output length is an
explicit ``target_len`` argument.
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
        self.use_quantizers = a.get("use_quantizers", True)
        self.use_embeds = a.get("use_embeds", True)
        self.beta = a.get("beta", 0.01)
        self.jitter_p = a.get("jitter_p", 0.0)
        if self.levels > 1:
            self.pooling_last = (True if self.use_gst
                                 else a.get("pooling_last", True))
        else:
            self.pooling_last = False
        self.upsample_last = a.get("upsample_last", False)

        self.encoders = [Encoder(a[f"encoder.{i}"], dtype=self.dtype,
                                 return_hidden=True, name=f"encoder_{i}")
                         for i in range(self.levels)]
        self.decoders = [Decoder(a[f"decoder.{i}"], dtype=self.dtype,
                                 name=f"decoder_{i}")
                         for i in range(self.levels)]

        y_num, y_dim = a.get("y_num", 10), a.get("y_dim", 128)
        if self.use_embeds:
            self.embeds = [Conditions(y_num, y_dim, normalize=False,
                                      dtype=self.dtype, name=f"embeds_{i}")
                           for i in range(self.levels)]
        else:
            self.embed = Conditions(y_num, y_dim, normalize=False,
                                    dtype=self.dtype, name="embed")

        # quantizers: per-level (with optional GST top) or one shared
        gst_layer = None
        vq_embs = {}
        ema_states = {}
        if self.use_quantizers:
            self.q_args = [dict(a.get(f"quantizer.{i}", {}))
                           for i in range(self.levels)]
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
                        f"quantizer_embedding_{i}",
                        nn.initializers.normal(1.0),
                        (q.get("z_num", 512), q.get("z_dim", 128)),
                        jnp.float32)
        else:
            q = dict(a.get("quantizer", {}))
            self.q_args = [q] * self.levels
            if self.use_ema:
                ema_states[-1] = self.variable(
                    "ema", "quantizer",
                    lambda q=q: vq_ops.ema_vq_init(q.get("z_num", 512),
                                                   q.get("z_dim", 128)))
            else:
                vq_embs[-1] = self.param(
                    "quantizer_embedding", nn.initializers.normal(1.0),
                    (q.get("z_num", 512), q.get("z_dim", 128)), jnp.float32)
        self.gst_layer = gst_layer
        self.vq_embs = vq_embs
        self.ema_states = ema_states

    # ---------------------------------------------------------------- helpers
    def _is_gst_level(self, i):
        return self.use_gst and i == self.levels - 1

    def _qkey(self, i):
        return i if self.use_quantizers else -1

    def _embed(self, i, y_idx):
        table = self.embeds[i] if self.use_embeds else self.embed
        return table(y_idx)[:, None, :]           # (B, 1, y_dim)

    def _len_chain(self, lengths):
        """Real latent length per level (index i = level-i z length); pooled
        and GST tops collapse to length 1."""
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

    def _encode_quantize(self, x, train, collect_losses, lengths=None):
        """Bottom-up sweep → list of z_vq per level (+ losses when training)."""
        z_vq_levels = []
        z_qut_losses, z_enc_losses, vq_details = [], [], []
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
                z_vq = self.gst_layer(
                    jnp.asarray(z, jnp.float32)[:, 0, :])[:, None, :]
            else:
                z_vq, qut, enc, detail = self._quantize(i, z, train)
                if collect_losses:
                    z_qut_losses.append(qut)
                    z_enc_losses.append(enc)
                    detail = dict(detail)
                    detail["quanti_err"] = enc
                    detail["z_rms"] = jnp.sqrt(jnp.mean(
                        jnp.square(jnp.asarray(z, jnp.float32))))
                    vq_details.append(detail)
                if train and self.jitter_p > 0.0:
                    z_vq = jitter_op(self.make_rng("vq"), z_vq, self.jitter_p)
            z_vq_levels.append(z_vq)
        return z_vq_levels, z_qut_losses, z_enc_losses, vq_details

    def _decode_cascade(self, z_vq_levels, y_per_level, target_len,
                        z_lens=None, out_len=None):
        """Top-down decode (vqvae2a.py:160-179). ``y_per_level[i]`` is the
        (B, 1, y_dim) condition for level i; ``z_lens[i]``/``out_len`` are
        the real lengths for masked (padded-batch) inference."""
        a = dict(self.arch)
        if z_lens is None:
            z_lens = [None] * self.levels
        xhat = None
        cur_len = None
        for i in reversed(range(self.levels)):
            if i == self.levels - 1:
                xhat = z_vq_levels[i]
                cur_len = z_lens[i]
            else:
                xhat = jnp.concatenate([z_vq_levels[i], xhat], axis=-1)
            if i == 0:
                t_next, ln_next = target_len, out_len
            else:
                t_next, ln_next = z_vq_levels[i - 1].shape[1], z_lens[i - 1]
            y = y_per_level[i]
            dec_arch = a[f"decoder.{i}"]
            if self.upsample_last:
                xhat = self.decoders[i](xhat.astype(self.dtype),
                                        nearest_upsample(y, xhat.shape[1]),
                                        cur_len)
                dec_len = (None if cur_len is None
                           else Decoder.out_lengths(dec_arch, cur_len))
                xhat = self._upsample(xhat, t_next, dec_len, ln_next)
            else:
                xhat = self.decoders[i](
                    self._upsample(xhat, t_next, cur_len,
                                   ln_next).astype(self.dtype),
                    nearest_upsample(y, t_next), ln_next)
                ln_next = (None if ln_next is None
                           else Decoder.out_lengths(dec_arch, ln_next))
            cur_len = ln_next
        return xhat

    # ---------------------------------------------------------------- forward
    def __call__(self, x, y_idx, train: bool = True):
        y_first = y_idx.reshape(y_idx.shape[0], -1)[:, 0]
        z_vq_levels, z_qut_losses, z_enc_losses, vq_details = (
            self._encode_quantize(x, train, collect_losses=True))
        y_per_level = [self._embed(i, y_first) for i in range(self.levels)]
        xhat = self._decode_cascade(z_vq_levels, y_per_level, x.shape[1])
        xhat = xhat.astype(jnp.float32)

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
        """→ tuple over levels (fine→coarse): ids (B, T_i), or the style
        embedding (B, D) for a GST top (working version of vqvae2a.py:72-91).
        With ``lengths``, padded batches match unpadded runs exactly (ids
        beyond the per-level transformed length are garbage)."""
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
        """``zs`` from :meth:`encode`; ``ys`` (B,) or (B, levels) — per-level
        speaker ids (vqvae2a.py:111 uses ys[:, i] per level). ``lengths`` are
        the real OUTPUT frame counts (per-level code lengths are re-derived
        through the encoder arch chain)."""
        ys = ys.reshape(ys.shape[0], -1)
        z_vq_levels = []
        for i in range(self.levels):
            if self._is_gst_level(i):
                z_vq_levels.append(zs[i][:, None, :])
            else:
                z_vq_levels.append(self._vq_decode(i, zs[i]))
        if target_len is None:
            target_len = z_vq_levels[0].shape[1]
        y_per_level = [
            self._embed(i, ys[:, min(i, ys.shape[1] - 1)])
            for i in range(self.levels)]
        out = self._decode_cascade(z_vq_levels, y_per_level, target_len,
                                   z_lens=self._len_chain(lengths),
                                   out_len=lengths)
        return out.astype(jnp.float32)

    def infer(self, x, y_idx, lengths=None):
        return self.decode(self.encode(x, lengths), y_idx,
                           target_len=x.shape[1], lengths=lengths)
