"""Shared helpers for the hierarchical VQ-VAE families (vqvae2/2a/2b).

The three families previously carried near-verbatim copies of the per-level
quantizer dispatch and the masked mean/upsample helpers (and vqvae2's
masked-mean had already drifted from 2a/2b's). One definition here; the only
family-specific hook is :meth:`HierVQMixin._qkey` (vqvae2a's shared-quantizer
option maps every level to one bank, reference vqvae2a.py:32-48).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import vq as vq_ops
from ..ops.upsample import nearest_upsample, nearest_upsample_masked


class HierVQMixin:
    """Per-level VQ dispatch + masked helpers for hierarchical models.

    Hosts require: ``q_args`` (list of per-level quantizer dicts),
    ``use_ema``, and ``ema_states``/``vq_embs`` keyed by :meth:`_qkey`.
    """

    def _qkey(self, i):
        return i

    def _quantize(self, i, z, train):
        """VQ level i (never the GST level). Returns (z_vq, qut, enc,
        detail) — reference frame_mean reductions (layers_vq.py)."""
        z = z.astype(jnp.float32)
        q = self.q_args[i]
        k = self._qkey(i)
        if self.use_ema:
            rng = (self.make_rng("vq") if train else jax.random.PRNGKey(0))
            z_vq, qut, enc, new_state, detail = vq_ops.ema_vq_forward(
                self.ema_states[k].value, z, rng, mu=q.get("mu", 0.9),
                threshold=q.get("threshold", 1.0), reduction="frame_mean",
                training=train, update=train)
            if train and not self.is_initializing():
                self.ema_states[k].value = new_state
            return z_vq, qut, enc, detail
        return vq_ops.vq_forward(self.vq_embs[k], z,
                                 normalize=q.get("normalize", False),
                                 reduction="frame_mean")

    def _vq_encode(self, i, z):
        k = self._qkey(i)
        if self.use_ema:
            return vq_ops.ema_vq_encode(self.ema_states[k].value,
                                        z.astype(jnp.float32))
        return vq_ops.vq_encode(self.vq_embs[k], z.astype(jnp.float32),
                                normalize=self.q_args[i].get("normalize",
                                                             False))

    def _vq_decode(self, i, idx):
        k = self._qkey(i)
        if self.use_ema:
            return vq_ops.ema_vq_decode(self.ema_states[k].value, idx)
        return vq_ops.vq_decode(self.vq_embs[k], idx,
                                normalize=self.q_args[i].get("normalize",
                                                             False))

    @staticmethod
    def _masked_mean(z, lengths, keepdims=True):
        """Time-mean respecting real lengths (the GST reference embedding /
        pooled top level — with padding an unmasked mean would shift it)."""
        if lengths is None:
            return jnp.mean(z, axis=1, keepdims=keepdims)
        mask = (jnp.arange(z.shape[1])[None, :]
                < lengths[:, None]).astype(z.dtype)
        denom = jnp.maximum(lengths, 1).astype(z.dtype)[:, None]
        out = jnp.sum(z * mask[..., None], axis=1) / denom
        return out[:, None, :] if keepdims else out

    @staticmethod
    def _upsample(z, t, in_len, out_len):
        if in_len is None or out_len is None:
            return nearest_upsample(z, t)
        return nearest_upsample_masked(z, t, in_len, out_len)
