"""Global style tokens: learnable token bank attended by a reference embedding.

Re-implementation of the reference's GST layer behavior (reference:
vae_npvc/model/layers_gst.py — StyleTokenLayer / MultiHeadedAttention, itself
an ESPnet-derived design): tanh'd token bank (tokens, token_dim // heads),
multi-head attention with distinct q/k/v input dims, single query = the
reference embedding. The reference's masked path has an unimported-numpy bug
(layers_gst.py:117); masks are supported here properly.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class MultiHeadedAttention(nn.Module):
    """MHA with distinct q/k/v input dims (layers_gst.py:63-147).

    ``fused`` selects the Pallas attention core (ops/attention_pallas.py)
    for self-attention calls that pass ``lengths``: "auto" uses it on TPU,
    "never" keeps the stock XLA path, "interpret" forces the kernel's
    interpreter mode (CPU tests). The kernel is exactly the same function
    (fp32 softmax with key-padding masking) computed VMEM-resident.
    """
    n_head: int
    n_feat: int
    dtype: Any = jnp.float32
    fused: str = "auto"

    @nn.compact
    def __call__(self, query, key, value, mask=None, lengths=None):
        assert self.n_feat % self.n_head == 0
        d_k = self.n_feat // self.n_head
        B = query.shape[0]
        q = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_q")(query)
        k = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_k")(key)
        v = nn.Dense(self.n_feat, dtype=self.dtype, name="linear_v")(value)
        q = q.reshape(B, -1, self.n_head, d_k).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, self.n_head, d_k).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, self.n_head, d_k).transpose(0, 2, 1, 3)
        if lengths is not None and mask is None and q.shape == k.shape:
            from ..ops import attention_pallas
            if self.fused == "interpret" or (self.fused == "auto"
                                             and attention_pallas
                                             .compiled_ok()):
                x = attention_pallas.fused_attention(
                    q, k, v, lengths,
                    interpret=(self.fused == "interpret"))
                x = x.transpose(0, 2, 1, 3).reshape(B, -1, self.n_feat)
                return nn.Dense(self.n_feat, dtype=self.dtype,
                                name="linear_out")(x)
            t = jnp.arange(k.shape[2])[None, None, :]
            mask = (t < jnp.asarray(lengths)[:, None, None])
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(d_k, jnp.float32)).astype(q.dtype)
        if mask is not None:
            scores = jnp.where(mask[:, None, :, :] if mask.ndim == 3
                               else mask, scores, jnp.finfo(jnp.float32).min)
        # explicit max-subtraction behind an optimization barrier: the GST
        # query is the *unnormalized* encoder mean, whose scale grows with
        # the un-normed res-skip chains (~1e16 observed on the trained
        # flagship vqvae2) — XLA's fusion of dot→softmax→dot can cancel the
        # stable form's max-subtraction into exp(x)/Σexp(x) = inf/inf = NaN
        # (jit-only; eager was finite). Shift-invariance makes this exact.
        scores = scores.astype(jnp.float32)
        scores = scores - jax.lax.stop_gradient(
            jnp.max(scores, axis=-1, keepdims=True))
        scores = jax.lax.optimization_barrier(scores)
        attn = nn.softmax(scores, axis=-1).astype(q.dtype)
        x = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        x = x.transpose(0, 2, 1, 3).reshape(B, -1, self.n_feat)
        return nn.Dense(self.n_feat, dtype=self.dtype, name="linear_out")(x)


class StyleTokenLayer(nn.Module):
    """(B, ref_embed_dim) reference embedding -> (B, gst_token_dim) style."""
    ref_embed_dim: int = 128
    gst_tokens: int = 10
    gst_token_dim: int = 256
    gst_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ref_embs):
        B = ref_embs.shape[0]
        gst_embs = self.param(
            "gst_embs", nn.initializers.normal(1.0),
            (self.gst_tokens, self.gst_token_dim // self.gst_heads),
            jnp.float32)
        tokens = jnp.tanh(gst_embs)[None].repeat(B, axis=0).astype(self.dtype)
        out = MultiHeadedAttention(self.gst_heads, self.gst_token_dim,
                                   dtype=self.dtype, name="mha")(
            ref_embs[:, None, :].astype(self.dtype), tokens, tokens)
        return out[:, 0, :]
