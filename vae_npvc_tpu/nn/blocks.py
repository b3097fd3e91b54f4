"""Reusable NN building blocks, channels-last (B, T, C), flax.linen.

TPU-first re-design of the reference's conv blocks
(reference: vae_npvc/model/layers.py — Conditions, Conv1d_Layernorm_LRelu_Residual,
DeConv1d_Layernorm_GLU_ResSkip):

- layout is ``(batch, time, channels)`` so the channel dim rides the 128-wide
  lanes and convs lower onto the MXU as implicit matmuls.
- every conv is weight-normalized (``w = g * v / ||v||`` over the non-output
  dims), matching the reference's ``nn.utils.weight_norm`` on all convs
  (reference: vae_npvc/model/vqvae.py:203-208). The reparameterization is done
  in fp32 once per step and is fused by XLA into the conv's weight load.
- the reference's stride-1 ``ConvTranspose1d`` blocks (its "DeConv" res-skip
  stacks) are mathematically plain dilated convs with flipped kernels; since the
  kernels are learned, we implement them as forward convs — same function class,
  one fewer exotic lowering. Strided upsampling layers use a real transposed conv
  (input dilation) with the reference's exact length arithmetic
  (out_len = in_len * scale; kernel 2s, padding s//2+s%2, output_padding s%2).
- GroupNorm matches torch semantics: statistics over (channels_in_group, time)
  per sample (NOT per-timestep layer norm).

Compute dtype is configurable (bf16 on TPU); normalization statistics and the
weight-norm reparameterization stay fp32.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def length_mask(lengths, T, dtype=jnp.float32):
    """(B,) lengths -> (B, T, 1) {0,1} mask."""
    t = jnp.arange(T)[None, :]
    return (t < lengths[:, None]).astype(dtype)[:, :, None]


def sinusoidal_positions(length: int, dim: int) -> jnp.ndarray:
    """(length, dim) fixed sinusoidal position table (Vaswani convention).

    Shared by the transformer token-TTS backbone (models/token_tts.py) and
    the transformer-encoder eval recognizer (eval/asr.py); fp32 regardless
    of compute dtype — the table is added once at the encoder input.
    """
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / dim))
    angles = pos * div[None, :]
    pe = jnp.zeros((length, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles[:, : dim // 2]))
    return pe


def group_norm(x, scale, bias, num_groups, eps=1e-5, mask=None,
               seq_axis=None, glu=False):
    """Torch-semantics GroupNorm for (B, T, C): stats over (T, C//G) per group.

    With ``mask`` (B, T, 1), statistics cover only valid frames — this makes a
    zero-padded batched utterance numerically identical to the unpadded
    per-utterance computation (the reference runs inference unpadded,
    decoder/basic.py:61-63; we batch with masks instead).

    With ``seq_axis`` (a mesh axis name, inside shard_map), the time axis is
    sharded across chips and the statistics are psum-ed so the result matches
    the unsharded computation (sequence-parallel inference).

    With ``glu`` the tanh⊙sigmoid gate over the channel halves is applied as
    an epilogue (the reference's Layernorm→GLU pairing, layers.py:98-126 and
    :181-249). On the unmasked/unsharded training hot path the whole
    stats→normalize→affine(→GLU) chain runs as one fused Pallas kernel
    (ops/groupnorm_pallas.py) when shapes fit; all other paths — and any
    backend where the kernel fails its compile probe — use the stock XLA
    lowering below.
    """
    B, T, C = x.shape
    if mask is None and seq_axis is None:
        from ..ops import groupnorm_pallas as _gnp
        if _gnp.wants(x.shape, num_groups, glu) and _gnp.compiled_ok():
            return _gnp.fused_group_norm(x, scale, bias, num_groups, eps,
                                         glu=glu)
    G = num_groups
    xf = x.astype(jnp.float32).reshape(B, T, G, C // G)
    if mask is None:
        m = jnp.ones((B, T, 1, 1), jnp.float32)
    else:
        m = mask.astype(jnp.float32)[:, :, :, None]       # (B, T, 1, 1)
    # two-pass moments: mean, then E[(x-mean)^2]. The one-pass E[x^2]-mean^2
    # form cancels catastrophically when |mean| >> std (seen at ~6e4-scale
    # activations in the deep hierarchical config: var underflows to ~0, the
    # rsqrt amplifies by ~300x, and bf16 training blows up).
    count = jnp.sum(m, axis=1, keepdims=True) * (C // G)
    total = jnp.sum(xf * m, axis=(1, 3), keepdims=True)
    if seq_axis is not None:
        count = jax.lax.psum(count, seq_axis)
        total = jax.lax.psum(total, seq_axis)
    # an all-masked row (0 real frames, e.g. a deeply-downsampled level of a
    # very short padded utterance) must yield 0s, not 0/0 NaN — the output is
    # re-masked below, so the stats value is irrelevant, only finiteness is
    count = jnp.maximum(count, 1.0)
    mean = total / count
    sq = jnp.sum(jnp.square(xf - mean) * m, axis=(1, 3), keepdims=True)
    if seq_axis is not None:
        sq = jax.lax.psum(sq, seq_axis)
    # clamp: XLA's algebraic simplifier can re-expand the two-pass form back
    # into the cancelling E[x²]−mean² shape under jit, leaving var a tiny
    # negative at large |mean| — rsqrt then emits NaN (observed on the
    # flagship vqvae2's masked inference path; eager was finite, jit NaN)
    var = jnp.maximum(sq / count, 0.0)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(B, T, C)
    out = (xn * scale + bias).astype(x.dtype)
    if mask is not None:
        out = out * mask.astype(out.dtype)
    if glu:
        H = C // 2
        out = jnp.tanh(out[..., :H]) * jax.nn.sigmoid(out[..., H:])
    return out


class GroupNorm(nn.Module):
    """Affine GroupNorm with torch statistics semantics (optionally masked /
    sequence-sharded; ``glu=True`` appends the channel-halves tanh⊙sigmoid
    gate so the norm+gate pair can fuse on TPU — param shapes unchanged)."""
    num_groups: int
    num_channels: int
    eps: float = 1e-5
    seq_axis: Any = None
    glu: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        scale = self.param("scale", nn.initializers.ones, (self.num_channels,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.num_channels,),
                          jnp.float32)
        return group_norm(x, scale, bias, self.num_groups, self.eps, mask,
                          self.seq_axis, glu=self.glu)


def _kaiming_v_init(key, shape, dtype=jnp.float32):
    """Torch-default conv init U(±1/sqrt(fan_in)) for kernels (K, I, O).

    This matches the reference's EFFECTIVE init: its kaiming reset writes to
    the weight-norm-recomputed `.weight` tensor and is overwritten from g/v on
    the next forward (vqvae.py:203-217 — dead code), so the reference trains
    from torch's default uniform init. Kaiming-normal (gain √2) is ~2.4×
    hotter per layer and compounds through the un-normalized res-skip chains
    into ~1e5 activations at init on the deep hierarchical configs — stable
    in fp32 but NaN-prone in bf16.
    """
    fan_in = shape[0] * shape[1]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in):
    """Torch conv bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)). Non-zero
    biases keep ReLU chains from emitting exactly-zero frames at init (which
    the normalized VQ would divide by)."""
    bound = 1.0 / math.sqrt(fan_in)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class WNConv1d(nn.Module):
    """Weight-normalized 1D conv, (B, T, C) -> (B, T', C').

    Param layout: ``v`` (K, in, out) direction, ``g`` magnitude, ``b`` (out,)
    bias. Effective weight ``w = g * v / ||v||``, computed fp32 then cast to
    the compute dtype.

    ``wn_dim`` selects the normalization axis — torch's ``weight_norm``
    normalizes over all dims except dim 0, and dim 0 of a ``Conv1d`` weight is
    the *output* channel while dim 0 of a ``ConvTranspose1d`` weight is the
    *input* channel. Layers that stand in for the reference's stride-1
    transposed convs (decoder up layers, GLU ``conv_in`` — reference
    vae_npvc/model/layers.py:199, vqvae.py:245-265) therefore use
    ``wn_dim='in'``: g is (in,), the norm runs over (K, out), and the scale is
    applied to the *input* channels (equivalent by linearity). Matching the
    axis matters for training dynamics, not just the forward function — the
    projected weight-norm gradient lives in a different subspace per axis
    (measured: tools/lockstep_parity.py).
    """
    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: Any = "SAME_TORCH"   # symmetric torch padding, or explicit (lo, hi)
    use_weight_norm: bool = True
    wn_dim: str = "out"           # 'out' (torch Conv1d) | 'in' (torch ConvT)
    dtype: Dtype = jnp.float32
    seq_axis: Any = None          # mesh axis: time-sharded conv (halo exchange)

    def _wn(self, v):
        """(g param, per-channel scale, which-side flag) for the chosen axis."""
        if self.wn_dim == "in":
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 2)))          # (in,)
            g = self.param("g", lambda _k: norm)
            return g / norm
        norm = jnp.linalg.norm(v.reshape(-1, v.shape[-1]), axis=0)  # (out,)
        g = self.param("g", lambda _k: norm)
        return g / norm

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        if self.seq_axis is not None and k > 1:
            # sequence-parallel: pull the receptive-field halo from the
            # neighbor shards, then convolve VALID (edges see zeros, matching
            # SAME torch padding at the true sequence boundary)
            assert self.stride == 1, "time sharding needs stride-1 convs"
            from ..parallel.halo import halo_exchange
            rf = (k - 1) // 2 * self.dilation
            xh = halo_exchange(x, rf, self.seq_axis)
            v = self.param("v", _kaiming_v_init, (k, in_ch, self.features))
            b = self.param("b", _torch_bias_init(k * in_ch),
                           (self.features,), jnp.float32)
            scale = None
            if self.use_weight_norm:
                # weight norm as channel scaling outside the conv:
                # conv(x, g·v/||v||) == conv(x, v)·(g/||v||) for wn_dim='out',
                # == conv(x·(g/||v||), v) for wn_dim='in' (linearity) — the
                # per-step normalized-kernel rewrite was ~550 us/conv on the
                # v5e (measured, tools/profile_step.py); the channel scale is
                # a fused multiply
                scale = self._wn(v)
                if self.wn_dim == "in":
                    xh = xh * scale.astype(xh.dtype)
                    scale = None
            pet = jnp.float32 if self.dtype == jnp.float32 else None
            y = jax.lax.conv_general_dilated(
                xh.astype(self.dtype), v.astype(self.dtype),
                window_strides=(1,), padding=[(0, 0)],
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=pet)
            if scale is not None:
                y = y * scale.astype(y.dtype)
            return (y + b).astype(self.dtype)
        v = self.param("v", _kaiming_v_init, (k, in_ch, self.features))
        b = self.param("b", _torch_bias_init(k * in_ch), (self.features,),
                       jnp.float32)
        scale = None
        if self.use_weight_norm:
            # weight norm as channel scaling outside the conv (see above):
            # output-side for wn_dim='out', input-side for wn_dim='in'. The
            # normalized-kernel rewrite materialized a full second kernel
            # every step (~550 us/conv on the v5e at flagship sizes,
            # tools/profile_step.py); the channel scale fuses into the conv
            # epilogue instead. Same params, same function of (v, g).
            scale = self._wn(v)
            if self.wn_dim == "in":
                x = x * scale.astype(x.dtype)
                scale = None
        if self.padding == "SAME_TORCH":
            p = (k - 1) // 2 * self.dilation
            pad = [(p, p)]
        else:
            pad = [tuple(self.padding)]
        # preferred_element_type=f32 breaks the conv VJP for bf16 inputs
        # (f32 cotangent vs bf16 primal); bf16 convs already accumulate f32
        # inside the MXU, so only request it on the f32 path
        pet = jnp.float32 if self.dtype == jnp.float32 else None
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), v.astype(self.dtype),
            window_strides=(self.stride,), padding=pad,
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=pet,
        )
        if scale is not None:
            y = y * scale.astype(y.dtype)
        return (y + b).astype(self.dtype)


class WNConvTranspose1d(nn.Module):
    """Weight-normalized strided transposed conv for ×scale upsampling.

    Implements the reference's resampling layer arithmetic exactly
    (kernel 2s / stride s / padding s//2+s%2 / output_padding s%2 → out = T*s)
    via input dilation (``lhs_dilation``), the XLA-native transposed conv.
    """
    features: int
    scale: int
    use_weight_norm: bool = True
    wn_dim: str = "in"   # torch ConvTranspose1d weight_norm dim 0 = input ch
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = self.scale
        k = 2 * s
        in_ch = x.shape[-1]
        v = self.param("v", _kaiming_v_init, (k, in_ch, self.features))
        b = self.param("b", _torch_bias_init(k * in_ch), (self.features,),
                       jnp.float32)
        scale = None
        if self.use_weight_norm:
            # channel-scaled weight norm (see WNConv1d); default 'in' matches
            # torch's ConvTranspose1d weight_norm axis for training dynamics
            if self.wn_dim == "in":
                norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 2)))
                g = self.param("g", lambda _k: norm)
                x = x * (g / norm).astype(x.dtype)
            else:
                norm = jnp.linalg.norm(v.reshape(-1, v.shape[-1]), axis=0)
                g = self.param("g", lambda _k: norm)
                scale = g / norm
        w = v
        p_torch = s // 2 + s % 2
        out_pad = s % 2
        lo = k - 1 - p_torch
        hi = k - 1 - p_torch + out_pad
        # transposed conv = conv with input dilation and flipped kernel
        pet = jnp.float32 if self.dtype == jnp.float32 else None
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), jnp.flip(w, 0).astype(self.dtype),
            window_strides=(1,), padding=[(lo, hi)],
            lhs_dilation=(s,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=pet,
        )
        if scale is not None:
            y = y * scale.astype(y.dtype)
        return (y + b).astype(self.dtype)


class ConvResStack(nn.Module):
    """LReLU→dilated conv→GN (× layers) + 1×1 skip.

    Reference behavior: Conv1d_Layernorm_LRelu_Residual
    (vae_npvc/model/layers.py:129-178): first conv carries the dilation, later
    convs are undilated; GroupNorm(1, C) after each conv; out = stack(x) + skip(x).
    """
    channels: int
    kernel_size: int = 3
    layers: int = 2
    dilation: int = 1
    use_weight_norm: bool = True
    dtype: Dtype = jnp.float32
    seq_axis: Any = None

    @nn.compact
    def __call__(self, x, mask=None):
        h = x
        for i in range(self.layers):
            h = nn.leaky_relu(h, 0.2)
            h = WNConv1d(self.channels, self.kernel_size,
                         dilation=self.dilation if i == 0 else 1,
                         use_weight_norm=self.use_weight_norm,
                         dtype=self.dtype, seq_axis=self.seq_axis,
                         name=f"conv_{i}")(h)
            h = GroupNorm(1, self.channels, seq_axis=self.seq_axis,
                          name=f"norm_{i}")(h, mask)
        skip = WNConv1d(self.channels, 1, use_weight_norm=self.use_weight_norm,
                        dtype=self.dtype, name="skip")(x)
        out = h + skip
        if mask is not None:
            out = out * mask.astype(out.dtype)
        return out


class GLUResSkip(nn.Module):
    """Dilated conv → +1×1(cond) → GN(2) → tanh⊙sigmoid GLU → 1×1 res+skip.

    Reference behavior: DeConv1d_Layernorm_GLU_ResSkip
    (vae_npvc/model/layers.py:181-249). Returns ``(x + res, skip)``. The
    reference's stride-1 ConvTranspose1d here is a flipped-kernel conv; we use a
    forward conv (same function class, learned kernels). The condition ``c`` is
    (B, 1, cond_ch) or (B, T, cond_ch) and is projected then broadcast over time.
    """
    channels: int
    cond_channels: int
    skip_channels: int
    kernel_size: int = 3
    dilation: int = 1
    use_weight_norm: bool = True
    dtype: Dtype = jnp.float32
    seq_axis: Any = None

    @nn.compact
    def __call__(self, x, c, mask=None):
        C = self.channels
        # the reference's conv_in is a stride-1 ConvTranspose1d
        # (layers.py:199) — weight-normed over the input-channel axis
        h = WNConv1d(2 * C, self.kernel_size, dilation=self.dilation,
                     use_weight_norm=self.use_weight_norm, wn_dim="in",
                     dtype=self.dtype,
                     seq_axis=self.seq_axis, name="conv_in")(x)
        if self.cond_channels and self.cond_channels > 0:
            hc = WNConv1d(2 * C, 1, use_weight_norm=self.use_weight_norm,
                          dtype=self.dtype, name="conv_cond")(c)
            h = h + hc  # broadcasts (B, 1, 2C) over time
        # norm + gate in one module so the pair fuses on TPU
        # (ops/groupnorm_pallas.py); params still live under "norm"
        h = GroupNorm(2, 2 * C, seq_axis=self.seq_axis, glu=True,
                      name="norm")(h, mask)
        rs = WNConv1d(C + self.skip_channels, 1,
                      use_weight_norm=self.use_weight_norm, dtype=self.dtype,
                      name="res_skip")(h)
        if mask is not None:
            rs = rs * mask.astype(rs.dtype)
        return x + rs[..., :C], rs[..., C:]


class ConvLReLU(nn.Module):
    """Conv1d → GroupNorm(1) → LeakyReLU(0.02) (reference:
    vae_npvc/model/layers.py:63-95 Conv1d_Layernorm_LRelu — shipped configs
    don't use it, provided for inventory parity)."""
    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = WNConv1d(self.features, self.kernel_size, stride=self.stride,
                     dilation=self.dilation, use_weight_norm=False,
                     dtype=self.dtype, name="conv")(x)
        h = GroupNorm(1, self.features, name="norm")(h, mask)
        return nn.leaky_relu(h, 0.02)


class DeConvGLU(nn.Module):
    """Conv → GroupNorm(2) → tanh⊙sigmoid GLU (reference: layers.py:98-126
    DeConv1d_Layernorm_GLU — the non-res-skip variant, unused by shipped
    configs, provided for inventory parity)."""
    features: int
    kernel_size: int
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = WNConv1d(2 * self.features, self.kernel_size,
                     dilation=self.dilation, use_weight_norm=False,
                     dtype=self.dtype, name="deconv")(x)
        return GroupNorm(2, 2 * self.features, glu=True,
                         name="norm")(h, mask)


class Conditions(nn.Module):
    """Speaker/condition embedding table (reference: layers.py:12-60).

    ``normalize=True`` renormalizes rows to unit L2 norm at lookup time (the
    functional analog of the reference's in-place ``embed_norm``).
    """
    num: int
    dim: int
    normalize: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, idx):
        table = self.param("embedding", nn.initializers.normal(1.0),
                           (self.num, self.dim), jnp.float32)
        if self.normalize:
            table = table / jnp.linalg.norm(table, axis=1, keepdims=True)
        return jnp.take(table, idx, axis=0).astype(self.dtype)

    @staticmethod
    def sparsity(table):
        """Diagonal-CE embedding sparsity regularizer (layers.py:56-60)."""
        from ..ops.vq import sparsity_loss
        return sparsity_loss(table)
