"""Flat speaker-conditioned VQ-VAE (the workhorse model).

TPU-native re-design of the reference model (reference: vae_npvc/model/vqvae.py
— Model/Encoder/Decoder). Same architecture config keys as the reference YAMLs
(top-level ``z_num/z_dim/y_num/y_dim/use_ema/beta/mu/jitter_p`` plus
``encoder``/``decoder`` sub-dicts), same loss-detail key names
(``Total``/``VQ loss``/``X like`` + VQ health metrics), but:

- channels-last ``(B, T, D)`` layout, bf16-capable compute path;
- the EMA codebook is a flax variable collection (``ema``) updated functionally
  inside the train step (mutable apply), not a torch buffer;
- jitter is a single vectorized gather (ops/jitter.py), not a Python loop;
- ``encode``/``decode``/``infer`` are apply-method entry points jittable at
  fixed shapes.

Loss contract (vqvae.py:80-88): ``loss = X_like + z_qut + beta * z_enc`` where
``X_like`` is the frame-mean unit-variance Gaussian NLL. The detail dict values
are jnp scalars (callers host-transfer them for logging).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import (Conditions, ConvResStack, GLUResSkip, WNConv1d,
                         WNConvTranspose1d, length_mask)
from ..ops import vq as vq_ops
from ..ops.jitter import jitter as jitter_op
from ..ops.losses import log_loss


class Encoder(nn.Module):
    """Strided conv encoder: per scale [conv → res-stack×n → LReLU], final 1×1.

    Reference behavior: vqvae.py:122-217. Downsampling convs use kernel 2s /
    stride s / padding s//2+s%2; stride-1 convs use ``kernel_size`` with
    symmetric padding.
    """
    arch: Mapping[str, Any]
    dtype: Any = jnp.float32
    return_hidden: bool = False   # also return the pre-projection features
                                  # (vqvae2 feeds them to the next level,
                                  # reference vqvae2.py:238-246)
    seq_axis: Any = None          # time-sharded (sequence-parallel) mode

    @staticmethod
    def out_lengths(arch, lengths):
        """Frame-count transform of the encoder (torch conv length formula).

        Clamped to >=1 per downsampling step: a very short utterance that a
        deep hierarchy would shrink to 0 frames keeps one frame (computed
        from the masked real content plus zero padding) instead of an empty
        level — torch would hard-crash there (Conv1d input smaller than the
        kernel), which is not a behavior worth matching.
        """
        for ds in arch.get("downsample_scales",
                           [1] * len(arch.get("in_channels", [1]))):
            if ds != 1:
                p = ds // 2 + ds % 2
                lengths = (lengths + 2 * p - 2 * ds) // ds + 1
                lengths = jnp.maximum(lengths, 1)
        return lengths

    @staticmethod
    def min_input_frames(archs):
        """Smallest T whose padded time stays >=1 through every level of
        ``archs`` (a sequence of chained encoder arch dicts). The bucketed
        conversion path pads short utterances up to this."""
        t = 1
        for arch in reversed(list(archs)):
            for ds in reversed(arch.get(
                    "downsample_scales",
                    [1] * len(arch.get("in_channels", [1])))):
                if ds != 1:
                    p = ds // 2 + ds % 2
                    # smallest T with (T + 2p - 2ds)//ds + 1 >= t
                    t = (t - 1) * ds + 2 * ds - 2 * p
        return t

    @nn.compact
    def __call__(self, x, lengths=None):
        a = dict(self.arch)
        in_channels = a.get("in_channels", [513, 1024, 512, 256])
        out_channels = a.get("out_channels", [1024, 512, 256, 128])
        downsample_scales = a.get("downsample_scales", [1] * len(in_channels))
        kernel_size = a.get("kernel_size", 3)
        z_channels = a.get("z_channels", 128)
        dilation = a.get("dilation", True)
        stack_kernel_size = a.get("stack_kernel_size", 3)
        stack_layers = a.get("stack_layers", 2)
        stacks = a.get("stacks", [3] * len(in_channels))
        use_wn = a.get("use_weight_norm", True)

        h = x
        mask = None
        if lengths is not None:
            mask = length_mask(lengths, h.shape[1])
            h = h * mask.astype(h.dtype)
        for i, (out_ch, ds, n_stack) in enumerate(
                zip(out_channels, downsample_scales, stacks)):
            if ds == 1:
                h = WNConv1d(out_ch, kernel_size, use_weight_norm=use_wn,
                             dtype=self.dtype, seq_axis=self.seq_axis,
                             name=f"conv_{i}")(h)
            else:
                assert self.seq_axis is None,                     "time sharding supports stride-1 encoders only"
                p = ds // 2 + ds % 2
                h = WNConv1d(out_ch, 2 * ds, stride=ds, padding=(p, p),
                             use_weight_norm=use_wn, dtype=self.dtype,
                             name=f"conv_{i}")(h)
                if h.shape[1] == 0:
                    raise ValueError(
                        f"input too short for this encoder's x{ds} "
                        f"downsampling (0 frames after conv_{i}); pad the "
                        "input to >= Encoder.min_input_frames(...) frames — "
                        "the bucketed conversion path does this "
                        "automatically. (torch would crash here too: Conv1d "
                        "input smaller than its kernel)")
                if lengths is not None:
                    lengths = jnp.maximum(
                        (lengths + 2 * p - 2 * ds) // ds + 1, 1)
                    mask = length_mask(lengths, h.shape[1])
            if mask is not None:
                h = h * mask.astype(h.dtype)
            for j in range(n_stack):
                h = ConvResStack(out_ch, stack_kernel_size, stack_layers,
                                 dilation=2 ** j if dilation else 1,
                                 use_weight_norm=use_wn, dtype=self.dtype,
                                 seq_axis=self.seq_axis,
                                 name=f"stack_{i}_{j}")(h, mask)
            h = nn.leaky_relu(h, 0.2)
        hidden = h
        h = WNConv1d(z_channels, 1, use_weight_norm=use_wn,
                     dtype=self.dtype, name="proj")(h)
        if mask is not None:
            h = h * mask.astype(h.dtype)
        if self.return_hidden:
            return h, hidden
        return h


class Decoder(nn.Module):
    """Upsampling decoder with speaker-conditioned GLU res-skip stacks.

    Reference behavior: vqvae.py:220-343. All skip outputs are summed and
    scaled by sqrt(1/total_layers) where total_layers counts resampling AND
    res-skip layers (vqvae.py:305-315), then a ReLU/1×1/ReLU/1×1 head.
    """
    arch: Mapping[str, Any]
    dtype: Any = jnp.float32
    seq_axis: Any = None

    @staticmethod
    def out_lengths(arch, lengths):
        """Frame-count transform of the decoder (ConvT doubles etc.)."""
        for us in arch.get("upsample_scales",
                           [1] * len(arch.get("in_channels", [1]))):
            if us != 1:
                lengths = lengths * us
        return lengths

    @nn.compact
    def __call__(self, z, c, lengths=None):
        a = dict(self.arch)
        in_channels = a.get("in_channels", [128, 256, 512, 1024])
        out_channels = a.get("out_channels", [256, 512, 1024, 513])
        upsample_scales = a.get("upsample_scales", [1] * len(in_channels))
        cond_channels = a.get("cond_channels", 128)
        skip_channels = a.get("skip_channels", 80)
        final_channels = a.get("final_channels", 80)
        kernel_size = a.get("kernel_size", 5)
        dilation = a.get("dilation", True)
        stack_kernel_size = a.get("stack_kernel_size", 3)
        stacks = a.get("stacks", [3] * len(in_channels))
        use_wn = a.get("use_weight_norm", True)

        total_layers = len(in_channels) + sum(stacks)
        h = z
        mask = None
        if lengths is not None:
            mask = length_mask(lengths, h.shape[1])
            h = h * mask.astype(h.dtype)
        skip_sum = 0.0
        for i, (out_ch, us, n_stack) in enumerate(
                zip(out_channels, upsample_scales, stacks)):
            if us == 1:
                # reference up layers are ConvTranspose1d even at stride 1
                # (vqvae.py:245-265) — weight-normed over the input axis
                h = WNConv1d(out_ch, kernel_size, use_weight_norm=use_wn,
                             wn_dim="in",
                             dtype=self.dtype, seq_axis=self.seq_axis,
                             name=f"up_{i}")(h)
            else:
                assert self.seq_axis is None,                     "time sharding supports stride-1 decoders only"
                h = WNConvTranspose1d(out_ch, us, use_weight_norm=use_wn,
                                      dtype=self.dtype, name=f"up_{i}")(h)
                if lengths is not None:
                    lengths = lengths * us
                    mask = length_mask(lengths, h.shape[1])
            if mask is not None:
                h = h * mask.astype(h.dtype)
            for j in range(n_stack):
                h, skip = GLUResSkip(out_ch, cond_channels, skip_channels,
                                     stack_kernel_size,
                                     dilation=2 ** j if dilation else 1,
                                     use_weight_norm=use_wn, dtype=self.dtype,
                                     seq_axis=self.seq_axis,
                                     name=f"stack_{i}_{j}")(h, c, mask)
                skip_sum = skip_sum + skip
        h = skip_sum * (1.0 / total_layers) ** 0.5
        h = nn.relu(h)
        h = WNConv1d(skip_channels, 1, use_weight_norm=use_wn,
                     dtype=self.dtype, name="final_0")(h)
        h = nn.relu(h)
        h = WNConv1d(final_channels, 1, use_weight_norm=use_wn,
                     dtype=self.dtype, name="final_1")(h)
        if mask is not None:
            h = h * mask.astype(h.dtype)
        return h


class Model(nn.Module):
    """Flat VQ-VAE with speaker conditioning.

    ``arch`` is the flat reference config dict (the full experiment YAML works:
    model keys are read from the top level, vqvae.py:18-42).

    Entry points (use ``method=``):
      __call__(x, y_idx, train)  -> (xhat, loss, detail)   # training forward
      encode(x)                  -> (B, T') int32 ids
      decode(ids, y_idx)         -> (B, T, D) mel
      infer(x, y_idx)            -> (B, T, D) mel

    The EMA codebook lives in the ``ema`` variable collection; training applies
    must pass ``mutable=['ema']`` and an ``rngs={'vq': ...}`` stream (used for
    lazy init / dead-code restarts and jitter).
    """
    arch: Mapping[str, Any]
    dtype: Any = jnp.float32
    legacy_no_ste: bool = False   # reproduce the reference's missing-STE bug

    def setup(self):
        a = dict(self.arch)
        # config key overrides the dataclass default (YAML-driven parity runs)
        self._legacy_no_ste = a.get("legacy_no_ste", self.legacy_no_ste)
        seq_axis = a.get("seq_axis", None)
        # rematerialization: recompute encoder/decoder activations in the
        # backward pass, trading FLOPs for HBM (config key: remat)
        Enc, Dec = Encoder, Decoder
        if a.get("remat", False):
            Enc = nn.remat(Encoder, static_argnums=())
            Dec = nn.remat(Decoder, static_argnums=())
        self.encoder = Enc(a.get("encoder", {}), dtype=self.dtype,
                           seq_axis=seq_axis)
        self.decoder = Dec(a.get("decoder", {}), dtype=self.dtype,
                           seq_axis=seq_axis)
        self.embeds = Conditions(a.get("y_num", 10), a.get("y_dim", 128),
                                 normalize=False, dtype=self.dtype)
        self.use_ema = a.get("use_ema", False)
        self.z_num = a.get("z_num", 512)
        self.z_dim = a.get("z_dim", 128)
        self.mu = a.get("mu", 0.9)
        self.embed_norm = a.get("embed_norm", True)
        self.beta = a.get("beta", 0.01)
        self.jitter_p = a.get("jitter_p", 0.0)
        # fused Pallas VQ kernel (TPU only; "auto" enables iff backend is tpu)
        up = a.get("use_pallas_vq", "auto")
        if up == "auto":
            from ..ops import vq_pallas
            up = vq_pallas.available()
        self.use_pallas_vq = bool(up)
        # explicit shard_map DP: psum the EMA statistics over this axis
        self.dp_axis = a.get("dp_axis", None)
        if self.use_ema:
            self.ema_state = self.variable(
                "ema", "quantizer",
                lambda: vq_ops.ema_vq_init(self.z_num, self.z_dim))
        else:
            self.vq_emb = self.param(
                "quantizer_embedding",
                nn.initializers.normal(1.0), (self.z_num, self.z_dim),
                jnp.float32)

    def _quantize_train(self, z, train):
        """Returns (z_vq, z_qut_loss, z_enc_loss, detail)."""
        z = z.astype(jnp.float32)
        if self.use_ema:
            rng = (self.make_rng("vq") if train
                   else jax.random.PRNGKey(0))
            z_vq, qut, enc, new_state, detail = vq_ops.ema_vq_forward(
                self.ema_state.value, z, rng, mu=self.mu,
                reduction="frame_mean", training=train, update=train,
                legacy_no_ste=self._legacy_no_ste,
                use_pallas=self.use_pallas_vq, axis_name=self.dp_axis)
            if train and not self.is_initializing():
                self.ema_state.value = new_state
            return z_vq, qut, enc, detail
        return vq_ops.vq_forward(self.vq_emb, z, normalize=self.embed_norm,
                                 reduction="frame_mean")

    def __call__(self, x, y_idx, train: bool = True):
        """Training/valid forward. x: (B, T, D) mel; y_idx: (B,) int."""
        y = self.embeds(y_idx.reshape(-1))[:, None, :]      # (B, 1, y_dim)
        z = self.encoder(x.astype(self.dtype))
        z_vq, z_qut_loss, z_enc_loss, vq_detail = self._quantize_train(z, train)
        if train and self.jitter_p > 0.0:
            z_vq = jitter_op(self.make_rng("vq"), z_vq, self.jitter_p)
        xhat = self.decoder(z_vq.astype(self.dtype), y)
        xhat = xhat.astype(jnp.float32)
        x_loss = log_loss(xhat, x.astype(jnp.float32))
        loss = x_loss + z_qut_loss + self.beta * z_enc_loss
        detail = {"Total": loss, "VQ loss": z_enc_loss, "X like": x_loss}
        detail.update(vq_detail)
        return xhat, loss, detail

    def encode(self, x, lengths=None):
        """Mel (B, T, D) -> code ids (B, T'). With ``lengths``, zero-padded
        batches give results identical to unpadded per-utterance runs (ids
        beyond the transformed length are garbage; truncate with
        ``Encoder.out_lengths``)."""
        z = self.encoder(x.astype(self.dtype), lengths).astype(jnp.float32)
        if self.use_ema:
            return vq_ops.ema_vq_encode(self.ema_state.value, z)
        return vq_ops.vq_encode(self.vq_emb, z, normalize=self.embed_norm)

    def decode(self, z_idx, y_idx, lengths=None):
        """Code ids (B, T') + speaker ids -> mel. ``y_idx`` may be (B,) or the
        reference's multi-target (B, K) — the flat model uses the first target
        (reference decoder keeps only c[:,:,:1], vqvae.py:306)."""
        y_idx = y_idx.reshape(y_idx.shape[0], -1)[:, 0]
        y = self.embeds(y_idx)[:, None, :]
        if self.use_ema:
            z_vq = vq_ops.ema_vq_decode(self.ema_state.value, z_idx)
        else:
            z_vq = vq_ops.vq_decode(self.vq_emb, z_idx,
                                    normalize=self.embed_norm)
        out = self.decoder(z_vq.astype(self.dtype), y, lengths)
        return out.astype(jnp.float32)

    def infer(self, x, y_idx, lengths=None):
        z_lengths = (Encoder.out_lengths(dict(self.arch).get("encoder", {}),
                     lengths) if lengths is not None else None)
        return self.decode(self.encode(x, lengths), y_idx, z_lengths)
