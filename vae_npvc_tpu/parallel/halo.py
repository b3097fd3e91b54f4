"""Time-axis (sequence) sharding with halo exchange for conv stacks.

The reference caps sequence length by cropping to 256 frames and runs
inference single-device (SURVEY.md §5 "long-context: absent by design"). This
module is the TPU sequence-scaling primitive it lacks: shard the time axis of
a (B, T, D) utterance across the mesh, exchange ``halo`` boundary frames with
neighbors over ICI (``ppermute``), run the local conv stack, and crop — the
result is numerically identical to the unsharded computation as long as

- the stack's receptive-field half-width ≤ ``halo``; and
- any normalization inside reduces over time with the mesh axis accounted
  for (use :func:`psum_group_norm` as the stack's norm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def halo_exchange(x, halo, axis_name):
    """(B, T_local, D) → (B, halo + T_local + halo, D) with neighbor frames.

    Edge shards receive zeros (matching SAME zero padding at the true
    boundary).
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    left_send = [(i, (i + 1) % n) for i in range(n)]    # send right edge →
    right_send = [(i, (i - 1) % n) for i in range(n)]   # send left edge ←

    right_edge = x[:, -halo:, :]
    left_edge = x[:, :halo, :]
    from_left = jax.lax.ppermute(right_edge, axis_name, left_send)
    from_right = jax.lax.ppermute(left_edge, axis_name, right_send)
    from_left = jnp.where(idx == 0, 0.0, from_left)
    from_right = jnp.where(idx == n - 1, 0.0, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=1)


def receptive_halo(kernel_size, dilations):
    """Half-width of a stride-1 conv stack's receptive field."""
    return sum((kernel_size - 1) // 2 * d for d in dilations)


def psum_group_norm(x, scale, bias, num_groups, axis_name, valid_mask=None,
                    eps=1e-5):
    """GroupNorm whose statistics span the full (sharded) time axis.

    ``x`` is the local shard (B, T_local, C); statistics are psum-ed over
    ``axis_name`` so the result matches the unsharded norm. ``valid_mask``
    (B, T_local, 1) excludes halo/pad frames from the statistics.
    """
    B, T, C = x.shape
    G = num_groups
    xf = x.astype(jnp.float32).reshape(B, T, G, C // G)
    if valid_mask is None:
        m = jnp.ones((B, T, 1, 1), jnp.float32)
    else:
        m = valid_mask.astype(jnp.float32)[:, :, :, None]
    count = jax.lax.psum(jnp.sum(m, axis=1, keepdims=True), axis_name) \
        * (C // G)
    total = jax.lax.psum(jnp.sum(xf * m, axis=(1, 3), keepdims=True),
                         axis_name)
    mean = total / count
    var = jax.lax.psum(jnp.sum(jnp.square(xf - mean) * m, axis=(1, 3),
                               keepdims=True), axis_name) / count
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xn.reshape(B, T, C) * scale + bias).astype(x.dtype)


def sharded_conv1d(x, w, b, halo, axis_name, dilation=1):
    """SAME stride-1 conv over a time-sharded (B, T_local, D) input.

    ``halo`` must be ≥ the conv's half receptive field ((k-1)//2 * dilation).
    """
    rf_half = (w.shape[0] - 1) // 2 * dilation
    assert halo >= rf_half, (
        f"halo {halo} < conv half receptive field {rf_half} "
        f"(kernel {w.shape[0]}, dilation {dilation}) — the crop below would "
        "silently return wrong frames")
    assert halo <= x.shape[1], (
        f"halo {halo} > local shard length {x.shape[1]} — neighbors don't "
        "hold enough frames for one exchange")
    xh = halo_exchange(x, halo, axis_name)
    y = jax.lax.conv_general_dilated(
        xh, w, window_strides=(1,), padding=[(0, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32)
    # output of VALID conv on the haloed input: length halo*2 + T - rf*2 ...
    # crop back to the local shard's frames
    start = halo - rf_half
    y = y[:, start:start + x.shape[1], :]
    return y + b
