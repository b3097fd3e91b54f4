"""Fused attention kernel vs the stock XLA path (interpret mode on CPU).

Forward and backward (custom flash VJP) must match
``softmax((q kᵀ)·scale + key-padding mask) v`` and its gradients exactly up
to fp32 accumulation order, including ragged lengths and non-128 head dims.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_npvc_tpu.ops.attention_pallas import (fused_attention,
                                               reference_attention)


def _rand(shape, seed, dtype=np.float32):
    return jnp.asarray(np.random.default_rng(seed).normal(
        size=shape).astype(dtype))


@pytest.mark.parametrize("B,H,T,d", [(2, 2, 64, 32), (1, 4, 100, 96),
                                     (3, 1, 257, 48)])
def test_forward_parity(B, H, T, d):
    q, k, v = (_rand((B, H, T, d), s) for s in (0, 1, 2))
    lengths = jnp.asarray(
        np.random.default_rng(3).integers(1, T + 1, size=(B,)), jnp.int32)
    got = fused_attention(q, k, v, lengths, tile_q=128, interpret=True)
    want = reference_attention(q, k, v, lengths)
    # padded-key columns are excluded in both; compare everything
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_forward_no_lengths():
    q, k, v = (_rand((2, 2, 128, 64), s) for s in (4, 5, 6))
    got = fused_attention(q, k, v, None, tile_q=128, interpret=True)
    want = reference_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradient_parity():
    B, H, T, d = 2, 2, 96, 32
    q, k, v = (_rand((B, H, T, d), s) for s in (7, 8, 9))
    lengths = jnp.asarray([50, 96], jnp.int32)
    # loss reads only valid query rows (the framework contract: padded rows
    # are masked downstream, so their cotangent is zero)
    qmask = (jnp.arange(T)[None, None, :, None]
             < lengths[:, None, None, None]).astype(jnp.float32)
    w = _rand((B, H, T, d), 10)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, lengths, tile_q=128,
                                       interpret=True) * w * qmask)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v, lengths) * w * qmask)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5,
                                   err_msg=f"d{name}")


def test_bf16_inputs_fp32_math():
    q, k, v = (_rand((1, 2, 64, 32), s).astype(jnp.bfloat16)
               for s in (11, 12, 13))
    got = fused_attention(q, k, v, None, tile_q=128, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = reference_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                               v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


def test_bf16_gradient_parity():
    """bf16 operands: the round-4 dtype policy keeps accumulations fp32 —
    gradients must track the fp32 oracle within bf16 rounding."""
    B, H, T, d = 2, 2, 64, 32
    q, k, v = (_rand((B, H, T, d), s).astype(jnp.bfloat16)
               for s in (30, 31, 32))
    lengths = jnp.asarray([40, 64], jnp.int32)
    w = _rand((B, H, T, d), 33)
    qmask = (jnp.arange(T)[None, None, :, None]
             < lengths[:, None, None, None]).astype(jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, lengths, tile_q=128,
                                       interpret=True)
                       .astype(jnp.float32) * w * qmask)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), lengths) * w * qmask)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        *(a.astype(jnp.float32) for a in (q, k, v)))
    for a, b, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b), rtol=5e-2, atol=5e-2,
                                   err_msg=f"d{name}")


def test_extreme_scale_stays_finite():
    """The GST-class hazard: huge-but-finite scores must not NaN."""
    q = _rand((1, 1, 128, 32), 14) * 1e16
    k, v = _rand((1, 1, 128, 32), 15), _rand((1, 1, 128, 32), 16)
    out = fused_attention(q, k, v, None, tile_q=128, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_transformer_block_fused_matches_stock():
    """The real TransformerBlock with the fused (interpret) core must equal
    the stock XLA attention path on valid positions."""
    import flax

    from vae_npvc_tpu.models.token_tts import TransformerBlock
    from vae_npvc_tpu.nn.blocks import length_mask

    B, T, D = 2, 64, 32
    x = _rand((B, T, D), 20)
    lengths = jnp.asarray([40, 64], jnp.int32)
    mask = length_mask(lengths, T)
    x = x * mask

    stock = TransformerBlock(D, 2, 64, fused_attention="never")
    fused = TransformerBlock(D, 2, 64, fused_attention="interpret")
    variables = stock.init(jax.random.PRNGKey(0), x, mask)
    a = np.asarray(stock.apply(variables, x, mask))
    b = np.asarray(fused.apply(variables, x, mask))
    np.testing.assert_allclose(b * np.asarray(mask), a * np.asarray(mask),
                               rtol=3e-5, atol=3e-5)


def test_transformer_block_fused_grads_match():
    from vae_npvc_tpu.models.token_tts import TransformerBlock
    from vae_npvc_tpu.nn.blocks import length_mask

    B, T, D = 2, 64, 32
    x = _rand((B, T, D), 21)
    lengths = jnp.asarray([40, 64], jnp.int32)
    mask = length_mask(lengths, T)
    x = x * mask

    stock = TransformerBlock(D, 2, 64, fused_attention="never")
    fused = TransformerBlock(D, 2, 64, fused_attention="interpret")
    variables = stock.init(jax.random.PRNGKey(0), x, mask)

    def loss(v, mod):
        return jnp.sum(jnp.square(mod.apply(v, x, mask) * mask))

    ga = jax.grad(loss)(variables, stock)
    gb = jax.grad(loss)(variables, fused)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
