"""Fused GroupNorm(+GLU) kernel vs the stock XLA path (interpret mode on CPU).

The kernel must reproduce nn/blocks.py ``group_norm`` — fp32 two-pass
moments, affine, cast-to-compute-dtype, optional tanh⊙sigmoid channel gate —
and its gradients (analytic custom VJP vs autodiff of the stock path).
On CPU the module path always takes the stock lowering (compiled_ok gates on
a TPU backend), so these tests drive the kernel explicitly via interpret=True.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_npvc_tpu.nn.blocks import GroupNorm, group_norm
from vae_npvc_tpu.ops import groupnorm_pallas as gnp


def _rand(shape, seed, dtype=np.float32, scale=1.0):
    return jnp.asarray((np.random.default_rng(seed).normal(size=shape)
                        * scale).astype(dtype))


def _params(C, seed):
    rng = np.random.default_rng(seed)
    scale = jnp.asarray(rng.normal(1.0, 0.3, size=(C,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0.0, 0.2, size=(C,)).astype(np.float32))
    return scale, bias


@pytest.mark.parametrize("G,glu", [(1, False), (2, False), (2, True),
                                   (4, False)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_parity(G, glu, dtype):
    B, T, C = 3, 32, 128 * max(G, 2)
    x = _rand((B, T, C), seed=G * 10 + glu, scale=3.0).astype(dtype)
    scale, bias = _params(C, seed=99)
    got = gnp.fused_group_norm(x, scale, bias, G, glu=glu, interpret=True)
    want = group_norm(x, scale, bias, G, glu=glu)
    assert got.dtype == want.dtype and got.shape == want.shape
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-4
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


def test_forward_large_offset():
    """Large per-group mean (the cancellation regime the stock two-pass is
    guarded for, nn/blocks.py:81-103) — kernel uses the same two-pass."""
    B, T, C = 2, 16, 256
    x = _rand((B, T, C), seed=5) + 6e4
    scale, bias = _params(C, seed=7)
    got = gnp.fused_group_norm(x, scale, bias, 2, glu=True, interpret=True)
    want = group_norm(x, scale, bias, 2, glu=True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("G,glu", [(1, False), (2, True)])
def test_gradient_parity(G, glu):
    B, T, C = 2, 32, 256
    x = _rand((B, T, C), seed=1, scale=2.0)
    scale, bias = _params(C, seed=2)
    w = _rand((B, T, C // 2 if glu else C), seed=3)

    def loss_fused(x, s, b):
        return jnp.sum(gnp.fused_group_norm(x, s, b, G, glu=glu,
                                            interpret=True) * w)

    def loss_stock(x, s, b):
        return jnp.sum(group_norm(x, s, b, G, glu=glu) * w)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gs = jax.grad(loss_stock, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(gf, gs, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_gradient_parity_bf16_input():
    """bf16 activations (the training compute dtype): dx comes back bf16 and
    matches autodiff of the stock path at bf16 resolution."""
    B, T, C = 2, 16, 256
    x = _rand((B, T, C), seed=11).astype(jnp.bfloat16)
    scale, bias = _params(C, seed=12)
    w = _rand((B, T, C // 2), seed=13)

    def f(fn):
        def loss(x, s, b):
            return jnp.sum(fn(x, s, b).astype(jnp.float32) * w)
        return jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias)

    gf = f(lambda x, s, b: gnp.fused_group_norm(x, s, b, 2, glu=True,
                                                interpret=True))
    gs = f(lambda x, s, b: group_norm(x, s, b, 2, glu=True))
    assert gf[0].dtype == jnp.bfloat16
    for a, b_, name in zip(gf, gs, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=5e-2, atol=5e-2, err_msg=name)


def test_wants_gating():
    ok = (4, 128, 1024)
    # default-off: the on-chip A/B measured the kernel slower than the stock
    # XLA lowering (module docstring), so it must be opted into
    assert not gnp.wants(ok, 2, True)
    gnp.set_enabled(True)
    try:
        assert gnp.wants(ok, 2, True)
        assert gnp.wants(ok, 1, False)
        assert not gnp.wants(ok, 1, True)      # GLU needs the 2-group layout
        assert not gnp.wants((4, 100, 1024), 2, True)  # T not sublane-aligned
        assert not gnp.wants((4, 128, 80), 1, False)   # lane-fragment groups
        assert not gnp.wants((4, 2048, 1024), 2, True)  # over the VMEM budget
        assert not gnp.wants((4, 128), 1, False)        # rank
        gnp.set_enabled(False)
        assert not gnp.wants(ok, 2, True)
    finally:
        gnp.set_enabled(None)


def test_sharded_batch_parity():
    """Batch-sharded fused GN under shard_map on the 8-device mesh (the
    multi-chip integration pattern, same as the sharded VQ-kernel leg in
    __graft_entry__.dryrun_multichip): per-shard stats are exact because
    GroupNorm statistics never cross batch rows."""
    from jax.sharding import PartitionSpec as P

    from vae_npvc_tpu.parallel.mesh import data_mesh

    mesh = data_mesh()
    n = mesh.shape["data"]
    B, T, C = 2 * n, 16, 256
    x = _rand((B, T, C), seed=31, scale=2.0)
    scale, bias = _params(C, seed=32)

    fn = jax.jit(jax.shard_map(
        lambda x: gnp.fused_group_norm(x, scale, bias, 2, glu=True,
                                       interpret=True),
        mesh=mesh, in_specs=P("data"), out_specs=P("data"),
        check_vma=False))
    got = fn(x)
    want = group_norm(x, scale, bias, 2, glu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_module_glu_refactor_equivalence():
    """GroupNorm(glu=True) == GroupNorm + explicit gate (the pre-refactor
    GLUResSkip/DeConvGLU composition), including the masked path."""
    B, T, C = 2, 24, 64
    x = _rand((B, T, 2 * C), seed=21)
    lengths = jnp.asarray([24, 11], jnp.int32)
    from vae_npvc_tpu.nn.blocks import length_mask
    mask = length_mask(lengths, T)
    m_glu = GroupNorm(2, 2 * C, glu=True)
    m_plain = GroupNorm(2, 2 * C)
    params = m_plain.init(jax.random.PRNGKey(0), x)
    for mk in (None, mask):
        got = m_glu.apply(params, x, mk)
        h = m_plain.apply(params, x, mk)
        want = jnp.tanh(h[..., :C]) * jax.nn.sigmoid(h[..., C:])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=0)
