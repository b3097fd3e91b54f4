"""Fused Pallas VQ kernel vs numpy oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_npvc_tpu.ops import vq as vq_ops
from vae_npvc_tpu.ops.vq_pallas import vq_fused


def oracle(z, emb):
    d = ((z ** 2).sum(1, keepdims=True) + (emb ** 2).sum(1)
         - 2 * z @ emb.T)
    idx = d.argmin(1)
    oh = np.eye(emb.shape[0])[idx]
    return idx, emb[idx], oh.T @ z, oh.sum(0)


class TestVqFused:
    @pytest.mark.parametrize("N", [256, 700])  # exact tile and ragged
    def test_matches_oracle(self, N):
        rng = np.random.default_rng(0)
        D, K = 16, 32
        z = rng.normal(size=(N, D)).astype(np.float32)
        emb = rng.normal(size=(K, D)).astype(np.float32)
        idx, zq, bsum, bcnt = vq_fused(jnp.asarray(z), jnp.asarray(emb),
                                       tile_n=256, interpret=True)
        eidx, ezq, esum, ecnt = oracle(z, emb)
        np.testing.assert_array_equal(np.asarray(idx), eidx)
        np.testing.assert_allclose(np.asarray(zq), ezq, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(bsum), esum, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(bcnt), ecnt, rtol=1e-6)

    def test_ema_forward_paths_agree(self, monkeypatch):
        import vae_npvc_tpu.ops.vq_pallas as vp
        orig = vp.vq_fused
        monkeypatch.setattr(vp, "vq_fused",
                            lambda z, e, **kw: orig(z, e, interpret=True))
        rng = np.random.default_rng(1)
        z = jnp.asarray(rng.normal(size=(4, 50, 16)).astype(np.float32))
        st = vq_ops.ema_vq_init(32, 16)
        key = jax.random.PRNGKey(0)
        o_ref = vq_ops.ema_vq_forward(st, z, key, training=True, update=True,
                                      use_pallas=False)
        o_pal = vq_ops.ema_vq_forward(st, z, key, training=True, update=True,
                                      use_pallas=True)
        np.testing.assert_allclose(np.asarray(o_ref[0]), np.asarray(o_pal[0]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(o_ref[3].emb),
                                   np.asarray(o_pal[3].emb),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(o_ref[2]), float(o_pal[2]),
                                   rtol=1e-5)
