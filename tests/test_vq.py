"""Unit tests for the VQ core against independent numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.smoke  # fast tier: pytest -m smoke

from vae_npvc_tpu.ops import vq
from vae_npvc_tpu.ops.losses import log_loss, LOG_2PI


def np_nearest(z_flat, emb):
    d = (np.sum(z_flat**2, 1, keepdims=True) + np.sum(emb**2, 1)
         - 2 * z_flat @ emb.T)
    return np.argmin(d, axis=1)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


class TestPlainVQ:
    def test_encode_matches_numpy_oracle(self, rng):
        z = rng.normal(size=(2, 7, 16)).astype(np.float32)
        emb = rng.normal(size=(32, 16)).astype(np.float32)
        idx = np.asarray(vq.vq_encode(jnp.array(emb), jnp.array(z)))
        expect = np_nearest(z.reshape(-1, 16), emb).reshape(2, 7)
        np.testing.assert_array_equal(idx, expect)

    def test_encode_normalized(self, rng):
        z = rng.normal(size=(2, 7, 16)).astype(np.float32)
        emb = rng.normal(size=(32, 16)).astype(np.float32)
        idx = np.asarray(vq.vq_encode(jnp.array(emb), jnp.array(z), normalize=True))
        zn = z.reshape(-1, 16)
        zn = zn / np.linalg.norm(zn, axis=1, keepdims=True)
        en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        np.testing.assert_array_equal(idx, np_nearest(zn, en).reshape(2, 7))

    def test_decode_gathers_codes(self, rng):
        emb = rng.normal(size=(8, 4)).astype(np.float32)
        idx = np.array([[0, 3], [7, 1]])
        out = np.asarray(vq.vq_decode(jnp.array(emb), jnp.array(idx)))
        np.testing.assert_array_equal(out, emb[idx])

    def test_forward_losses_match_oracle(self, rng):
        B, T, D, K = 3, 5, 8, 16
        z = rng.normal(size=(B, T, D)).astype(np.float32)
        emb = rng.normal(size=(K, D)).astype(np.float32)
        z_vq, qut, enc, detail = vq.vq_forward(jnp.array(emb), jnp.array(z),
                                               reduction="frame_mean")
        zf = z.reshape(-1, D)
        d = (np.sum(zf**2, 1, keepdims=True) + np.sum(emb**2, 1)
             - 2 * zf @ emb.T)
        idx = np.argmin(d, axis=1)
        zq = emb[idx]
        exp_qut = np.sum((zq - zf) ** 2) / (B * T)
        np.testing.assert_allclose(qut, exp_qut, rtol=1e-4)
        np.testing.assert_allclose(enc, exp_qut, rtol=1e-4)  # same values, diff grads
        # straight-through value equals the quantized vector — compare only on
        # rows whose nearest code is unambiguous (f32 argmin may legitimately
        # differ from the f64 oracle on near-ties)
        gaps = np.partition(d, 1, axis=1)
        clear = (gaps[:, 1] - gaps[:, 0]) > 1e-3
        np.testing.assert_allclose(np.asarray(z_vq).reshape(-1, D)[clear],
                                   zq[clear], rtol=1e-4, atol=1e-6)
        assert 1.0 <= float(detail["entropy"]) <= K

    def test_forward_normalize_adds_norm_loss(self, rng):
        B, T, D, K = 2, 4, 8, 16
        z = rng.normal(size=(B, T, D)).astype(np.float32)
        emb = rng.normal(size=(K, D)).astype(np.float32)
        _, _, enc, _ = vq.vq_forward(jnp.array(emb), jnp.array(z),
                                     normalize=True, reduction="frame_mean")
        zf = z.reshape(-1, D)
        zn = zf / np.linalg.norm(zf, axis=1, keepdims=True)
        en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        zq = en[np_nearest(zn, en)]
        exp = (np.sum((zq - zn) ** 2) + np.sum((zn - zf) ** 2)) / (B * T)
        np.testing.assert_allclose(enc, exp, rtol=1e-5)

    def test_straight_through_gradient(self, rng):
        """d(sum(z_vq))/dz must be identity (STE), and codebook gets loss grads."""
        z = jnp.array(rng.normal(size=(1, 4, 8)).astype(np.float32))
        emb = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))

        g_z = jax.grad(lambda zz: jnp.sum(vq.vq_forward(emb, zz)[0]))(z)
        np.testing.assert_allclose(np.asarray(g_z), np.ones_like(g_z), rtol=1e-6)

        g_emb = jax.grad(lambda e: vq.vq_forward(e, z)[1])(emb)
        assert np.abs(np.asarray(g_emb)).sum() > 0  # codebook loss reaches emb

        g_z_enc = jax.grad(lambda zz: vq.vq_forward(emb, zz)[2])(z)
        assert np.abs(np.asarray(g_z_enc)).sum() > 0  # commitment reaches encoder

    def test_reductions(self, rng):
        B, T, D, K = 2, 3, 4, 8
        z = jnp.array(rng.normal(size=(B, T, D)).astype(np.float32))
        emb = jnp.array(rng.normal(size=(K, D)).astype(np.float32))
        s = float(vq.vq_forward(emb, z, reduction="sum")[1])
        assert np.isclose(float(vq.vq_forward(emb, z, reduction="mean")[1]),
                          s / (B * T * D), rtol=1e-5)
        assert np.isclose(float(vq.vq_forward(emb, z, reduction="batch_mean")[1]),
                          s / B, rtol=1e-5)
        assert np.isclose(float(vq.vq_forward(emb, z, reduction="frame_mean")[1]),
                          s / (B * T), rtol=1e-5)
        assert vq.vq_forward(emb, z, reduction="none")[1].shape == (B, T, D)


class TestEmaVQ:
    def test_init_from_first_batch(self, rng):
        B, T, D, K = 2, 8, 4, 8
        z = jnp.array(rng.normal(size=(B, T, D)).astype(np.float32))
        state = vq.ema_vq_init(K, D)
        key = jax.random.PRNGKey(0)
        _, _, _, new_state, _ = vq.ema_vq_forward(state, z, key)
        assert bool(new_state.initted)
        # init picks codebook rows from (possibly noised) batch rows
        assert new_state.emb.shape == (K, D)
        assert not np.allclose(np.asarray(new_state.emb), 0.0)

    def test_ema_update_matches_oracle(self, rng):
        """One post-init step with all codes used: EMA formula vs numpy."""
        B, T, D, K = 1, 64, 4, 4
        mu = 0.9
        z = rng.normal(size=(B, T, D)).astype(np.float32)
        emb = rng.normal(size=(K, D)).astype(np.float32)
        state = vq.EmaVqState(jnp.ones((), jnp.bool_), jnp.array(emb),
                              jnp.array(emb), jnp.full((K,), 16.0))
        key = jax.random.PRNGKey(1)
        z_vq, qut, enc, new_state, detail = vq.ema_vq_forward(
            state, jnp.array(z), key, mu=mu, threshold=1.0)

        zf = z.reshape(-1, D)
        idx = np_nearest(zf, emb)
        one_hot = np.eye(K)[idx]
        bsum = one_hot.T @ zf
        belem = one_hot.sum(0)
        exp_sum = mu * emb + (1 - mu) * bsum
        exp_elem = mu * 16.0 + (1 - mu) * belem
        exp_emb = exp_sum / exp_elem[:, None]  # all codes above threshold

        np.testing.assert_allclose(np.asarray(new_state.emb_sum), exp_sum,
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(new_state.emb_elem), exp_elem,
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(new_state.emb), exp_emb, rtol=1e-4)
        # losses: commitment only against the OLD codebook
        exp_enc = np.sum((emb[idx] - zf) ** 2) / (B * T)
        np.testing.assert_allclose(enc, exp_enc, rtol=1e-4)
        assert float(qut) == 0.0
        # quantized output uses the OLD codebook (pre-update), like the reference
        np.testing.assert_allclose(np.asarray(z_vq).reshape(-1, D), emb[idx],
                                   rtol=1e-4, atol=1e-6)
        for k in ("entropy", "used_curr", "usage", "diff_emb"):
            assert k in detail

    def test_dead_code_restart(self, rng):
        """Codes with EMA count below threshold are replaced by batch samples."""
        B, T, D, K = 1, 32, 4, 4
        z = rng.normal(size=(B, T, D)).astype(np.float32) + 10.0  # far cluster
        emb = np.zeros((K, D), np.float32)
        emb[0] = 10.0  # only code 0 can win
        state = vq.EmaVqState(jnp.ones((), jnp.bool_), jnp.array(emb),
                              jnp.array(emb), jnp.full((K,), 1e-4))
        _, _, _, new_state, detail = vq.ema_vq_forward(
            state, jnp.array(z), jax.random.PRNGKey(2), mu=0.5, threshold=1.0)
        # dead codes (1..3) got moved near the batch (mean ~10), not kept at 0
        dead = np.asarray(new_state.emb)[1:]
        assert np.abs(dead).max() > 5.0
        assert float(detail["used_curr"]) == 1.0

    def test_ste_gradient_fixed_by_default(self, rng):
        z = jnp.array(rng.normal(size=(1, 4, 8)).astype(np.float32))
        emb = jnp.array(rng.normal(size=(16, 8)).astype(np.float32))
        state = vq.EmaVqState(jnp.ones((), jnp.bool_), emb, emb,
                              jnp.full((16,), 4.0))
        key = jax.random.PRNGKey(0)

        def out_sum(zz):
            return jnp.sum(vq.ema_vq_forward(state, zz, key, training=False)[0])
        g = jax.grad(out_sum)(z)
        np.testing.assert_allclose(np.asarray(g), np.ones_like(g), rtol=1e-6)

        def out_sum_legacy(zz):
            return jnp.sum(vq.ema_vq_forward(state, zz, key, training=False,
                                             legacy_no_ste=True)[0])
        g = jax.grad(out_sum_legacy)(z)
        np.testing.assert_allclose(np.asarray(g), np.zeros_like(g), atol=1e-8)

    def test_encode_decode_roundtrip(self, rng):
        D, K = 8, 16
        emb = jnp.array(rng.normal(size=(K, D)).astype(np.float32))
        state = vq.EmaVqState(jnp.ones((), jnp.bool_), emb, emb,
                              jnp.ones((K,)))
        z = jnp.array(rng.normal(size=(2, 5, D)).astype(np.float32))
        idx = vq.ema_vq_encode(state, z)
        dec = vq.ema_vq_decode(state, idx)
        # re-encoding decoded vectors returns the same indices
        np.testing.assert_array_equal(np.asarray(vq.ema_vq_encode(state, dec)),
                                      np.asarray(idx))

    def test_jit_and_eval_mode(self, rng):
        D, K = 8, 16
        state = vq.ema_vq_init(K, D)
        z = jnp.array(rng.normal(size=(2, 5, D)).astype(np.float32))
        f = jax.jit(lambda s, zz, k: vq.ema_vq_forward(s, zz, k))
        _, _, _, state, _ = f(state, z, jax.random.PRNGKey(0))
        # eval mode must not touch state
        _, _, _, state2, detail = vq.ema_vq_forward(state, z,
                                                    jax.random.PRNGKey(1),
                                                    training=False)
        np.testing.assert_array_equal(np.asarray(state2.emb),
                                      np.asarray(state.emb))
        assert detail == {}


class TestLogLoss:
    def test_matches_formula(self, rng):
        x = rng.normal(size=(2, 3, 4)).astype(np.float32)
        xh = rng.normal(size=(2, 3, 4)).astype(np.float32)
        expect = 0.5 * (LOG_2PI + (x - xh) ** 2)
        np.testing.assert_allclose(
            log_loss(jnp.array(xh), jnp.array(x), "frame_mean"),
            expect.sum() / 6, rtol=1e-5)
        np.testing.assert_allclose(
            log_loss(jnp.array(xh), jnp.array(x), "sum"), expect.sum(),
            rtol=1e-5)


class TestJitter:
    def test_zero_prob_identity(self, rng):
        from vae_npvc_tpu.ops.jitter import jitter
        x = jnp.array(rng.normal(size=(2, 10, 4)).astype(np.float32))
        out = jitter(jax.random.PRNGKey(0), x, 0.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_full_prob_replaces_with_neighbors(self, rng):
        from vae_npvc_tpu.ops.jitter import jitter
        x = jnp.arange(12, dtype=jnp.float32).reshape(1, 12, 1)
        out = np.asarray(jitter(jax.random.PRNGKey(0), x, 1.0))[0, :, 0]
        t = np.arange(12)
        assert out[0] == 1 and out[-1] == 10
        assert np.all(np.abs(out - t) == 1)

    def test_replacement_rate(self, rng):
        from vae_npvc_tpu.ops.jitter import jitter
        x = jnp.arange(4096, dtype=jnp.float32).reshape(1, 4096, 1)
        out = np.asarray(jitter(jax.random.PRNGKey(3), x, 0.12))[0, :, 0]
        rate = np.mean(out != np.arange(4096))
        assert 0.08 < rate < 0.16


class TestInventoryParity:
    def test_quantize_bypass(self):
        import jax.numpy as jnp
        z = jnp.ones((2, 4, 8))
        emb = jnp.ones((16, 8))
        z_vq, qut, enc, detail = vq.vq_forward(emb, z, quantize=False)
        np.testing.assert_array_equal(np.asarray(z_vq), np.asarray(z))
        assert float(qut) == 0.0 and float(enc) == 0.0

    def test_sparsity_loss_prefers_orthogonal(self):
        import jax.numpy as jnp
        eye = jnp.eye(8) * 4.0
        tied = jnp.ones((8, 8))
        assert float(vq.sparsity_loss(eye)) < float(vq.sparsity_loss(tied))

    def test_unused_layer_variants_run(self):
        import jax
        import jax.numpy as jnp
        from vae_npvc_tpu.nn.blocks import ConvLReLU, DeConvGLU
        x = jnp.zeros((1, 8, 6))
        m1 = ConvLReLU(4, 3)
        v1 = m1.init(jax.random.PRNGKey(0), x)
        assert m1.apply(v1, x).shape == (1, 8, 4)
        m2 = DeConvGLU(4, 3)
        v2 = m2.init(jax.random.PRNGKey(0), x)
        assert m2.apply(v2, x).shape == (1, 8, 4)
