"""Tests for the objective-eval helpers (MCD/DTW)."""

import numpy as np

from vae_npvc_tpu.eval.mcd import dtw_path, mcd, mel_to_cepstra


class TestMcd:
    def test_identical_is_zero(self):
        rng = np.random.default_rng(0)
        m = rng.normal(size=(40, 20))
        assert mcd(m, m) < 1e-9

    def test_positive_and_symmetric_for_shifted(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(40, 20))
        b = a + 0.5
        d1, d2 = mcd(a, b), mcd(b, a)
        assert d1 > 0
        np.testing.assert_allclose(d1, d2, rtol=1e-9)

    def test_dtw_aligns_time_stretch(self):
        rng = np.random.default_rng(2)
        a = rng.normal(size=(30, 20))
        b = np.repeat(a, 2, axis=0)  # 2x time-stretched copy
        assert mcd(a, b) < 1e-9      # DTW path matches duplicated frames

    def test_dtw_path_monotone(self):
        cost = np.random.default_rng(3).random((10, 14))
        path = dtw_path(cost)
        assert path[0] == (0, 0) and path[-1] == (9, 13)
        di = np.diff([p[0] for p in path])
        dj = np.diff([p[1] for p in path])
        assert np.all(di >= 0) and np.all(dj >= 0)
        assert np.all((di + dj) >= 1)

    def test_cepstra_orthonormal_dct(self):
        rng = np.random.default_rng(4)
        m = rng.normal(size=(5, 16))
        c = mel_to_cepstra(m, n_cep=16)
        # full-order orthonormal DCT preserves energy (times ln10 scaling)
        np.testing.assert_allclose(
            np.sum(c ** 2), np.sum((m * np.log(10)) ** 2), rtol=1e-9)
