"""Tests for the objective-eval helpers (MCD/DTW)."""

import numpy as np

from vae_npvc_tpu.eval.mcd import dtw_path, mcd, mel_to_cepstra


class TestMcd:
    def test_identical_is_zero(self):
        rng = np.random.default_rng(0)
        m = rng.normal(size=(40, 20))
        # equal-length pairs DTW too now; the matmul cost's fp rounding
        # leaves ~1e-7 dB of residual on the diagonal path
        assert mcd(m, m) < 1e-5

    def test_sptk_convention_scale(self):
        """MCD formula oracle: the wav-domain mceps are SPTK-convention
        (log amplitude = c0 + Σ_{k≥1} c_k cos(ωk)), so a pure cosine ripple
        of amplitude A (natural log) between two otherwise-identical
        envelopes must measure 10/ln10·sqrt(2)·A dB (the reference
        mcd_calculate.py formula). Pins the √2 fix (round 3)."""
        import math

        from vae_npvc_tpu.eval.mcd import MCD_CONST, dtw_path, _pair_cost

        K, k0, A = 513, 7, 0.3
        i = np.arange(K)
        # the exact cepstral projection mcep_from_wav applies (alpha=0 path)
        k = np.arange(35)
        basis = np.cos(np.pi * i[None, :] * k[:, None] / (K - 1))
        basis[:, 0] *= 0.5
        basis[:, -1] *= 0.5
        logs_a = np.zeros((4, K))
        logs_b = logs_a + A * np.cos(np.pi * i * k0 / (K - 1))[None, :]
        ca = (logs_a @ basis.T) * (2.0 / (K - 1))
        cb = (logs_b @ basis.T) * (2.0 / (K - 1))
        assert abs(cb[0, k0] - A) < 1e-12      # SPTK convention holds
        cost = _pair_cost(ca[:, 1:], cb[:, 1:])
        d = np.array([cost[i, j] for i, j in dtw_path(cost)])
        got = MCD_CONST * float(np.mean(d))
        want = 10.0 / math.log(10.0) * math.sqrt(2.0) * A
        np.testing.assert_allclose(got, want, rtol=1e-6)

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
        # DTW path matches duplicated frames; the matmul-form cost matrix
        # (eval/mcd._pair_cost) carries ~1e-7 cancellation noise at zero
        assert mcd(a, b) < 1e-5

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


class TestWavMcd:
    """Wav-domain mcep MCD with the reference knob set (evaluate.sh:57-69)."""

    @staticmethod
    def _tone(fs, f0, formants, sec=0.5, seed=0):
        rng = np.random.default_rng(seed)
        t = np.arange(int(fs * sec)) / fs
        x = 0.25 * np.sin(2 * np.pi * f0 * t)
        for f in formants:
            x = x + 0.35 * np.sin(2 * np.pi * f * t)
        return x + 0.002 * rng.standard_normal(t.shape)

    def test_estimate_f0_accuracy(self):
        from vae_npvc_tpu.eval.mcd import estimate_f0

        fs = 24000
        x = self._tone(fs, 150.0, [])
        f0 = estimate_f0(x, fs, f0min=70, f0max=400)
        voiced = f0[f0 > 0]
        assert voiced.size > 0.8 * f0.size
        assert abs(np.median(voiced) - 150.0) < 5.0

    def test_f0_range_masks_out_of_range(self):
        from vae_npvc_tpu.eval.mcd import estimate_f0

        fs = 24000
        x = self._tone(fs, 150.0, [])
        f0 = estimate_f0(x, fs, f0min=200, f0max=400)
        # true pitch below the search floor: should not report ~150
        voiced = f0[f0 > 0]
        assert voiced.size == 0 or np.median(voiced) > 190

    def test_identical_wav_is_zero(self):
        from vae_npvc_tpu.eval.mcd import mcd_wav

        fs = 24000
        x = self._tone(fs, 150.0, [700, 1200])
        # ~1e-7 floor from the matmul-form cost's cancellation at zero
        assert mcd_wav(x, x, fs) < 1e-5

    def test_same_content_beats_different_content(self):
        from vae_npvc_tpu.eval.mcd import mcd_wav

        fs = 24000
        a = self._tone(fs, 150.0, [700, 1200])
        same = self._tone(fs, 120.0, [700, 1200], seed=1)   # other speaker
        diff = self._tone(fs, 120.0, [350, 2400], seed=2)   # other phones
        assert mcd_wav(a, same, fs) < mcd_wav(a, diff, fs)

    def test_read_f0_conf(self, tmp_path):
        from vae_npvc_tpu.eval.mcd import read_f0_range

        p = tmp_path / "TEF1.f0"
        p.write_text("127 405\n")
        assert read_f0_range(p) == (127.0, 405.0)

    def test_mcd_from_wavdirs_pairing(self, tmp_path):
        import wave

        from vae_npvc_tpu.eval.mcd import mcd_from_wavdirs

        fs = 24000

        def write(p, x):
            p.parent.mkdir(parents=True, exist_ok=True)
            with wave.open(str(p), "wb") as w:
                w.setnchannels(1); w.setsampwidth(2); w.setframerate(fs)
                w.writeframes((x * 32767).astype("<i2").tobytes())

        x = self._tone(fs, 150.0, [700, 1200])
        y = self._tone(fs, 120.0, [700, 1200], seed=1)
        write(tmp_path / "conv" / "SEF1_E20001.wav", x)
        write(tmp_path / "gt" / "TEF1" / "E20001.wav", y)
        mean, per_utt = mcd_from_wavdirs(tmp_path / "conv",
                                         tmp_path / "gt" / "TEF1")
        assert list(per_utt) == ["SEF1_E20001"] and mean > 0
