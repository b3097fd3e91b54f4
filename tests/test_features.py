"""Tests for the feature layer: STFT/mel/log-mel, iSTFT/Griffin-Lim, CMVN."""

import numpy as np
import pytest

from vae_npvc_tpu.data import cmvn, features, kaldi_io


class TestMelFilterbank:
    def test_shape_and_coverage(self):
        fb = features.mel_filterbank(24000, 1024, 80, 80, 7600)
        assert fb.shape == (80, 513)
        assert np.all(fb >= 0)
        # every filter has some support
        assert np.all(fb.sum(axis=1) > 0)
        # filters live inside [fmin, fmax]
        freqs = np.linspace(0, 12000, 513)
        active = fb.sum(axis=0) > 0
        assert freqs[active].min() >= 60 and freqs[active].max() <= 7700

    def test_slaney_scale_monotonic(self):
        f = np.linspace(0, 12000, 100)
        m = features.hz_to_mel(f)
        assert np.all(np.diff(m) > 0)
        np.testing.assert_allclose(features.mel_to_hz(m), f, rtol=1e-6,
                                   atol=1e-6)


class TestStft:
    def test_matches_numpy_oracle(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        n_fft, hop = 64, 16
        x = rng.normal(size=(1, 200)).astype(np.float32)

        got = np.asarray(features.stft_magnitude(jnp.asarray(x), n_fft, hop))

        xp = np.pad(x[0], n_fft // 2, mode="reflect")
        w = np.hanning(n_fft + 1)[:-1]
        T = 1 + 200 // hop
        expect = np.stack([
            np.abs(np.fft.rfft(xp[t * hop:t * hop + n_fft] * w))
            for t in range(T)])
        assert got.shape == (1, T, n_fft // 2 + 1)
        np.testing.assert_allclose(got[0], expect, rtol=1e-4, atol=1e-5)

    def test_logmel_shape(self):
        import jax.numpy as jnp
        x = jnp.zeros((2, 24000))
        lm = features.logmelspectrogram(x, fs=24000, n_fft=1024, n_shift=256,
                                        n_mels=80, fmin=80, fmax=7600)
        assert lm.shape == (2, 1 + 24000 // 256, 80)
        # log10(eps) floor for silence
        np.testing.assert_allclose(np.asarray(lm), -10.0, atol=1e-4)

    def test_istft_roundtrip(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(1)
        n_fft, hop, N = 64, 16, 400
        x = rng.normal(size=(1, N)).astype(np.float32)
        spec = features._stft_complex(jnp.asarray(x), n_fft, hop)
        back = np.asarray(features.istft(spec, n_fft, hop, length=N))
        # interior reconstructs exactly (COLA); edges are lossy
        np.testing.assert_allclose(back[0, n_fft:-n_fft], x[0, n_fft:-n_fft],
                                   rtol=1e-3, atol=1e-4)

    def test_griffin_lim_recovers_tone(self):
        import jax.numpy as jnp
        fs, n_fft, hop = 16000, 256, 64
        t = np.arange(fs // 4) / fs
        tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
        lm = features.logmelspectrogram(jnp.asarray(tone), fs=fs, n_fft=n_fft,
                                        n_shift=hop, n_mels=40)
        wav = np.asarray(features.griffin_lim(
            lm, fs=fs, n_fft=n_fft, n_shift=hop, n_mels=40, n_iter=8,
            length=tone.shape[1]))
        spec = np.abs(np.fft.rfft(wav[0] * np.hanning(len(wav[0]))))
        freqs = np.fft.rfftfreq(len(wav[0]), 1 / fs)
        peak = freqs[np.argmax(spec)]
        assert abs(peak - 440) < 40, f"dominant frequency {peak}"


class TestCmvn:
    def _toy_scp(self, tmp_path, n=5, D=6):
        rng = np.random.default_rng(0)
        with kaldi_io.ArkWriter(tmp_path / "f.ark", tmp_path / "f.scp") as w:
            for i in range(n):
                w.write(f"u{i}", (rng.normal(size=(30 + i, D)) * 3 + 5)
                        .astype(np.float32))
        return tmp_path / "f.scp"

    def test_stats_normalize_reverse(self, tmp_path):
        scp = self._toy_scp(tmp_path)
        stats = cmvn.compute_stats(scp)
        assert stats.shape == (2, 7)
        # pooled normalized stream has mean 0 / std 1
        mats = [kaldi_io.load_mat(rx) for rx in kaldi_io.read_scp(scp).values()]
        normed = np.concatenate([cmvn.apply(m, stats) for m in mats])
        np.testing.assert_allclose(normed.mean(0), 0, atol=1e-4)
        np.testing.assert_allclose(normed.std(0), 1, atol=1e-3)
        # reverse is the exact inverse
        rt = cmvn.apply(cmvn.apply(mats[0], stats), stats, reverse=True)
        np.testing.assert_allclose(rt, mats[0], rtol=1e-5, atol=1e-5)

    def test_kaldi_ark_roundtrip(self, tmp_path):
        scp = self._toy_scp(tmp_path)
        stats = cmvn.compute_stats(scp)
        cmvn.write_stats(tmp_path / "cmvn.ark", stats)
        back = cmvn.read_stats(tmp_path / "cmvn.ark")
        np.testing.assert_allclose(back, stats, rtol=1e-12)


class TestFbankCli:
    def test_make_fbank_and_cmvn_pipeline(self, tmp_path):
        from scipy.io import wavfile

        from vae_npvc_tpu.bin.apply_cmvn import apply_dir, compute
        from vae_npvc_tpu.bin.make_fbank import make_fbank

        fs = 16000
        data = tmp_path / "data"
        data.mkdir()
        rng = np.random.default_rng(0)
        with open(data / "wav.scp", "w") as scp:
            for i in range(3):
                n = int(rng.integers(fs // 4, fs // 2))
                wav = (rng.normal(size=n) * 0.1 * 32767).astype(np.int16)
                path = data / f"u{i}.wav"
                wavfile.write(path, fs, wav)
                scp.write(f"u{i} {path}\n")

        out = tmp_path / "fbank"
        n = make_fbank(data, out, fs=fs, n_fft=512, n_shift=128, n_mels=24)
        assert n == 3
        feats = kaldi_io.read_scp(out / "feats.scp")
        unf = kaldi_io.load_dict_data(out / "utt2num_frames")
        for u, rx in feats.items():
            mat = kaldi_io.load_mat(rx)
            assert mat.shape == (int(unf[u]), 24)
            assert np.all(np.isfinite(mat))

        compute(f"scp:{out / 'feats.scp'}", tmp_path / "cmvn.ark")
        dump = tmp_path / "dump"
        apply_dir(tmp_path / "cmvn.ark", f"scp:{out / 'feats.scp'}", dump,
                  extra_files=["utt2num_frames"])
        assert (dump / "feats.scp").exists()
        assert (dump / "utt2num_frames").exists()
        # denormalize restores original features
        denorm = tmp_path / "denorm"
        apply_dir(tmp_path / "cmvn.ark", f"scp:{dump / 'feats.scp'}", denorm,
                  reverse=True)
        u0 = list(feats)[0]
        orig = kaldi_io.load_mat(feats[u0])
        back = kaldi_io.load_mat(kaldi_io.read_scp(denorm / "feats.scp")[u0])
        np.testing.assert_allclose(back, orig, rtol=1e-3, atol=1e-4)
