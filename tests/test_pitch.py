"""Kaldi-style pitch features (data/pitch.py) + the fbank_pitch chain."""

import numpy as np

from vae_npvc_tpu.data.pitch import (_pov_feature, kaldi_pitch, pitch_feats,
                                     process_pitch)

FS = 16000


def _tone(f0, secs=1.0, noise=0.01, seed=0):
    t = np.arange(int(FS * secs))
    rng = np.random.default_rng(seed)
    return (0.4 * np.sin(2 * np.pi * f0 * t / FS)
            + noise * rng.normal(size=len(t))).astype(np.float32)


def test_tone_f0_and_pov():
    p = kaldi_pitch(_tone(220.0), FS)
    interior = p[20:80]
    # 4 kHz lag grid quantizes 220 Hz to 4000/18 = 222.2
    assert abs(interior[:, 1].mean() - 220.0) < 5.0
    assert interior[:, 1].std() < 2.0
    assert interior[:, 0].mean() > 0.9  # voiced: NCCF near 1

    noise = kaldi_pitch(np.random.default_rng(1).normal(
        size=(FS,)).astype(np.float32), FS)
    assert noise[20:80, 0].mean() < 0.6  # unvoiced: low NCCF


def test_sweep_tracks():
    t = np.arange(FS) / FS
    sweep = 0.4 * np.sin(2 * np.pi * (150 * t + 75 * t ** 2)) \
        .astype(np.float32)
    p = kaldi_pitch(sweep, FS)
    # instantaneous f0 = 150 + 150 t
    for frame, want in ((25, 187.5), (50, 225.0), (75, 262.5)):
        assert abs(p[frame, 1] - want) < 12.0, (frame, p[frame, 1])


def test_frame_count_matches_fbank():
    from vae_npvc_tpu.data.features import num_frames

    x = _tone(300.0, secs=0.73)
    n_shift = 160
    T = num_frames(len(x), n_shift)
    f = pitch_feats(x, FS, n_frames=T, frame_shift_ms=1000.0 * n_shift / FS)
    assert f.shape == (T, 3)


def test_process_pitch_properties():
    # constant pitch: delta == 0 and normalized log-pitch ~ 0
    pitch = np.stack([np.full(50, 0.95), np.full(50, 200.0)], axis=1)
    f = process_pitch(pitch.astype(np.float32))
    np.testing.assert_allclose(f[:, 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(f[:, 1], 0.0, atol=1e-5)
    # pov feature formula
    np.testing.assert_allclose(f[:, 0], _pov_feature(0.95), rtol=1e-5)
    # rising pitch: positive delta
    rise = np.stack([np.full(50, 0.95),
                     200.0 * 2 ** (np.arange(50) / 50.0)], axis=1)
    fr = process_pitch(rise.astype(np.float32))
    assert (fr[5:45, 2] > 0).all()


def test_make_fbank_pitch_cli(tmp_path):
    """make_fbank --pitch writes (T, n_mels+3) arks aligned per frame."""
    from scipy.io import wavfile

    from vae_npvc_tpu.bin.make_fbank import make_fbank
    from vae_npvc_tpu.data import kaldi_io

    d = tmp_path / "data"
    d.mkdir()
    with open(d / "wav.scp", "w") as f:
        for i, f0 in enumerate((220.0, 330.0)):
            p = tmp_path / f"u{i}.wav"
            wavfile.write(p, FS, (_tone(f0, secs=0.5, seed=i)
                                  * 32767).astype(np.int16))
            f.write(f"u{i} {p}\n")
    out = tmp_path / "fbank"
    n = make_fbank(d, out, fs=FS, n_fft=512, n_shift=160, n_mels=40,
                   pitch=True)
    assert n == 2
    scp = kaldi_io.read_scp(out / "feats.scp")
    for utt, rx in scp.items():
        mat = kaldi_io.load_mat(rx)
        assert mat.shape[1] == 43
        # voiced tone: the Kaldi POV warp 2((1.0001-n)^0.15 - 1) maps
        # high NCCF to strongly negative values (~ -1.2); unvoiced ~ 0
        assert mat[10:30, 40].mean() < -0.8
