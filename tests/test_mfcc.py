"""Kaldi-semantics MFCC + energy-VAD front-end (data/mfcc.py).

Oracle: an independent per-frame loop implementation of the documented Kaldi
algorithm (reference conf: egs/vcc20/vae1/conf/mfcc.conf + vad.conf), written
with explicit sums — catches vectorization/indexing bugs in the module.
"""

import numpy as np

from vae_npvc_tpu.data.mfcc import (compute_vad, frame_signal,
                                    mel_banks_htk, mfcc, mfcc_vad,
                                    povey_window)

EPS = np.finfo(np.float32).eps


def _oracle_mfcc_frame(frame, banks, num_ceps, lifter, preemph):
    """One frame through the spec, explicit loops (float64)."""
    frame = frame - frame.mean()
    log_e = np.log(max(np.sum(frame * frame), EPS))
    out = np.empty_like(frame)
    for i in range(len(frame)):
        prev = frame[i - 1] if i > 0 else frame[0]
        out[i] = frame[i] - preemph * prev
    n = len(frame)
    w = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))) ** 0.85
    out = out * w
    n_fft = 1
    while n_fft < n:
        n_fft *= 2
    spec = np.fft.rfft(out, n=n_fft)
    power = np.abs(spec) ** 2
    mel = np.log(np.maximum(power @ banks.T, EPS))
    nb = banks.shape[0]
    ceps = np.zeros(num_ceps)
    for k in range(num_ceps):
        s = 0.0
        for j in range(nb):
            s += mel[j] * np.cos(np.pi * k * (2 * j + 1) / (2 * nb))
        scale = np.sqrt(1.0 / nb) if k == 0 else np.sqrt(2.0 / nb)
        ceps[k] = s * scale
    for k in range(num_ceps):
        ceps[k] *= 1.0 + 0.5 * lifter * np.sin(np.pi * k / lifter)
    ceps[0] = log_e
    return ceps, log_e


def test_mfcc_matches_loop_oracle():
    rng = np.random.default_rng(0)
    fs = 16000
    x = (rng.normal(size=(fs // 4,)) * 0.1
         + 0.5 * np.sin(2 * np.pi * 440 * np.arange(fs // 4) / fs))
    feats, log_e = mfcc(x, fs, num_mel_bins=30, num_ceps=30,
                        low_freq=20.0, high_freq=7600.0)

    frames = frame_signal(x, 400, 160, snip_edges=False)
    banks = mel_banks_htk(30, 512, fs, 20.0, 7600.0)
    for t in (0, 3, len(frames) - 1):
        want, want_e = _oracle_mfcc_frame(frames[t].copy(), banks, 30,
                                          22.0, 0.97)
        np.testing.assert_allclose(feats[t], want, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(log_e[t], want_e, rtol=1e-5)


def test_frame_count_and_centering():
    # snip-edges=false: T = (N + shift/2) // shift; frame t centered at
    # t*shift + shift/2
    x = np.arange(16000, dtype=np.float64)
    frames = frame_signal(x, 400, 160, snip_edges=False)
    assert frames.shape == ((16000 + 80) // 160, 400)
    # an interior frame is an exact slice
    t = 10
    start = t * 160 + 80 - 200
    np.testing.assert_array_equal(frames[t], x[start:start + 400])
    # the first frame reflects at the left edge incl. the boundary sample
    # (Kaldi ExtractWindow): index -k -> k-1
    assert frames[0][0] == x[119]  # -(0*160+80-200)-1 = 119


def test_mel_banks_htk_shape_and_partition():
    banks = mel_banks_htk(30, 512, 16000, 20.0, 7600.0)
    assert banks.shape == (30, 257)
    # triangles live strictly inside (low, high)
    freqs = np.linspace(0, 8000, 257)
    active = banks.sum(axis=0) > 0
    assert not active[freqs < 20].any()
    assert not active[freqs > 7600].any()
    # each filter is a single nonnegative triangle with unit peak-ish profile
    assert (banks >= 0).all()
    assert (banks.max(axis=1) > 0.5).all()


def test_energy_and_lifter_knobs():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8000,)) * 0.3
    with_e, log_e = mfcc(x, 16000, use_energy=True)
    no_e, _ = mfcc(x, 16000, use_energy=False)
    np.testing.assert_allclose(with_e[:, 0], log_e, rtol=1e-6)
    assert not np.allclose(no_e[:, 0], log_e)
    # lifter: feats scale per-coefficient by 1 + 0.5*Q*sin(pi*k/Q), k>0
    lift, _ = mfcc(x, 16000, use_energy=False, cepstral_lifter=22.0)
    flat, _ = mfcc(x, 16000, use_energy=False, cepstral_lifter=0.0)
    k = 5
    want = 1.0 + 0.5 * 22.0 * np.sin(np.pi * k / 22.0)
    np.testing.assert_allclose(lift[:, k] / flat[:, k], want, rtol=1e-5)


def test_vad_kaldi_semantics():
    # hand-built energies: mean = 5, threshold = 5.5 + 0.5*5 = 8
    e = np.array([0.0, 0, 0, 10, 10, 10, 0, 0, 0, 5], np.float64)
    e = e / e.mean() * 5.0
    vad = compute_vad(e, energy_threshold=5.5, energy_mean_scale=0.5,
                      frames_context=2, proportion_threshold=0.12)
    thresh = 5.5 + 0.5 * 5.0
    above = e > thresh
    want = np.zeros(len(e))
    for t in range(len(e)):
        lo, hi = max(0, t - 2), min(len(e), t + 3)
        want[t] = 1.0 if above[lo:hi].sum() >= (hi - lo) * 0.12 else 0.0
    np.testing.assert_array_equal(vad, want)
    # context spreads voicing: frames 1..8 see a loud neighbor
    assert vad[3:6].all()
    assert vad[1] == 1.0 and vad[0] == 0.0


def test_mfcc_vad_drops_silence():
    fs = 16000
    rng = np.random.default_rng(2)
    sil = rng.normal(size=(fs // 4,)) * 1e-4
    loud = 0.5 * np.sin(2 * np.pi * 300 * np.arange(fs // 4) / fs)
    x = np.concatenate([sil, loud])
    voiced = mfcc_vad(x, fs)
    all_frames, log_e = mfcc(x, fs)
    assert 0 < len(voiced) < len(all_frames)
    # roughly the loud half survives
    assert len(voiced) < 0.75 * len(all_frames)
    assert voiced.shape[1] == 30


def test_eval_similarity_cli_mfcc_vad(tmp_path, monkeypatch, capsys):
    """bin/eval_similarity --frontend mfcc_vad end-to-end on tiny wavs."""
    import sys

    from scipy.io import wavfile

    from vae_npvc_tpu.bin.eval_similarity import main

    fs = 16000
    rng = np.random.default_rng(7)
    train = tmp_path / "train"
    train.mkdir()
    conv = tmp_path / "converted_wav"
    conv.mkdir()

    def tone_wav(path, f, seed):
        r = np.random.default_rng(seed)
        x = (0.3 * np.sin(2 * np.pi * f * np.arange(fs // 2) / fs)
             + 0.02 * r.normal(size=(fs // 2,)))
        wavfile.write(path, fs, (x * 32767).astype(np.int16))

    with open(train / "wav.scp", "w") as ws, \
            open(train / "utt2spk_id", "w") as us:
        for i in range(8):
            p = train / f"u{i}.wav"
            tone_wav(p, 200.0 + 150 * (i % 2), i)
            ws.write(f"u{i} {p}\n")
            us.write(f"u{i} {i % 2}\n")
    # converted utterances that should sound like speaker 1 (350 Hz)
    trials = tmp_path / "trials"
    with open(trials, "w") as f:
        for j in range(2):
            tone_wav(conv / f"c{j}.wav", 350.0, 100 + j)
            f.write(f"c{j} 1\n")
    conf = tmp_path / "conf.yaml"
    conf.write_text("crop_length: 24\n")

    out = tmp_path / "scores"
    monkeypatch.setattr(sys, "argv", [
        "eval_similarity", "-c", str(conf), "--train_dir", str(train),
        "--converted_scp", "unused", "--trials", str(trials),
        "--enroll_dir", str(train), "--steps", "40",
        "--frontend", "mfcc_vad", "--converted_wav_dir", str(conv),
        "--output_dir", str(out)])
    main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert "PLDA:" in line and "COSSIM:" in line, line
    assert (out / "1" / "cossim_scores").exists()
    assert (out / "1" / "plda_scores").exists()


def test_wav_frontend_to_embedder(tmp_path):
    """mfcc_vad_scp + train_embedder(feats=...) + embed_feats end-to-end."""
    from scipy.io import wavfile

    from vae_npvc_tpu.eval.similarity import (embed_feats, mfcc_vad_scp,
                                              train_embedder)

    fs = 16000
    rng = np.random.default_rng(3)
    scp = {}
    with open(tmp_path / "utt2spk_id", "w") as f:
        for i in range(6):
            tone = 200.0 + 150 * (i % 2)
            x = (0.3 * np.sin(2 * np.pi * tone * np.arange(fs // 2) / fs)
                 + 0.02 * rng.normal(size=(fs // 2,)))
            p = tmp_path / f"u{i}.wav"
            wavfile.write(p, fs, (x * 32767).astype(np.int16))
            scp[f"u{i}"] = str(p)
            f.write(f"u{i} {i % 2}\n")
    with open(tmp_path / "wav.scp", "w") as f:
        for u, p in scp.items():
            f.write(f"{u} {p}\n")

    feats = mfcc_vad_scp(tmp_path / "wav.scp")
    assert set(feats) == set(scp)
    assert all(m.shape[1] == 30 and len(m) > 0 for m in feats.values())

    model, params = train_embedder(str(tmp_path), {}, steps=30,
                                   batch_size=4, feats=feats, log_every=0)
    embs = embed_feats(model, params, feats)
    assert set(embs) == set(scp)
    for e in embs.values():
        np.testing.assert_allclose(np.linalg.norm(e), 1.0, rtol=1e-5)
