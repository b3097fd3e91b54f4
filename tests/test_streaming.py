"""Streaming serving sessions (serve/streaming.py): the incremental
front-end must be BIT-IDENTICAL to the offline engine pipeline, the
streamed vocoder output must match the one-shot conversion, and the
HTTP /stream route must round-trip chunked raw PCM end to end.

No reference counterpart (the reference is offline-only); the contract
being pinned is equality with our own offline path, which itself carries
golden parity to the reference models.
"""

import io
import threading
import urllib.request

import numpy as np
import pytest

from tests.test_serve import FEAT, _engine, toy_engine_parts  # noqa: F401
from vae_npvc_tpu.serve.streaming import StreamingSession


def _ragged_chunks(x, seed=0):
    """Split x into adversarially ragged chunks (incl. empty and 1-sample)."""
    rng = np.random.default_rng(seed)
    out, i = [], 0
    while i < x.size:
        n = int(rng.choice([1, 7, 130, 333, 1024]))
        out.append(x[i:i + n])
        i += n
    out.insert(1, x[:0])                       # empty feed is legal
    return out


def test_streaming_mel_bit_identical_to_offline(toy_engine_parts):
    """Ragged-fed session mel == engine.convert mel, bit for bit — and
    frames must accrue DURING feeding, not all at finish."""
    eng = _engine(toy_engine_parts)            # vocoder="none"
    try:
        rng = np.random.default_rng(7)
        wav = (rng.normal(size=(9000,)) * 0.1).astype(np.float32)
        want, fs = eng.convert(wav, 8000, "B", return_mel=True)

        s = StreamingSession(eng, "B", 8000, block_frames=16)
        seen_ready = []
        for c in _ragged_chunks(wav):
            s.feed(c)
            seen_ready.append(s.frames_ready)
        assert seen_ready[-1] > 0, "no incremental frames before finish"
        (at, mel), = list(s.finish())
        assert at == 0
        np.testing.assert_array_equal(mel, want)
    finally:
        eng.close()


def test_streaming_short_utterance_and_errors(toy_engine_parts):
    """Shorter than one block (all frames at finish), empty session raises,
    double finish and feed-after-finish raise."""
    eng = _engine(toy_engine_parts)
    try:
        wav = (np.random.default_rng(3).normal(size=(500,)) * 0.1
               ).astype(np.float32)
        want, _ = eng.convert(wav, 8000, 0, return_mel=True)
        s = StreamingSession(eng, 0, 8000, block_frames=64)
        s.feed(wav)
        assert s.frames_ready == 0             # window never safe pre-finish
        (_, mel), = list(s.finish())
        np.testing.assert_array_equal(mel, want)
        with pytest.raises(RuntimeError):
            s.feed(wav)
        with pytest.raises(RuntimeError):
            list(s.finish())

        empty = StreamingSession(eng, 0, 8000)
        with pytest.raises(ValueError):
            list(empty.finish())

        with pytest.raises(KeyError):
            StreamingSession(eng, "nope", 8000)
    finally:
        eng.close()


def test_streaming_resample_fallback(toy_engine_parts):
    """sr != engine rate: buffered whole-signal resample == offline path."""
    eng = _engine(toy_engine_parts)
    try:
        rng = np.random.default_rng(11)
        wav = (rng.normal(size=(4000,)) * 0.1).astype(np.float32)
        want, _ = eng.convert(wav, 16000, "A", return_mel=True)
        s = StreamingSession(eng, "A", 16000, block_frames=16)
        for c in _ragged_chunks(wav, seed=2):
            s.feed(c)
        assert s.frames_ready == 0             # incremental path disabled
        (_, mel), = list(s.finish())
        np.testing.assert_array_equal(mel, want)
    finally:
        eng.close()


def test_streaming_gl_wav_matches_offline(toy_engine_parts):
    """Griffin-Lim engines stream the (post-synthesis) wav in chunks whose
    concatenation equals the one-shot conversion exactly."""
    eng = _engine(toy_engine_parts, vocoder="gl", gl_iters=2)
    try:
        rng = np.random.default_rng(5)
        wav = (rng.normal(size=(6000,)) * 0.1).astype(np.float32)
        want, fs = eng.convert(wav, 8000, "B")
        s = StreamingSession(eng, "B", 8000, block_frames=16,
                             out_chunk_frames=32)
        for c in _ragged_chunks(wav, seed=1):
            s.feed(c)
        pieces = list(s.finish())
        assert len(pieces) > 1
        assert [at for at, _ in pieces] == [
            i * 32 * 32 for i in range(len(pieces))]
        got = np.concatenate([w for _, w in pieces])
        np.testing.assert_array_equal(got, want)
    finally:
        eng.close()


def test_streaming_jpwg_chunks_match_offline(toy_engine_parts, tmp_path):
    """Native-vocoder engines emit audio chunk-by-chunk AS synthesized;
    concatenation matches the one-shot conversion (same noise seed, same
    halo-exact chunking math — executable shapes differ, so allclose)."""
    from vae_npvc_tpu.train.pwg import PwgTrainer

    pwg_cfg = {"fs": 8000, "n_fft": 64, "n_shift": 32, "n_mels": 10,
               "layers": 4, "stacks": 2, "residual_channels": 8,
               "gate_channels": 16, "skip_channels": 8,
               "upsample_scales": [4, 8], "disc_layers": 3,
               "disc_channels": 8, "discriminator_train_start_steps": 0,
               "stft_loss_params": [[64, 16, 32]], "seed": 0}
    pwg = PwgTrainer(pwg_cfg)
    rng = np.random.default_rng(3)
    pwg.init_state((rng.normal(size=(2, 16 * 32)).astype(np.float32),
                    rng.normal(size=(2, 16, 10)).astype(np.float32)))
    voc_ck = tmp_path / "jpwg.ckpt"
    pwg.save_checkpoint(voc_ck)

    eng = _engine(toy_engine_parts, vocoder="jpwg", voc_config=pwg_cfg,
                  voc_checkpoint=voc_ck)
    try:
        wav = (rng.normal(size=(5000,)) * 0.1).astype(np.float32)
        want, _ = eng.convert(wav, 8000, "A")
        s = StreamingSession(eng, "A", 8000, block_frames=16,
                             out_chunk_frames=32)
        s.feed(wav)
        pieces = list(s.finish())
        assert len(pieces) > 1, "jpwg output must stream in >1 chunk"
        got = np.concatenate([w for _, w in pieces])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    finally:
        eng.close()


def test_streaming_over_bundle_backend(toy_engine_parts, tmp_path):
    """StreamingSession rides the bundle (StableHLO artifact) backend too:
    session mel == the bundle engine's one-shot convert, bit for bit (same
    backend on both sides; only the front-end framing differs)."""
    from vae_npvc_tpu.infer.export_serving import export_bundle
    from vae_npvc_tpu.serve import ConversionEngine

    cfg, ck, stats = toy_engine_parts
    export_bundle(cfg, ck, tmp_path / "bundle", buckets=[32, 64],
                  batch_size=4, n_targets=1, platforms=("cpu",),
                  spk2spk_id={"A": 0, "B": 1})
    eng = ConversionEngine(None, None, stats, bundle=tmp_path / "bundle",
                           feature=FEAT, vocoder="none", bucket_frames=32,
                           batch_window_ms=30.0)
    try:
        rng = np.random.default_rng(13)
        wav = (rng.normal(size=(1700,)) * 0.1).astype(np.float32)
        want, _ = eng.convert(wav, 8000, "B", return_mel=True)
        s = StreamingSession(eng, "B", 8000, block_frames=16)
        for c in _ragged_chunks(wav, seed=3):
            s.feed(c)
        (_, mel), = list(s.finish())
        np.testing.assert_array_equal(mel, want)
    finally:
        eng.close()


def test_http_stream_route(toy_engine_parts):
    """POST /stream with chunked raw-PCM request → chunked WAV response
    whose PCM equals the /convert route's for the same audio."""
    from scipy.io import wavfile

    from vae_npvc_tpu.bin import serve as serve_mod

    eng = _engine(toy_engine_parts, vocoder="gl", gl_iters=2)
    httpd = serve_mod.serve(eng, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        pcm = (np.sin(np.linspace(0, 80, 3000)) * 0.5 * 32767).astype(
            "<i2")

        # reference output through the non-streaming route
        buf = io.BytesIO()
        wavfile.write(buf, 8000, pcm)
        req = urllib.request.Request(
            f"{base}/convert?target=B", data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req) as resp:
            _, want = wavfile.read(io.BytesIO(resp.read()))

        # chunked-transfer request: urllib sends Transfer-Encoding: chunked
        # for file-like bodies with no Content-Length (py3.8+)
        class _Chunks(io.RawIOBase):
            def __init__(self, data, n=777):
                self.view, self.i, self.n = memoryview(data), 0, n

            def readable(self):
                return True

            def readinto(self, b):
                k = min(len(b), self.n, len(self.view) - self.i)
                b[:k] = self.view[self.i:self.i + k]
                self.i += k
                return k

        req = urllib.request.Request(
            f"{base}/stream?target=B&sr=8000&format=i16",
            data=_Chunks(pcm.tobytes()), method="POST")
        with urllib.request.urlopen(req) as resp:
            assert resp.headers["Content-Type"] == "audio/wav"
            body = resp.read()
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        got = np.frombuffer(body[44:], "<i2")
        np.testing.assert_array_equal(got, want)

        # f32 raw format parses too
        req = urllib.request.Request(
            f"{base}/stream?target=B&sr=8000&format=f32",
            data=(pcm.astype(np.float32) / 32768.0).astype("<f4").tobytes(),
            method="POST")
        with urllib.request.urlopen(req) as resp:
            body2 = resp.read()
        np.testing.assert_array_equal(np.frombuffer(body2[44:], "<i2"), want)

        # error paths: bad target / missing sr → 400, server stays up
        for url in (f"{base}/stream?target=nope&sr=8000",
                    f"{base}/stream?target=B"):
            req = urllib.request.Request(url, data=b"\0\0" * 100,
                                         method="POST")
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req)
            assert ei.value.code == 400
    finally:
        httpd.shutdown()
        eng.close()


# --------------------------------------------------------------------------
# approximate chunked conversion (round 5 — beyond-reference streaming):
# conversion overlaps ingest, GroupNorm statistics limited to
# prefix+lookahead through the SAME masked bucketed executables


def test_chunked_mode_full_lookahead_is_exact(toy_engine_parts):
    """lookahead >= utterance ⇒ every chunk's prefix is clipped to T_true,
    i.e. full-utterance statistics ⇒ output EXACTLY equals offline."""
    eng = _engine(toy_engine_parts)
    try:
        rng = np.random.default_rng(7)
        wav = (rng.normal(size=(9000,)) * 0.1).astype(np.float32)
        want, _ = eng.convert(wav, 8000, "B", return_mel=True)

        s = StreamingSession(eng, "B", 8000, block_frames=16,
                             chunk_frames=16, lookahead_frames=10 ** 6)
        for c in _ragged_chunks(wav):
            s.feed(c)
        (at, mel), = list(s.finish())
        assert at == 0
        np.testing.assert_array_equal(mel, want)
    finally:
        eng.close()


def test_chunked_mode_overlaps_ingest_and_bounded_deviation(toy_engine_parts):
    """With small lookahead, chunks must convert DURING feed (the latency
    win), the assembled output has the exact offline shape, and deviation
    is finite (statistics truncation only — not garbage)."""
    eng = _engine(toy_engine_parts)
    try:
        rng = np.random.default_rng(8)
        wav = (rng.normal(size=(12000,)) * 0.1).astype(np.float32)
        want, _ = eng.convert(wav, 8000, "B", return_mel=True)

        s = StreamingSession(eng, "B", 8000, block_frames=16,
                             chunk_frames=32, lookahead_frames=16)
        mid_converted = []
        for c in _ragged_chunks(wav, seed=3):
            s.feed(c)
            mid_converted.append(s.converted_frames)
        assert mid_converted[-1] > 0, \
            "no chunk converted during ingest (the whole point)"
        (at, mel), = list(s.finish())
        assert mel.shape == want.shape
        assert np.isfinite(mel).all()
        dev = float(np.sqrt(np.mean((mel - want) ** 2)))
        scale = float(np.sqrt(np.mean(want ** 2)))
        assert dev < scale, f"deviation {dev} not bounded vs scale {scale}"
        # and the last chunk (exact statistics by construction: its prefix
        # is clipped to T_true) matches offline exactly
        np.testing.assert_allclose(mel[-8:], want[-8:], rtol=0, atol=1e-5)
    finally:
        eng.close()


def test_chunked_mode_rejects_invalid_geometry(toy_engine_parts):
    eng = _engine(toy_engine_parts)
    try:
        with pytest.raises(ValueError):
            StreamingSession(eng, "B", 8000, chunk_frames=-5)
        with pytest.raises(ValueError):
            StreamingSession(eng, "B", 8000, chunk_frames=16,
                             lookahead_frames=-1)
    finally:
        eng.close()
