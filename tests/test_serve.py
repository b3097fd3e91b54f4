"""Online serving: engine pipeline equivalence, request coalescing, HTTP API.

The serving subsystem has no reference counterpart (the reference's
inference surface is the batch decode.py CLI); these tests pin the new
contract: the warm engine must produce the SAME mel output as the offline
Converter path for the same checkpoint, concurrent same-bucket requests
must coalesce into fewer device calls, and the HTTP layer must round-trip
WAV bytes end to end.
"""

import json
import threading
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from tests.toy_config import toy_config
from vae_npvc_tpu.data import cmvn as cmvn_mod
from vae_npvc_tpu.data import features
from vae_npvc_tpu.infer.convert import Converter
from vae_npvc_tpu.serve import ConversionEngine
from vae_npvc_tpu.train.trainer import Trainer

FEAT = {"fs": 8000, "n_fft": 128, "n_shift": 32, "n_mels": 10,
        "fmin": 0.0, "fmax": None, "win_length": None}


@pytest.fixture(scope="module")
def toy_engine_parts(tmp_path_factory):
    """Train a toy flat model one step; return (cfg, ckpt path, stats)."""
    tmp = tmp_path_factory.mktemp("serve")
    cfg = toy_config()
    tr = Trainer(cfg)
    rng = np.random.default_rng(0)
    batch = (rng.normal(size=(2, 32, 10)).astype(np.float32),
             np.zeros((2,), np.int32))
    tr.init_state(batch)
    tr.train_step(batch)
    ck = tmp / "m.ckpt"
    tr.save_checkpoint(ck)
    # plausible log-mel-scale CMVN stats (count=1000, mean≈-3, var≈1)
    D = 10
    stats = np.zeros((2, D + 1), np.float64)
    stats[0, :-1] = -3.0 * 1000
    stats[0, -1] = 1000
    stats[1, :-1] = (1.0 + 3.0 ** 2) * 1000
    return cfg, ck, stats


def _engine(parts, **kw):
    cfg, ck, stats = parts
    kw.setdefault("vocoder", "none")
    kw.setdefault("bucket_frames", 32)
    kw.setdefault("batch_window_ms", 30.0)
    return ConversionEngine(cfg, ck, stats, feature=FEAT,
                            spk2spk_id={"A": 0, "B": 1, "C": 2}, **kw)


def test_engine_matches_offline_converter(toy_engine_parts):
    """Engine mel output == hand-run Converter pipeline on the same wav."""
    cfg, ck, stats = toy_engine_parts
    eng = _engine(toy_engine_parts)
    try:
        rng = np.random.default_rng(1)
        wav = rng.normal(size=(2000,)).astype(np.float32) * 0.1
        mel_out, fs = eng.convert(wav, 8000, "B", return_mel=True)
        assert fs == 8000

        # offline: same front-end, same padding contract, Converter jit
        cv = Converter(cfg)
        cv.load_checkpoint(ck)
        T_true = features.num_frames(wav.size, 32)
        T_pad = 32 * ((max(T_true, cv.min_frames) + 31) // 32)
        n_pad = T_pad * 32 - 1
        xp = np.zeros((1, n_pad), np.float32)
        xp[0, :wav.size] = wav
        import jax
        mel = np.asarray(jax.jit(lambda w: features.logmelspectrogram(
            w, **FEAT))(xp))[0]
        feats = np.zeros_like(mel)
        feats[:T_true] = cmvn_mod.apply(mel[:T_true], stats)
        out = cv._infer_with_fallback(
            feats[None], np.asarray([1], np.int32),
            np.asarray([T_true], np.int32))[0]
        ref = cmvn_mod.apply(out[:T_true], stats, reverse=True)
        np.testing.assert_allclose(mel_out, ref, rtol=1e-5, atol=1e-5)
    finally:
        eng.close()


def test_engine_wav_output_and_unknown_target(toy_engine_parts):
    eng = _engine(toy_engine_parts, vocoder="gl", gl_iters=2)
    try:
        wav = np.sin(np.linspace(0, 100, 1500)).astype(np.float32)
        out, fs = eng.convert(wav, 16000, "A")   # exercises resample too
        assert out.ndim == 1 and out.size > 0 and np.all(np.isfinite(out))
        assert fs == 8000
        with pytest.raises(KeyError):
            eng.resolve_target("nope")
        assert eng.resolve_target("2") == 2      # numeric fallback
        # out-of-range numeric ids must be rejected at the API edge — a
        # jitted embedding gather on a bad id silently returns garbage /
        # non-finite audio (found by tools/serve_soak.py)
        with pytest.raises(KeyError, match="out of range"):
            eng.resolve_target(99)
    finally:
        eng.close()


def test_engine_coalesces_concurrent_requests(toy_engine_parts):
    """N concurrent same-length requests ride fewer device calls than N,
    and each result equals its own serial run."""
    eng = _engine(toy_engine_parts, max_batch=8, batch_window_ms=400.0)
    try:
        rng = np.random.default_rng(2)
        wavs = [rng.normal(size=(900,)).astype(np.float32) * 0.1
                for _ in range(6)]
        eng.warmup(1)                 # compile first so the window isn't
        calls0 = eng.batcher.calls    # consumed by compilation
        with ThreadPoolExecutor(6) as ex:
            outs = list(ex.map(
                lambda i: eng.convert(wavs[i], 8000, i % 3,
                                      return_mel=True)[0], range(6)))
        batched_calls = eng.batcher.calls - calls0
        assert batched_calls < 6      # coalescing actually happened
        for i, o in enumerate(outs):  # and results are per-request correct
            serial, _ = eng.convert(wavs[i], 8000, i % 3, return_mel=True)
            np.testing.assert_allclose(o, serial, rtol=1e-5, atol=1e-6)
    finally:
        eng.close()


def test_http_server_end_to_end(toy_engine_parts):
    import io

    from scipy.io import wavfile

    from vae_npvc_tpu.bin.serve import serve

    eng = _engine(toy_engine_parts, vocoder="gl", gl_iters=2)
    httpd = serve(eng, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        health = json.load(urllib.request.urlopen(f"{base}/health"))
        assert health["status"] == "ok"
        spk = json.load(urllib.request.urlopen(f"{base}/speakers"))
        assert spk == {"A": 0, "B": 1, "C": 2}

        buf = io.BytesIO()
        pcm = (np.sin(np.linspace(0, 80, 1200)) * 0.5 * 32767).astype(
            np.int16)
        wavfile.write(buf, 8000, pcm)
        req = urllib.request.Request(
            f"{base}/convert?target=B", data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req) as resp:
            assert resp.headers["Content-Type"] == "audio/wav"
            sr, out = wavfile.read(io.BytesIO(resp.read()))
        assert sr == 8000 and out.size > 0

        # mel-level API returns a loadable .npy float32 matrix
        req = urllib.request.Request(
            f"{base}/convert?target=B&mel=1", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req) as resp:
            mel = np.load(io.BytesIO(resp.read()))
        assert mel.ndim == 2 and mel.shape[1] == 10

        # error paths: bad target → 400 json, not a crash
        req = urllib.request.Request(
            f"{base}/convert?target=nope", data=buf.getvalue(),
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400

        stats = json.load(urllib.request.urlopen(f"{base}/stats"))
        assert stats["requests"] >= 2
    finally:
        httpd.shutdown()
        eng.close()


def test_doctor_url_check_against_live_server(toy_engine_parts):
    """vae-npvc-doctor --url probes a running serve endpoint (deployment
    triage; bin/doctor._check_url)."""
    from vae_npvc_tpu.bin.doctor import _check_url
    from vae_npvc_tpu.bin.serve import serve

    eng = _engine(toy_engine_parts, vocoder="none")
    httpd = serve(eng, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        status, detail = _check_url(f"http://127.0.0.1:{port}", 30)
        assert status == "ok", detail
        assert "3 target speaker(s)" in detail
    finally:
        httpd.shutdown()
        eng.close()
    status, detail = _check_url("http://127.0.0.1:1", 10)
    assert status == "FAIL" and "unreachable" in detail


def test_engine_jpwg_vocoder(toy_engine_parts, tmp_path):
    """The native-vocoder backend: forge a tiny JPWG checkpoint, engine
    synthesizes hop-aligned finite audio through the chunked-halo path."""
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
        wav = (rng.normal(size=(1200,)) * 0.1).astype(np.float32)
        out, fs = eng.convert(wav, 8000, "A")
        T_true = features.num_frames(1200, 32)
        assert out.shape == (T_true * 32,)
        assert np.all(np.isfinite(out))
    finally:
        eng.close()


def test_engine_bundle_backend_matches_converter_backend(toy_engine_parts,
                                                         tmp_path):
    """Engine over an exported StableHLO bundle == engine over the live
    model (mel-level, same request), and the bundle's embedded speaker map
    is picked up when none is passed."""
    from vae_npvc_tpu.infer.export_serving import export_bundle

    cfg, ck, stats = toy_engine_parts
    export_bundle(cfg, ck, tmp_path / "bundle", buckets=[32, 64],
                  batch_size=4, n_targets=1, platforms=("cpu",),
                  spk2spk_id={"A": 0, "B": 1, "C": 2})

    eng_live = _engine(toy_engine_parts)
    eng_art = ConversionEngine(None, None, stats,
                               bundle=tmp_path / "bundle", feature=FEAT,
                               vocoder="none", bucket_frames=32,
                               batch_window_ms=30.0)
    try:
        assert eng_art.resolve_target("B") == 1   # map from the bundle
        assert eng_art.iteration == 1
        rng = np.random.default_rng(5)
        wav = rng.normal(size=(1700,)).astype(np.float32) * 0.1
        mel_live, _ = eng_live.convert(wav, 8000, "B", return_mel=True)
        mel_art, _ = eng_art.convert(wav, 8000, "B", return_mel=True)
        assert mel_art.shape == mel_live.shape
        # batch padding differs (bundle pads to its exported batch), so
        # equality is ulp-level, not bit-level
        np.testing.assert_allclose(mel_art, mel_live, rtol=1e-5, atol=1e-5)
    finally:
        eng_live.close()
        eng_art.close()


def test_batcher_pads_batch_to_pow2(toy_engine_parts):
    """Coalesced groups pad the batch axis to the next power of two (first
    row repeated) so the live backend compiles at most log2(max_batch)+1
    batch shapes per bucket — measured on-chip as a 13× concurrent-
    throughput cliff otherwise. Results must stay per-request exact."""
    eng = _engine(toy_engine_parts, max_batch=8, batch_window_ms=200.0)
    try:
        seen = []
        inner = eng.batcher.runner

        def spy(feats, tgts, lengths):
            seen.append(feats.shape[0])
            return inner(feats, tgts, lengths)

        eng.batcher.runner = spy
        rng = np.random.default_rng(4)
        feats = [rng.normal(size=(32, 10)).astype(np.float32)
                 for _ in range(3)]
        # 3 submissions inside one window → one group of 3 → padded to 4
        futs = [eng.batcher.submit(f, 32, i) for i, f in enumerate(feats)]
        outs = [f.result() for f in futs]
        assert seen == [4]
        for i, (f, o) in enumerate(zip(feats, outs)):
            solo = eng.batcher.submit(f, 32, i).result()
            # B=4 vs B=1 executables: same math, float-level tiling noise
            np.testing.assert_allclose(o, solo, rtol=1e-5, atol=1e-6)
        assert seen[1:] == [1, 1, 1]          # singles stay batch-1
    finally:
        eng.close()


def test_engine_data_parallel_matches_single(toy_engine_parts):
    """data_parallel=True shards coalesced infer batches over the 8-device
    CPU mesh (batch padded to a device-count multiple); results match the
    single-device engine, and bundles reject the flag."""
    import jax

    n_dev = len(jax.devices())
    eng_dp = _engine(toy_engine_parts, data_parallel=True,
                     max_batch=max(8, n_dev), batch_window_ms=300.0)
    eng = _engine(toy_engine_parts)
    try:
        assert eng_dp.batcher.pad_multiple == n_dev
        rng = np.random.default_rng(9)
        wavs = [rng.normal(size=(700 + 60 * i,)).astype(np.float32) * 0.1
                for i in range(3)]
        eng_dp.warmup(1)
        with ThreadPoolExecutor(3) as ex:
            outs = list(ex.map(
                lambda i: eng_dp.convert(wavs[i], 8000, i % 2,
                                         return_mel=True)[0], range(3)))
        for i, o in enumerate(outs):
            ref, _ = eng.convert(wavs[i], 8000, i % 2, return_mel=True)
            np.testing.assert_allclose(o, ref, rtol=1e-5, atol=1e-6)

        with pytest.raises(ValueError, match="single-device"):
            ConversionEngine(None, None, np.zeros((2, 11)),
                             bundle="/nonexistent", data_parallel=True)
    finally:
        eng_dp.close()
        eng.close()


def test_mel_frontend_cpu_fallback(toy_engine_parts):
    """A failing device front-end must not kill the request — every device
    stage (fbank, infer, GL) carries the same CPU retry."""
    eng = _engine(toy_engine_parts)
    try:
        def boom(xp):
            raise RuntimeError("UNIMPLEMENTED: TPU backend error")

        eng._jits["mel"] = boom
        wav = (np.random.default_rng(6).normal(size=(1500,)) * 0.1
               ).astype(np.float32)
        mel, fs = eng.convert(wav, 8000, "A", return_mel=True)
        assert fs == 8000 and mel.ndim == 2 and np.isfinite(mel).all()
    finally:
        eng.close()


def test_engine_requires_backend():
    with pytest.raises(ValueError, match="bundle"):
        ConversionEngine(None, None, np.zeros((2, 11)))


def test_engine_single_bucket_bundle_warmup_and_guards(toy_engine_parts,
                                                       tmp_path):
    """A one-bucket bundle: warmup(2) must not overshoot the bucket list,
    in-range requests route via the bundle's own buckets, and speakers()
    falls back to the exported y_num when no map is embedded."""
    from vae_npvc_tpu.infer.export_serving import export_bundle

    cfg, ck, stats = toy_engine_parts
    export_bundle(cfg, ck, tmp_path / "b1", buckets=[64], batch_size=4,
                  platforms=("cpu",))
    eng = ConversionEngine(None, None, stats, bundle=tmp_path / "b1",
                           feature=FEAT, vocoder="none",
                           batch_window_ms=30.0)
    try:
        assert eng.speakers() == {"0": 0, "1": 1, "2": 2}   # from y_num
        eng.warmup(2)                    # clamps to the 1 exported bucket
        rng = np.random.default_rng(7)
        mel, _ = eng.convert(rng.normal(size=(1500,)).astype(np.float32),
                             8000, 1, return_mel=True)
        assert np.isfinite(mel).all()
        with pytest.raises(ValueError, match="largest exported bucket"):
            eng.convert(rng.normal(size=(9000,)).astype(np.float32),
                        8000, 1, return_mel=True)
    finally:
        eng.close()


def test_http_prometheus_metrics(toy_engine_parts):
    from vae_npvc_tpu.bin.serve import serve

    eng = _engine(toy_engine_parts)
    httpd = serve(eng, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(9)
        eng.convert(rng.normal(size=(900,)).astype(np.float32) * 0.1,
                    8000, "A", return_mel=True)
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics").read().decode()
        assert "# TYPE vae_npvc_requests counter" in body
        assert "vae_npvc_requests 1" in body
        assert "vae_npvc_latency_ms_p50" in body
    finally:
        httpd.shutdown()
        eng.close()


def test_prom_num_exact():
    """Counter formatting must be exact — %g freezes counters above 1e6."""
    from vae_npvc_tpu.bin.serve import _prom_num

    assert _prom_num(10_000_001) == "10000001"
    assert _prom_num(3.0) == "3"
    assert _prom_num(12.345678901234) == "12.345678901234"
