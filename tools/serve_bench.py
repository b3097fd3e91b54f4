"""Serving-path benchmark: end-to-end conversion latency, RTF, coalescing.

Measures the online :class:`serve.ConversionEngine` (wav in → converted wav
out) at the flagship flat-model shape — the serving analog of bench.py's
training number. The model is fresh-init (latency doesn't depend on training
quality); the CMVN stats are synthetic. Reported per leg:

- sequential p50/p99 latency (ms) and RTF for ~2s and ~6s utterances;
- concurrent-load throughput (requests/s) and the achieved mean device
  batch under 8 client threads (the coalescing win).

Usage (on-chip):  python tools/serve_bench.py [--vocoder gl|none]
                  [--out serve_bench.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _fresh_pwg(tmp, tiny):
    """Fresh-init native-vocoder checkpoint (latency doesn't depend on
    training quality). Flagship arch = the published PWG (conf analog of
    egs/vcc20/vae1/conf/train_jpwg.yaml, hop 256 matching the front-end)."""
    from vae_npvc_tpu.train.pwg import PwgTrainer

    if tiny:
        cfg = {"fs": 8000, "n_fft": 64, "n_shift": 32, "n_mels": 10,
               "layers": 4, "stacks": 2, "residual_channels": 8,
               "gate_channels": 16, "skip_channels": 8,
               "upsample_scales": [4, 8], "disc_layers": 3,
               "disc_channels": 8, "discriminator_train_start_steps": 0,
               "stft_loss_params": [[64, 16, 32]], "seed": 0}
    else:
        cfg = {"fs": 24000, "n_fft": 1024, "n_shift": 256, "n_mels": 80,
               "layers": 30, "stacks": 3, "residual_channels": 64,
               "gate_channels": 128, "skip_channels": 64,
               "upsample_scales": [4, 4, 4, 4], "disc_layers": 10,
               "disc_channels": 64, "discriminator_train_start_steps": 0,
               "stft_loss_params": [[1024, 120, 600]], "seed": 0}
    rng = np.random.default_rng(3)
    hop = int(np.prod(cfg["upsample_scales"]))
    pwg = PwgTrainer(cfg)
    pwg.init_state((rng.normal(size=(2, 16 * hop)).astype(np.float32),
                    rng.normal(size=(2, 16, cfg["n_mels"])).astype(
                        np.float32)))
    ck = tmp / "jpwg.ckpt"
    pwg.save_checkpoint(ck)
    del pwg
    return cfg, ck


def build_engine(vocoder, window_ms, tiny=False, bundle=False):
    from __graft_entry__ import _flagship_config
    from vae_npvc_tpu.serve import ConversionEngine
    from vae_npvc_tpu.train.trainer import Trainer

    feature = None
    if tiny:  # CPU smoke mode: toy arch + tiny front-end
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                               / "tests"))
        from toy_config import toy_config

        cfg = toy_config()
        feature = {"fs": 8000, "n_fft": 128, "n_shift": 32, "n_mels": 10,
                   "fmin": 0.0, "fmax": None, "win_length": None}
    else:
        cfg = _flagship_config()
    D = feature["n_mels"] if tiny else 80
    tr = Trainer(cfg)
    rng = np.random.default_rng(0)
    batch = (rng.normal(size=(2, 256, D)).astype(np.float32),
             np.zeros((2,), np.int32))
    tr.init_state(batch)
    tmp = Path(tempfile.mkdtemp(prefix="serve_bench_"))
    ck = tmp / "m.ckpt"
    tr.save_checkpoint(ck)
    del tr
    stats = np.zeros((2, D + 1), np.float64)
    stats[0, :-1] = -3.0 * 1000
    stats[0, -1] = 1000
    stats[1, :-1] = (1.0 + 9.0) * 1000
    voc_kw = {}
    if vocoder == "jpwg":
        voc_cfg, voc_ck = _fresh_pwg(tmp, tiny)
        voc_kw = {"voc_config": voc_cfg, "voc_checkpoint": voc_ck}
    if bundle:
        # artifact-served leg: export the same checkpoint to a StableHLO
        # bundle and run model inference through it (the deployment mode)
        from vae_npvc_tpu.infer.export_serving import export_bundle

        bdir = tmp / "bundle"
        # buckets must cover the 6s latency leg: 6s ≈ 1501 frames at the
        # tiny front-end (fs 8k / shift 32), ≈ 563 at the flagship (24k/256)
        export_bundle(cfg, ck, bdir,
                      buckets=[(i + 1) * (512 if tiny else 256)
                               for i in range(4)],
                      batch_size=8)
        return ConversionEngine(None, None, stats, bundle=bdir,
                                vocoder=vocoder, feature=feature,
                                batch_window_ms=window_ms,
                                gl_iters=4 if tiny else 64, **voc_kw)
    return ConversionEngine(cfg, ck, stats, vocoder=vocoder,
                            feature=feature, batch_window_ms=window_ms,
                            gl_iters=4 if tiny else 64, **voc_kw)


def latency_leg(eng, seconds, n=20):
    rng = np.random.default_rng(1)
    wav = (rng.normal(size=(int(seconds * eng.fs),)) * 0.1).astype(np.float32)
    eng.convert(wav, eng.fs, 0)      # untimed: compile this leg's bucket
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        out, _ = eng.convert(wav, eng.fs, 0)
        assert np.all(np.isfinite(np.asarray(out)))
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    return {"audio_s": seconds,
            "p50_ms": float(np.percentile(lat, 50)),
            "p99_ms": float(np.percentile(lat, 99)),
            "rtf_p50": float(np.percentile(lat, 50) / 1e3 / seconds)}


def concurrent_leg(eng, seconds=2.0, clients=8, per_client=8):
    rng = np.random.default_rng(2)
    wavs = [(rng.normal(size=(int(seconds * eng.fs),)) * 0.1
             ).astype(np.float32) for _ in range(clients)]
    calls0, items0 = eng.batcher.calls, eng.batcher.items

    def client(i):
        for _ in range(per_client):
            # spread requests over the model's REAL speaker range —
            # a fixed modulo can exceed a small y_num (the engine now
            # rejects out-of-range ids instead of gathering garbage)
            eng.convert(wavs[i], eng.fs, i % max(1, len(eng.speakers())))

    t0 = time.perf_counter()
    with ThreadPoolExecutor(clients) as ex:
        list(ex.map(client, range(clients)))
    wall = time.perf_counter() - t0
    n = clients * per_client
    calls = eng.batcher.calls - calls0
    return {"clients": clients, "requests": n,
            "throughput_rps": n / wall,
            "mean_device_batch": (eng.batcher.items - items0) / max(calls, 1),
            "audio_s_per_wall_s": n * seconds / wall}


def stream_leg(eng, seconds, n=10, out_chunk_frames=None,
               chunk_frames=None, lookahead_frames=64):
    """StreamingSession latency split: time-to-first-audio vs total.

    The streaming win is TTFA — with the jpwg vocoder the first chunk
    leaves after one vocoder dispatch instead of after full synthesis;
    Griffin-Lim (global transform) has TTFA ≈ total by construction.
    With chunk_frames set (approximate chunked conversion, round 5) most
    mel chunks convert DURING feed, so the after-last-byte latency drops
    to the tail conversion + synthesis; feed_ms grows by the inline
    conversions — both are reported.
    """
    from vae_npvc_tpu.serve.streaming import StreamingSession

    rng = np.random.default_rng(4)
    wav = (rng.normal(size=(int(seconds * eng.fs),)) * 0.1
           ).astype(np.float32)
    feed_chunk = eng.fs // 10                     # 100 ms client chunks

    def run():
        t0 = time.perf_counter()
        s = StreamingSession(eng, 0, eng.fs,
                             out_chunk_frames=out_chunk_frames,
                             chunk_frames=chunk_frames,
                             lookahead_frames=lookahead_frames)
        for a in range(0, wav.size, feed_chunk):
            s.feed(wav[a:a + feed_chunk])
        t_fed = time.perf_counter()
        ttfa = total = None
        n_chunks = 0
        for _at, w in s.finish():
            if ttfa is None:
                ttfa = time.perf_counter() - t_fed
            n_chunks += 1
        total = time.perf_counter() - t_fed
        return ttfa * 1e3, total * 1e3, n_chunks, (t_fed - t0) * 1e3

    run()                                         # untimed compile pass
    rows = [run() for _ in range(n)]
    ttfa = np.asarray([r[0] for r in rows])
    total = np.asarray([r[1] for r in rows])
    return {"audio_s": seconds, "chunks": rows[0][2],
            "feed_ms_p50": float(np.percentile([r[3] for r in rows], 50)),
            "ttfa_ms_p50": float(np.percentile(ttfa, 50)),
            "total_ms_p50": float(np.percentile(total, 50)),
            "rtf_p50": float(np.percentile(total, 50) / 1e3 / seconds)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocoder", default="gl", choices=("gl", "none",
                                                        "jpwg"))
    ap.add_argument("--window_ms", type=float, default=5.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="toy arch on CPU (smoke-test the tool itself)")
    ap.add_argument("--bundle", action="store_true",
                    help="serve through an exported StableHLO bundle "
                         "instead of the live model")
    ap.add_argument("--stream", action="store_true",
                    help="add StreamingSession legs (TTFA vs total; the "
                         "jpwg vocoder is the showcase)")
    ap.add_argument("--stream_chunk", type=int, default=128,
                    help="also measure approximate chunked conversion at "
                         "this chunk size (0 = skip)")
    ap.add_argument("--stream_lookahead", type=int, default=64)
    args = ap.parse_args()

    import jax

    eng = build_engine(args.vocoder, args.window_ms, tiny=args.tiny,
                       bundle=args.bundle)
    n = 5 if args.tiny else 20
    try:
        eng.warmup(3)  # compile the first three bucket shapes
        res = {
            "backend": jax.default_backend(),
            "vocoder": args.vocoder,
            "tiny": args.tiny,
            "bundle": args.bundle,
            "bucket_frames": eng.bucket_frames,
            "sequential": [latency_leg(eng, 2.0, n), latency_leg(eng, 6.0, n)],
            "concurrent": concurrent_leg(eng, per_client=2 if args.tiny else 8),
        }
        if args.stream:
            sn = 3 if args.tiny else 10
            res["stream"] = [stream_leg(eng, 2.0, sn),
                             stream_leg(eng, 6.0, sn)]
            C, L = args.stream_chunk, args.stream_lookahead
            if C:
                res["stream_chunked"] = [
                    stream_leg(eng, 2.0, sn, chunk_frames=C,
                               lookahead_frames=L),
                    stream_leg(eng, 6.0, sn, chunk_frames=C,
                               lookahead_frames=L)]
    finally:
        eng.close()
    print(json.dumps(res, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
