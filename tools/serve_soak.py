"""Sustained-load serving soak (VERDICT r3 item 7a).

Drives the ConversionEngine under mixed load for ``--minutes`` wall-clock:
``--clients`` threads each looping convert() calls over a mix of utterance
lengths (2s/4s/6s — three compiled buckets), plus one streaming client
feeding 100 ms chunks through a StreamingSession per iteration. Records a
per-30s-window series of throughput, p50/p99 latency, host RSS and device
HBM, then asserts the stability claims the serving story rests on:

- RSS growth from the first to the last window below ``--max_rss_growth_mb``
  (no leak in the coalescing batcher / bucket caches / streaming sessions);
- HBM in-use stable (no per-request device-buffer leak);
- p99 in the last window within 3x the first window's (no queue collapse).

Exit code 1 on any violated claim — usable in CI against the tiny CPU mode
(``--tiny --minutes 0.5``) and on-chip for the real soak.

Usage:
  python tools/serve_soak.py [--minutes 7] [--clients 6] [--vocoder none]
      [--bundle] [--tiny] [--out /tmp/onchip/soak.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.serve_bench import build_engine


def _rss_mb():
    for line in open("/proc/self/status"):
        if line.startswith("VmRSS:"):
            return int(line.split()[1]) / 1024.0
    return float("nan")


def _hbm_mb():
    try:
        import jax

        stats = jax.devices()[0].memory_stats()
        return stats.get("bytes_in_use", 0) / 1e6
    except Exception:  # noqa: BLE001 — backend without memory_stats
        return float("nan")


def soak(eng, minutes, clients, window_s=30.0, stream=True):
    lengths = [2.0, 4.0, 6.0]
    n_spk = max(1, len(eng.speakers()))
    rng = np.random.default_rng(0)
    wavs = {s: (rng.normal(size=(int(s * eng.fs),)) * 0.1).astype(np.float32)
            for s in lengths}
    for s in lengths:                     # compile each bucket untimed
        eng.convert(wavs[s], eng.fs, 0)

    stop = threading.Event()
    lock = threading.Lock()
    lat: list = []            # (t_end, latency_s, audio_s)
    errors: list = []

    def client(i):
        k = 0
        while not stop.is_set():
            s = lengths[(i + k) % len(lengths)]
            t0 = time.perf_counter()
            try:
                out, _ = eng.convert(wavs[s], eng.fs, (i + k) % n_spk)
                assert np.all(np.isfinite(np.asarray(out)))
            except Exception as e:  # noqa: BLE001 — recorded, fails the soak
                with lock:
                    errors.append(f"{type(e).__name__}: {e}")
                return
            with lock:
                lat.append((time.perf_counter(), time.perf_counter() - t0, s))
            k += 1

    def stream_client():
        from vae_npvc_tpu.serve.streaming import StreamingSession

        wav = wavs[4.0]
        feed = eng.fs // 10
        while not stop.is_set():
            t0 = time.perf_counter()
            try:
                sess = StreamingSession(eng, 0, eng.fs)
                for a in range(0, wav.size, feed):
                    sess.feed(wav[a:a + feed])
                for _at, _w in sess.finish():
                    pass
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(f"stream: {type(e).__name__}: {e}")
                return
            with lock:
                lat.append((time.perf_counter(), time.perf_counter() - t0,
                            4.0))

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(clients)]
    if stream:
        threads.append(threading.Thread(target=stream_client, daemon=True))
    t_start = time.perf_counter()
    rss0 = _rss_mb()
    for t in threads:
        t.start()

    windows = []
    deadline = t_start + minutes * 60.0
    while time.perf_counter() < deadline and not errors:
        time.sleep(min(window_s, max(0.5, deadline - time.perf_counter())))
        now = time.perf_counter()
        with lock:
            cur = [(t, d, s) for (t, d, s) in lat if t > now - window_s]
        ls = np.asarray([d for (_, d, _) in cur]) if cur else np.asarray(
            [np.nan])
        windows.append({
            "t_s": round(now - t_start, 1),
            "rps": round(len(cur) / window_s, 2),
            "audio_s_per_s": round(sum(s for (_, _, s) in cur) / window_s,
                                   1),
            "p50_ms": round(float(np.nanpercentile(ls, 50)) * 1e3, 1),
            "p99_ms": round(float(np.nanpercentile(ls, 99)) * 1e3, 1),
            "rss_mb": round(_rss_mb(), 1),
            "hbm_mb": round(_hbm_mb(), 1),
        })
        print(json.dumps(windows[-1]), flush=True)
    stop.set()
    for t in threads:
        t.join(timeout=60)

    return {"windows": windows, "errors": errors, "rss0_mb": round(rss0, 1),
            "total_requests": len(lat)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=7.0)
    ap.add_argument("--clients", type=int, default=6)
    ap.add_argument("--vocoder", default="none",
                    choices=("gl", "none", "jpwg"))
    ap.add_argument("--window_ms", type=float, default=5.0)
    ap.add_argument("--bundle", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--no_stream", action="store_true")
    ap.add_argument("--max_rss_growth_mb", type=float, default=256.0)
    ap.add_argument("--max_hbm_growth_mb", type=float, default=64.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    eng = build_engine(args.vocoder, args.window_ms, tiny=args.tiny,
                       bundle=args.bundle)
    try:
        result = soak(eng, args.minutes, args.clients,
                      window_s=min(30.0, args.minutes * 30),
                      stream=not args.no_stream)
    finally:
        eng.close()

    ok = not result["errors"]
    w = result["windows"]
    verdicts = {}
    if len(w) >= 2:
        verdicts["rss_growth_mb"] = round(w[-1]["rss_mb"] - w[0]["rss_mb"],
                                          1)
        verdicts["rss_ok"] = (verdicts["rss_growth_mb"]
                              <= args.max_rss_growth_mb)
        hbm = [x["hbm_mb"] for x in w if np.isfinite(x["hbm_mb"])]
        if len(hbm) >= 2:
            verdicts["hbm_growth_mb"] = round(hbm[-1] - hbm[0], 1)
            verdicts["hbm_ok"] = (verdicts["hbm_growth_mb"]
                                  <= args.max_hbm_growth_mb)
        verdicts["p99_first_ms"] = w[0]["p99_ms"]
        verdicts["p99_last_ms"] = w[-1]["p99_ms"]
        verdicts["p99_ok"] = w[-1]["p99_ms"] <= 3.0 * w[0]["p99_ms"]
        ok = ok and all(v for k, v in verdicts.items()
                        if k.endswith("_ok"))
    result["verdicts"] = verdicts
    result["ok"] = ok
    print(json.dumps({"ok": ok, **verdicts,
                      "total_requests": result["total_requests"],
                      "errors": result["errors"][:3]}), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
