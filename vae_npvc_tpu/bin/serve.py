"""Online voice-conversion HTTP server over :class:`serve.ConversionEngine`.

The reference has no online serving path — its inference surface is the
batch ``decode.py`` CLI over trials files (reference: vae_npvc/bin/decode.py,
egs/vcc20/vae1/run.sh stages 5-6). This is the production-deployment layer
the task mandates on top of the same model code: a dependency-free threaded
HTTP server (stdlib ``http.server``) whose handler threads submit work to
the engine; the engine's single batcher thread owns the device, coalescing
concurrent requests into batched calls.

Endpoints
---------
``GET  /health``                     liveness + checkpoint iteration
``GET  /speakers``                   target-name → id map
``GET  /stats``                      request/batching/latency counters
``POST /convert?target=NAME``        body = WAV file → converted WAV
``POST /convert?target=NAME&mel=1``  → float32 mel matrix (``.npy`` bytes),
                                     the mel-level API for external vocoders
``POST /stream?target=NAME&sr=RATE`` body = raw mono PCM (``format=i16``
                                     default, or ``f32``), sent with
                                     ``Transfer-Encoding: chunked`` or a
                                     plain Content-Length → chunked
                                     streaming-WAV response: mel frames are
                                     extracted while audio arrives and
                                     (with the jpwg vocoder) audio chunks
                                     leave as synthesized
                                     (serve/streaming.py)

Example::

    vae-npvc-serve --config conf/train_pytorch_vqvae.yaml \
        --checkpoint exp/.../model.loss.best --cmvn dump/.../cmvn.ark \
        --spk2spk_id data/spk2spk_id --port 8080
    curl -s -X POST --data-binary @in.wav \
        'http://localhost:8080/convert?target=TEF1' -o out.wav
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

logger = logging.getLogger("vae_npvc_tpu.serve.http")


def _prom_num(v):
    """Exact Prometheus number formatting: `%g` truncates to 6 significant
    digits, freezing counters above ~1e6 between scrapes — integers are
    emitted exactly, floats at full precision."""
    f = float(v)
    return str(int(f)) if f.is_integer() else repr(f)


def _wav_bytes(x, fs):
    from scipy.io import wavfile

    buf = io.BytesIO()
    pcm = np.clip(np.asarray(x, np.float32), -1.0, 1.0)
    wavfile.write(buf, int(fs), (pcm * 32767.0).astype(np.int16))
    return buf.getvalue()


def _read_wav_bytes(body):
    from scipy.io import wavfile

    sr, data = wavfile.read(io.BytesIO(body))
    if data.dtype.kind == "i":
        data = data.astype(np.float32) / float(np.iinfo(data.dtype).max)
    elif data.dtype.kind == "u":          # 8-bit WAV is unsigned
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:                     # downmix multi-channel
        data = data.mean(axis=1)
    return data, int(sr)


def _streaming_wav_header(fs):
    """RIFF/WAVE header with unknown-length placeholder sizes (0xFFFFFFFF),
    the standard convention for live-stream WAV (receivers read until the
    connection closes)."""
    import struct

    return (b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, int(fs), int(fs) * 2, 2, 16)
            + b"data" + struct.pack("<I", 0xFFFFFFFF))


def _iter_body(handler, chunk_bytes=1 << 15):
    """Yield request-body byte chunks: chunked transfer-encoding framing
    when present (BaseHTTPRequestHandler does not decode it), else
    Content-Length slices."""
    if handler.headers.get("Transfer-Encoding", "").lower() == "chunked":
        while True:
            size_line = handler.rfile.readline(64).strip()
            size = int(size_line.split(b";")[0], 16)
            if size == 0:
                handler.rfile.readline(8)          # trailing CRLF
                return
            remaining = size
            while remaining:
                piece = handler.rfile.read(min(remaining, chunk_bytes))
                if not piece:
                    raise ConnectionError("truncated chunked body")
                remaining -= len(piece)
                yield piece
            handler.rfile.readline(8)              # chunk CRLF
    else:
        length = int(handler.headers.get("Content-Length", 0))
        while length > 0:
            piece = handler.rfile.read(min(length, chunk_bytes))
            if not piece:
                raise ConnectionError("truncated body")
            length -= len(piece)
            yield piece


def make_handler(engine):
    """Build a request-handler class bound to ``engine`` (testable without
    argparse/socket setup in-process)."""

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        # ------------------------------------------------------- plumbing
        def log_message(self, fmt, *args):  # route to logging, not stderr
            logger.info("%s %s", self.address_string(), fmt % args)

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def _error(self, code, msg):
            self._json(code, {"error": msg})

        # ------------------------------------------------------- routes
        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/health":
                self._json(200, {"status": "ok",
                                 "iteration": engine.iteration,
                                 "vocoder": engine.vocoder})
            elif path == "/speakers":
                self._json(200, engine.speakers())
            elif path == "/stats":
                self._json(200, engine.stats_snapshot())
            elif path == "/metrics":
                # Prometheus exposition format (text/plain version 0.0.4)
                # for scrape-based fleet monitoring
                s = engine.stats_snapshot()
                lines = []
                for key, mtype in (("requests", "counter"),
                                   ("infer_calls", "counter"),
                                   ("infer_items", "counter"),
                                   ("mean_batch", "gauge"),
                                   ("latency_ms_p50", "gauge"),
                                   ("latency_ms_p99", "gauge")):
                    v = s.get(key)
                    if v is None:
                        continue
                    lines.append(f"# TYPE vae_npvc_{key} {mtype}")
                    lines.append(f"vae_npvc_{key} {_prom_num(v)}")
                self._send(200, ("\n".join(lines) + "\n").encode(),
                           "text/plain; version=0.0.4")
            else:
                self._error(404, f"no route {path}")

        def do_POST(self):
            url = urlparse(self.path)
            if url.path == "/stream":
                return self._do_stream(url)
            if url.path != "/convert":
                return self._error(404, f"no route {url.path}")
            q = parse_qs(url.query)
            target = q.get("target", [None])[0]
            if target is None:
                return self._error(400, "missing ?target=")
            want_mel = q.get("mel", ["0"])[0] not in ("0", "", "false")
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                return self._error(400, "empty body (expected WAV)")
            body = self.rfile.read(length)
            t0 = time.monotonic()
            try:
                wav, sr = _read_wav_bytes(body)
                out, fs = engine.convert(wav, sr, target,
                                         return_mel=want_mel)
            except KeyError as e:
                return self._error(400, str(e))
            except Exception as e:  # noqa: BLE001 — report, keep serving
                logger.exception("convert failed")
                return self._error(500, f"{type(e).__name__}: {e}")
            ms = (time.monotonic() - t0) * 1e3
            logger.info("convert target=%s in=%.2fs out=%s %.0fms", target,
                        len(wav) / max(sr, 1), out.shape, ms)
            if want_mel:
                buf = io.BytesIO()
                np.save(buf, out.astype(np.float32))
                self._send(200, buf.getvalue(), "application/octet-stream")
            else:
                self._send(200, _wav_bytes(out, fs), "audio/wav")

        # ------------------------------------------------- streaming route
        def _write_chunk(self, data):
            if data:
                self.wfile.write(b"%x\r\n" % len(data) + data + b"\r\n")

        def _stream_error(self, code, msg):
            # every /stream error path may leave request-body bytes unread
            # (pre-body rejects and mid-ingest failures alike): a reused
            # HTTP/1.1 connection would parse the leftover PCM as the next
            # request line, so drop the connection after replying
            self.close_connection = True
            return self._error(code, msg)

        def _do_stream(self, url):
            from ..serve.streaming import StreamingSession

            q = parse_qs(url.query)
            target = q.get("target", [None])[0]
            sr = q.get("sr", [None])[0]
            fmt = q.get("format", ["i16"])[0]
            try:
                sr = int(sr) if sr is not None else None
            except ValueError:
                sr = None
            if target is None or sr is None:
                return self._stream_error(400, "need ?target= and "
                                               "integer ?sr=")
            if fmt not in ("i16", "f32"):
                return self._stream_error(400, f"unknown format {fmt!r}")
            # ?chunk=C[&lookahead=L]: APPROXIMATE chunked conversion —
            # chunks convert while audio still arrives, with GroupNorm
            # statistics over prefix+L frames instead of the utterance
            # (deviation-vs-L curve: docs/SERVING.md). Default = exact mode.
            try:
                chunk = int(q.get("chunk", [0])[0]) or None
                lookahead = int(q.get("lookahead", [64])[0])
            except ValueError:
                return self._stream_error(400, "integer ?chunk=/?lookahead=")
            dtype, width, scale = (
                (np.int16, 2, 1 / 32768.0) if fmt == "i16"
                else (np.float32, 4, 1.0))
            try:
                session = StreamingSession(engine, target, sr,
                                           chunk_frames=chunk,
                                           lookahead_frames=lookahead)
            except (KeyError, ValueError) as e:
                # unknown target / invalid chunk geometry — client error
                return self._stream_error(400, str(e))
            t0 = time.monotonic()
            try:
                carry = b""                # chunk edges can split a sample
                for piece in _iter_body(self):
                    buf = carry + piece
                    cut = len(buf) - len(buf) % width
                    carry = buf[cut:]
                    if cut:
                        session.feed(np.frombuffer(buf[:cut], dtype)
                                     .astype(np.float32) * scale)
            except Exception as e:  # noqa: BLE001 — report, keep serving
                logger.exception("stream ingest failed")
                return self._stream_error(400, f"{type(e).__name__}: {e}")
            if engine.vocoder == "none":
                # mel-only engine: nothing to stream out — finish and ship
                # the float32 mel matrix as .npy bytes (the /convert?mel=1
                # contract)
                try:
                    (_at, mel), = session.finish()
                except Exception as e:  # noqa: BLE001
                    logger.exception("stream convert failed")
                    return self._error(500, f"{type(e).__name__}: {e}")
                buf = io.BytesIO()
                np.save(buf, mel.astype(np.float32))
                return self._send(200, buf.getvalue(),
                                  "application/octet-stream")
            # chunked streaming response: audio leaves as synthesized; any
            # failure past this point can only abort the connection (the 200
            # status line is already on the wire)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            try:
                self._write_chunk(_streaming_wav_header(engine.fs))
                n_out = 0
                for _at, wav in session.finish():
                    pcm = np.clip(wav, -1.0, 1.0)
                    self._write_chunk((pcm * 32767.0).astype("<i2")
                                      .tobytes())
                    n_out += wav.size
                self.wfile.write(b"0\r\n\r\n")
            except Exception:  # noqa: BLE001 — mid-stream: abort connection
                logger.exception("stream emit failed")
                self.close_connection = True
                return
            logger.info("stream target=%s out=%.2fs %.0fms", target,
                        n_out / engine.fs, (time.monotonic() - t0) * 1e3)

    return Handler


def serve(engine, host="0.0.0.0", port=8080):
    """Run the HTTP server (blocking). Returns the server object if you
    need to ``shutdown()`` it from another thread (tests do)."""
    httpd = ThreadingHTTPServer((host, port), make_handler(engine))
    # non-daemon handlers: socketserver only TRACKS non-daemon threads
    # (_Threads.append drops daemons), so server_close() can actually join
    # in-flight requests on graceful shutdown; a hung handler is bounded by
    # the orchestrator's SIGKILL grace period
    httpd.daemon_threads = False
    return httpd


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Online voice-conversion HTTP server")
    p.add_argument("--config", default=None,
                   help="experiment YAML (with --checkpoint; not needed "
                        "with --bundle)")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--bundle", default=None,
                   help="exported serving-bundle dir "
                        "(vae-npvc-export-serving) — serves the serialized "
                        "StableHLO artifacts; replaces --config/--checkpoint")
    p.add_argument("--cmvn", required=True,
                   help="training-time CMVN stats ark")
    p.add_argument("--spk2spk_id", default=None)
    p.add_argument("--vocoder", default="gl",
                   choices=("gl", "jpwg", "none"))
    p.add_argument("--voc_config", default=None)
    p.add_argument("--voc_checkpoint", default=None)
    p.add_argument("--gl_iters", type=int, default=64)
    p.add_argument("--feature", default=None,
                   help="YAML with fs/n_fft/n_shift/n_mels/fmin/fmax "
                        "overrides (default: vcc20 recipe values)")
    p.add_argument("--bucket_frames", type=int, default=None)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--batch_window_ms", type=float, default=5.0)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard coalesced model-infer batches over ALL "
                        "local devices (GSPMD data mesh; live model only)")
    p.add_argument("--warmup_buckets", type=int, default=2,
                   help="bucket shapes to precompile before listening "
                        "(0 = lazy compile on first request)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    args = p.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    from ..serve import ConversionEngine

    feature = None
    if args.feature:
        import yaml

        feature = yaml.safe_load(open(args.feature))
    if args.bundle is None and (args.config is None
                                or args.checkpoint is None):
        p.error("pass --config + --checkpoint, or --bundle")
    engine = ConversionEngine(
        args.config, args.checkpoint, args.cmvn, bundle=args.bundle,
        feature=feature, spk2spk_id=args.spk2spk_id, vocoder=args.vocoder,
        voc_config=args.voc_config, voc_checkpoint=args.voc_checkpoint,
        gl_iters=args.gl_iters, bucket_frames=args.bucket_frames,
        max_batch=args.max_batch, batch_window_ms=args.batch_window_ms,
        data_parallel=args.data_parallel)
    if args.warmup_buckets:
        logger.info("warming up %d bucket shape(s)...", args.warmup_buckets)
        engine.warmup(args.warmup_buckets)
    httpd = serve(engine, args.host, args.port)
    logger.info("listening on %s:%d (targets: %s)", args.host, args.port,
                sorted(engine.speakers()))
    # production shutdown: orchestrators (k8s, systemd) send SIGTERM —
    # drain in-flight requests via shutdown() instead of dying mid-batch
    import signal
    import threading

    def _term(signum, frame):
        logger.info("signal %d: shutting down", signum)
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _term)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        # server_close() joins the tracked handler threads (block_on_close),
        # so in-flight requests actually finish before the engine goes away
        httpd.server_close()
        engine.close()
    logger.info("shutdown complete (%d requests served)",
                engine.stats_snapshot()["requests"])


if __name__ == "__main__":
    main()
