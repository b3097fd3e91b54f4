"""Demo client for the streaming conversion route (bin/serve.py /stream).

Streams a WAV file to the server in real-time-paced chunks (chunked
transfer-encoding, raw int16 PCM) and writes the streamed response WAV as
it arrives, printing time-to-first-audio vs total — the client-side view
of what tools/serve_bench.py measures in-process.

    python tools/stream_client.py in.wav out.wav --target TEF1 \
        --host 127.0.0.1 --port 8080 [--realtime]
"""

from __future__ import annotations

import argparse
import http.client
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("in_wav")
    ap.add_argument("out_wav")
    ap.add_argument("--target", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--chunk_ms", type=float, default=100.0)
    ap.add_argument("--realtime", action="store_true",
                    help="pace chunks at the audio rate (live-mic analog)")
    args = ap.parse_args()

    from scipy.io import wavfile

    sr, x = wavfile.read(args.in_wav)
    if x.dtype != np.int16:
        x = (np.clip(x.astype(np.float32)
                     / max(1.0, np.abs(x).max()), -1, 1)
             * 32767).astype(np.int16)
    if x.ndim > 1:
        x = x.mean(axis=1).astype(np.int16)

    conn = http.client.HTTPConnection(args.host, args.port)
    conn.putrequest("POST", f"/stream?target={args.target}&sr={sr}")
    conn.putheader("Transfer-Encoding", "chunked")
    conn.endheaders()

    step = max(1, int(sr * args.chunk_ms / 1e3))
    t0 = time.monotonic()
    for a in range(0, x.size, step):
        piece = x[a:a + step].tobytes()
        conn.send(b"%x\r\n" % len(piece) + piece + b"\r\n")
        if args.realtime:
            # send no faster than the audio plays out
            budget = (a + step) / sr
            lag = budget - (time.monotonic() - t0)
            if lag > 0:
                time.sleep(lag)
    conn.send(b"0\r\n\r\n")
    t_sent = time.monotonic()

    resp = conn.getresponse()
    if resp.status != 200:
        raise SystemExit(f"HTTP {resp.status}: {resp.read().decode()}")
    body, first = b"", None
    while True:
        piece = resp.read(1 << 14)
        if not piece:
            break
        if first is None and len(body) > 44:      # past the WAV header
            first = time.monotonic()
        body += piece
    done = time.monotonic()
    with open(args.out_wav, "wb") as f:
        f.write(body)
    n_out = (len(body) - 44) // 2
    print(f"sent {x.size / sr:.2f}s, received {n_out / sr:.2f}s -> "
          f"{args.out_wav}")
    print(f"TTFA {(first or done) - t_sent:.3f}s, total "
          f"{done - t_sent:.3f}s after end of input "
          f"({done - t0:.3f}s wall)")


if __name__ == "__main__":
    main()
