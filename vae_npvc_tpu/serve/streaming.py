"""Streaming conversion sessions over :class:`serve.engine.ConversionEngine`.

The reference's inference is strictly offline (vae_npvc/bin/decode.py over
trials files); this module is the serving subsystem's streaming front: a
client feeds audio in chunks and receives converted audio back in chunks,
with every stage that *can* run incrementally doing so:

- **Ingest (incremental, bit-exact)**: log-mel frames are computed while
  audio is still arriving. Frame ``t`` of the offline transform reads
  canvas samples ``[t·hop − p, t·hop + p)`` (p = n_fft//2, centered STFT
  with reflect padding, data/features.py:102-147), so it is fully
  determined — including the left reflect edge — once ``t·hop + p``
  samples have been received; those frames are emitted block-by-block
  through ONE fixed-shape jitted executable (``center=False`` framing with
  host-assembled padding) and are bitwise equal to the offline
  ``logmelspectrogram`` rows by construction: identical frame content,
  identical per-row FFT/mel math.
- **Convert (utterance-end)**: the model's GroupNorm statistics are global
  over the utterance's time axis by reference semantics
  (vae_npvc/model/layers.py:129-249 torch GroupNorm over full T), so mel
  conversion runs once at :meth:`finish` — through the engine's coalescing
  batcher, same executable as offline requests.
- **Synthesize (streamed)**: the native JPWG vocoder emits audio chunk by
  chunk (infer/vocoder.py ``jpwg_synthesize_stream`` — exact on kept
  samples, conv-locality halo), so the first audio leaves the server after
  one chunk instead of after full synthesis. Griffin-Lim is a global
  iterative transform (no exact streaming exists); its output is chunked
  after synthesis for a uniform response protocol.

Exactness contract (pinned by tests/test_streaming.py): for the same bytes,
``StreamingSession`` output == ``engine.convert`` output, row for row and
sample for sample (up to executable-shape float noise on the vocoder path).
"""

from __future__ import annotations

import time

import numpy as np

from ..data import cmvn as cmvn_mod
from ..data import features

__all__ = ["StreamingSession"]


class StreamingSession:
    """One streaming conversion request.

    Usage::

        s = StreamingSession(engine, target="TEF1", sr=24000)
        for chunk in incoming_audio:
            s.feed(chunk)                     # mel frames accrue here
        for wav_piece in s.finish():          # convert + streamed synthesis
            send(wav_piece)

    Parameters
    ----------
    engine : ConversionEngine
    target : speaker name or integer id (resolved immediately — unknown
        targets fail before any audio is buffered)
    sr : int
        Input sample rate. When it differs from the engine's rate the
        whole-signal polyphase resample (data/features.resample) only
        matches the offline path if run over the complete signal, so the
        front-end falls back to buffer-at-finish (documented, not
        incremental).
    block_frames : int
        Mel frames per front-end dispatch; one compiled shape per value.
    out_chunk_frames : int
        Output granularity in mel frames (``× hop`` samples per yielded
        wav chunk). Defaults to the engine's ``bucket_frames``.
    chunk_frames : int or None
        ``None`` (default) = exact mode: conversion runs once at
        :meth:`finish` with utterance-global GroupNorm statistics —
        bit-identical to offline.  An int enables APPROXIMATE chunked
        conversion: mel chunk ``k`` (frames ``[kC, (k+1)C)``) is converted
        as soon as ``(k+1)·C + lookahead`` mel frames exist, by running the
        model on the prefix ``[0, (k+1)C + lookahead)`` through the same
        masked bucketed executables (masked GroupNorm statistics over the
        prefix — tests/test_masked_inference.py) and emitting only chunk
        ``k``'s rows.  Conversion therefore overlaps ingest, and the
        only deviation from offline output is GroupNorm statistics
        truncated to the prefix instead of the full utterance (the convs
        themselves see ``lookahead`` future frames — exact once lookahead
        covers the receptive field).  Deviation-vs-lookahead curve:
        tools/stream_approx_curve.py / docs/SERVING.md.  The reference has
        no streaming at all (reference decoder/basic.py:58-75, serial
        full-utterance).
    lookahead_frames : int
        Future-context frames each chunk's prefix extends past its end
        (chunked mode only). Larger = closer to offline, higher latency.
    """

    def __init__(self, engine, target, sr, *, block_frames=64,
                 out_chunk_frames=None, chunk_frames=None,
                 lookahead_frames=64):
        self.engine = engine
        self.tgt = engine.resolve_target(target)
        self.sr = int(sr)
        self.fs = engine.fs
        self.hop = engine.n_shift
        feat = engine.feature
        self.n_fft = int(feat["n_fft"])
        self.pad = self.n_fft // 2
        self.n_mels = int(feat["n_mels"])
        self.block_frames = int(block_frames)
        self.out_chunk_frames = int(out_chunk_frames
                                    or engine.bucket_frames)
        self._incremental = self.sr == self.fs
        self._buf = np.zeros((1 << 14,), np.float32)
        self._n = 0                      # received samples (engine rate)
        # raw log-mel accumulates as a block list (amortized O(T), like the
        # doubling wav buffer — a per-block np.concatenate would be O(T²))
        self._mel_blocks: list = []
        self._mel_frames = 0
        self._done = False
        self.chunk_frames = None if chunk_frames is None else int(chunk_frames)
        self.lookahead_frames = int(lookahead_frames)
        if self.chunk_frames is not None and self.chunk_frames <= 0:
            raise ValueError(f"chunk_frames must be > 0 "
                             f"(got {self.chunk_frames}); use None for "
                             "exact utterance-end conversion")
        if self.lookahead_frames < 0:
            raise ValueError(
                f"lookahead_frames must be >= 0 (got {self.lookahead_frames})")
        self._conv_blocks: list = []     # converted mel chunks (approx mode)
        self._conv_frames = 0            # frames already converted

    # ------------------------------------------------------------- ingest
    @property
    def frames_ready(self) -> int:
        """Mel frames already computed (incremental progress signal)."""
        return self._mel_frames

    def feed(self, samples):
        """Append an audio chunk (1-D float array at ``sr``)."""
        if self._done:
            raise RuntimeError("session already finished")
        # at sr != fs the raw-rate audio only buffers here; it is resampled
        # as a whole at finish() so the polyphase filter sees the same
        # signal as the offline path
        x = np.asarray(samples, np.float32).ravel()
        if x.size:
            need = self._n + x.size
            if need > self._buf.size:
                grow = max(need, 2 * self._buf.size)
                nb = np.zeros((grow,), np.float32)
                nb[:self._n] = self._buf[:self._n]
                self._buf = nb
            self._buf[self._n:self._n + x.size] = x
            self._n += x.size
        if self._incremental:
            self._drain_safe_frames()
            if self.chunk_frames is not None:
                self._convert_ready_chunks()

    def _drain_safe_frames(self):
        """Emit every complete block of frames whose windows are fully
        covered by received samples (frame t needs t·hop + pad of them)."""
        while True:
            t0 = self._mel_frames
            t1 = t0 + self.block_frames
            # last frame of the block must be safe: (t1-1)·hop + pad < n
            if (t1 - 1) * self.hop + self.pad >= self._n:
                return
            self._emit_block(t0, self._received_window(t0, t1))

    def _received_window(self, t0, t1):
        """Samples feeding frames [t0, t1) — canvas coords
        [t0·hop − pad, (t1−1)·hop + pad) — from received audio only
        (callers guarantee coverage); the left reflect edge matches the
        offline jnp.pad(mode='reflect')."""
        lo = t0 * self.hop - self.pad
        hi = (t1 - 1) * self.hop + self.pad
        if lo >= 0:
            return self._buf[lo:hi].copy()
        out = np.empty((hi - lo,), np.float32)
        out[:-lo] = self._buf[1:1 - lo][::-1]          # reflect: x[-j]=x[j]
        out[-lo:] = self._buf[:hi]
        return out

    def _canvas_window(self, t0, t1, L, n_pad):
        """Same span assembled from the FULL offline canvas (x then zeros to
        n_pad, reflect-padded both sides) — used at finish() for the tail
        frames the incremental rule could not prove safe. Coords past the
        right reflect edge (only reachable inside rows ≥ T_true, which are
        discarded) are zero-filled."""
        lo = t0 * self.hop - self.pad
        hi = (t1 - 1) * self.hop + self.pad
        idx = np.arange(lo, hi)
        idx = np.where(idx < 0, -idx, idx)                   # left reflect
        idx = np.where(idx >= n_pad, 2 * (n_pad - 1) - idx,  # right reflect
                       idx)
        valid = (idx >= 0) & (idx < L)
        out = np.zeros((hi - lo,), np.float32)
        out[valid] = self._buf[idx[valid]]
        return out

    def _block_jit(self):
        import jax

        key = ("stream_mel", self.block_frames)
        fn = self.engine._jits.get(key)
        if fn is None:
            feat = {k: v for k, v in self.engine.feature.items()
                    if k != "fs"}
            fn = jax.jit(lambda w: features.logmelspectrogram(
                w, fs=self.fs, **feat, center=False))
            self.engine._jits[key] = fn
        return fn

    def _emit_block(self, t0, window):
        try:
            mel = np.asarray(self._block_jit()(window[None]))[0]
        except Exception:  # noqa: BLE001 — device failure: CPU retry,
            # same policy as every other device stage (engine._mel_batch)
            import jax
            feat = {k: v for k, v in self.engine.feature.items()
                    if k != "fs"}
            with jax.default_device(jax.devices("cpu")[0]):
                mel = np.asarray(features.logmelspectrogram(
                    window[None], fs=self.fs, **feat, center=False))[0]
        assert mel.shape == (self.block_frames, self.n_mels)
        assert t0 == self._mel_frames
        self._mel_blocks.append(mel)
        self._mel_frames += self.block_frames

    # ------------------------------------------- approximate chunked mode
    @property
    def converted_frames(self) -> int:
        """Mel frames already converted during ingest (chunked mode)."""
        return self._conv_frames

    def _convert_prefix(self, end, pe):
        """Convert prefix ``[0, pe)`` through the engine's masked bucketed
        executable (GroupNorm statistics over the prefix, lengths-masked
        exactly as any short utterance) and keep rows
        ``[self._conv_frames, end)``."""
        eng = self.engine
        mel_raw = np.concatenate(self._mel_blocks, axis=0)[:pe]
        T_pad = eng._pick_pad(pe)
        feats = np.zeros((T_pad, self.n_mels), np.float32)
        feats[:pe] = cmvn_mod.apply(mel_raw, eng.stats)
        out = eng._infer_mel(feats, pe, self.tgt)
        self._conv_blocks.append(
            out[self._conv_frames:end].astype(np.float32))
        self._conv_frames = end

    def _convert_ready_chunks(self):
        """Convert every chunk whose prefix-plus-lookahead has fully
        arrived (called from feed; overlaps conversion with ingest)."""
        C, L = self.chunk_frames, self.lookahead_frames
        while self._mel_frames >= self._conv_frames + C + L:
            end = self._conv_frames + C
            self._convert_prefix(end, end + L)

    # ------------------------------------------------------------- finish
    def finish(self):
        """End of input: convert and yield output chunks.

        Returns a generator of ``(sample_offset, wav_chunk)`` pairs
        (float32, engine rate); with ``engine.vocoder == 'none'`` a single
        ``(0, mel (T, M))`` pair. The session is closed at the CALL (not at
        first iteration): further ``feed``/``finish`` raise immediately.
        """
        if self._done:
            raise RuntimeError("session already finished")
        self._done = True
        eng = self.engine
        if not self._incremental:
            # no frames were drained incrementally (guarded on sr == fs)
            x = features.resample(self._buf[:self._n], self.sr, self.fs)
            self._buf, self._n = x, x.size
        if self._n == 0:
            raise ValueError("empty waveform")
        return self._finish_gen()

    def _finish_gen(self):
        eng = self.engine
        t0 = time.monotonic()        # server-side latency: convert+vocode
        L = self._n
        T_true = features.num_frames(L, self.hop)
        T_pad = eng._pick_pad(T_true)
        n_pad = T_pad * self.hop - 1
        # tail frames (and, non-incrementally, all frames): full-canvas path
        while self._mel_frames < T_true:
            self._emit_block(self._mel_frames, self._canvas_window(
                self._mel_frames, self._mel_frames + self.block_frames,
                L, n_pad))
        mel_raw = np.concatenate(self._mel_blocks, axis=0)

        if self.chunk_frames is not None:
            # approximate mode: flush the tail chunks (prefixes clipped to
            # the utterance — the final chunk's statistics are exact)
            while self._conv_frames < T_true:
                end = min(T_true, self._conv_frames + self.chunk_frames)
                pe = min(T_true, end + self.lookahead_frames)
                self._convert_prefix(end, pe)
            mel_out = (np.concatenate(self._conv_blocks, axis=0)
                       if self._conv_blocks
                       else np.zeros((0, self.n_mels), np.float32))
        else:
            feats = np.zeros((T_pad, self.n_mels), np.float32)
            feats[:T_true] = cmvn_mod.apply(mel_raw[:T_true], eng.stats)
            mel_out = eng._infer_mel(feats, T_true, self.tgt)
        T_out = mel_out.shape[0]

        if eng.vocoder == "none":
            eng._count_request(t0)
            yield 0, mel_out.astype(np.float32)
            return
        if eng.vocoder == "jpwg":
            # chunk-by-chunk synthesis straight off the device (the
            # canvas/noise contract lives in engine._vocode/_JPWG)
            canvas = eng._silence_canvas(mel_out, T_pad)
            yield from self._stream_jpwg(canvas, T_out)
        else:                            # Griffin-Lim: global transform —
            # exact streaming doesn't exist; synthesize via the engine's
            # own path and chunk the result for a uniform protocol
            wav = eng._vocode(mel_out, T_pad)
            step = self.out_chunk_frames * self.hop
            for a in range(0, wav.size, step):
                yield a, wav[a:a + step]
        eng._count_request(t0)

    def _stream_jpwg(self, canvas, T_out):
        from ..infer.vocoder import jpwg_synthesize_stream

        voc = self.engine._voc
        z = voc.noise(canvas.shape[0], self.engine.seed)
        n_keep = T_out * voc.hop
        for at, wav in jpwg_synthesize_stream(
                voc.gen, voc.params, canvas, z,
                chunk_frames=self.out_chunk_frames, halo_frames=voc.halo,
                hop=voc.hop, stop_frame=T_out):
            if at >= n_keep:
                break
            yield at, wav[:n_keep - at].astype(np.float32)
