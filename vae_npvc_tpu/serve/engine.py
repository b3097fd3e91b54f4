"""Online conversion engine: wav in → converted wav out, warm and batched.

Serving-oriented re-design of the reference's offline chain (reference:
egs/vcc20/vae1/run.sh stages 5-6 — decode.py over a trials file, then
``apply-cmvn --reverse`` and Griffin-Lim/PWG synthesis as separate job
arrays over ark files). Here the whole chain runs in-process per request:

    resample → log-mel fbank (device) → CMVN apply (host, trivial)
    → model.infer (device, masked+bucketed) → CMVN reverse
    → Griffin-Lim or native JPWG vocoder (device)

TPU-first properties:

- **Few compiled shapes**: requests are padded to ``bucket_frames``
  multiples, so every stage (fbank gather+rfft, model infer, vocoder) hits
  a small, warm set of executables; ``warmup()`` precompiles them before
  the first request. Length masks inside the model make padded runs equal
  unpadded ones (tests/test_masked_inference.py).
- **Request coalescing**: concurrent requests landing in the same bucket
  within ``batch_window_ms`` ride one device call (`_InferBatcher`), so a
  busy server amortizes dispatch + keeps the MXU batch-fed; a lone request
  pays at most the window.
- **Device failure fallback**: model inference inherits the Converter's
  device→CPU retry (the analog of reference decoder/basic.py:27-36).
"""

from __future__ import annotations

import logging
import os
import queue
import threading
import time
from concurrent.futures import Future
from pathlib import Path

import numpy as np

from ..data import cmvn as cmvn_mod
from ..data import features
from ..infer.convert import Converter, _bucket

logger = logging.getLogger("vae_npvc_tpu.serve")

# the vcc20 recipe's front-end settings (egs/vcc20/vae1/run.sh:13-18)
DEFAULT_FEATURE = {
    "fs": 24000, "n_fft": 1024, "n_shift": 256, "n_mels": 80,
    "fmin": 80.0, "fmax": 7600.0, "win_length": None,
}


class _InferBatcher:
    """Coalesces concurrent same-bucket requests into one batched call.

    A single worker thread drains a queue of ``(feats (T_pad, D), length,
    target, Future)`` items: it groups by padded length, waits up to
    ``window_ms`` for more work in the group (stopping early at
    ``max_batch``), then runs ``runner(feats, targets, lengths)`` once for
    the group. One worker also serializes device calls — concurrent HTTP
    threads never contend for the accelerator.
    """

    def __init__(self, runner, max_batch: int = 8, window_ms: float = 5.0,
                 pad_multiple: int = 1):
        self.runner = runner
        self.max_batch = int(max_batch)
        # batch-axis padding floor: a data-parallel serving mesh needs every
        # submitted batch divisible by its device count (non-power-of-two
        # counts work — pow2 rounding is followed by a multiple round-up)
        self.pad_multiple = int(pad_multiple)
        if self.max_batch % self.pad_multiple:
            raise ValueError(f"max_batch {max_batch} not divisible by "
                             f"pad_multiple {pad_multiple}")
        self.window_s = float(window_ms) / 1e3
        self._q: queue.Queue = queue.Queue()
        self.calls = 0                       # batched device calls
        self.items = 0                       # requests served
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="vae-npvc-infer-batcher")
        self._thread.start()

    def submit(self, feats, length, target) -> Future:
        fut: Future = Future()
        self._q.put((feats, int(length), int(target), fut))
        return fut

    def close(self):
        self._q.put(None)
        self._thread.join(timeout=5)

    # ------------------------------------------------------------- worker
    def _take_group(self, first):
        """Collect up to max_batch items sharing first's bucket, waiting at
        most window_s; off-bucket items are put back for the next round."""
        group, stash = [first], []
        deadline = time.monotonic() + self.window_s
        T_pad = first[0].shape[0]
        while len(group) < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                item = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if item is None:
                stash.append(item)
                break
            if item[0].shape[0] == T_pad:
                group.append(item)
            else:
                stash.append(item)
        for item in stash:
            self._q.put(item)
        return group

    def _loop(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            group = self._take_group(item)
            B = len(group)
            # pad the batch axis to the next power of two (first item
            # repeated): the live backend's jitted infer specializes on
            # (B, T) — without this every distinct coalesced group size
            # compiles a fresh executable, measured as a 13× concurrent-
            # throughput cliff vs the fixed-batch bundle backend on-chip
            # (serve_bench 2026-08-19: 3.7 vs 48.6 rps). Row independence
            # (per-utterance masked stats) makes pad rows inert.
            m = self.pad_multiple
            B_pad = min(-(-(1 << (B - 1).bit_length()) // m) * m,
                        self.max_batch)
            pad = [group[0]] * (B_pad - B)
            feats = np.stack([g[0] for g in group] + [p[0] for p in pad])
            lengths = np.asarray([g[1] for g in group]
                                 + [p[1] for p in pad], np.int32)
            tgts = np.asarray([g[2] for g in group]
                              + [p[2] for p in pad], np.int32)
            try:
                out = self.runner(feats, tgts, lengths)
            except Exception as e:  # noqa: BLE001 — deliver to every waiter
                for g in group:
                    g[3].set_exception(e)
                continue
            self.calls += 1
            self.items += B
            for b, g in enumerate(group):
                g[3].set_result(np.asarray(out[b]))


_ARENAS_LIMITED = False


def _limit_malloc_arenas():
    """Cap glibc malloc arenas (mallopt M_ARENA_MAX=2), once per process.

    A multithreaded serving process grows one malloc arena per thread by
    default; mixed-size request buffers then fragment them monotonically —
    measured as ~0.5–1 MB RSS growth PER REQUEST under the sustained-load
    soak (tools/serve_soak.py; 3.3 GB over a 6-minute on-chip run, 6.6 GB
    for the bundle backend) with ZERO Python-level growth (tracemalloc).
    With two arenas the same 2-minute flagship soak measures +0.1 MB
    (vs +52.9). mallopt works at runtime (the MALLOC_ARENA_MAX env var
    must be set before process start, which a library cannot guarantee).
    Set VAE_NPVC_MALLOC_ARENA_MAX=0 to disable, or to another cap.
    """
    global _ARENAS_LIMITED
    if _ARENAS_LIMITED:
        return
    _ARENAS_LIMITED = True
    n = os.environ.get("VAE_NPVC_MALLOC_ARENA_MAX", "2")
    try:
        n = int(n)
    except ValueError:
        return
    if n <= 0:
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-8, n)          # M_ARENA_MAX
    except Exception:  # noqa: BLE001 — non-glibc platforms: no-op
        pass


class ConversionEngine:
    """Warm end-to-end voice-conversion engine for online serving.

    Parameters
    ----------
    config : dict | str | Path | None
        The experiment YAML (reference flat key set) the checkpoint trains.
        May be None when ``bundle`` is given.
    checkpoint : str | Path | None
        ``bin/train.py`` msgpack checkpoint (e.g. ``model.loss.best``).
        May be None when ``bundle`` is given.
    bundle : str | Path, optional
        Exported serving-bundle directory (``vae-npvc-export-serving``);
        model inference then runs the serialized StableHLO artifacts
        instead of building the model — the deployment mode where the
        serving host carries no model code or checkpoint.
    cmvn : str | Path | np.ndarray
        Kaldi CMVN stats ark (``compute_stats`` output) used at training
        time; applied forward on input mels and reversed on outputs
        (reference run.sh:115-120 dump + stage-6 ``apply-cmvn --reverse``).
    feature : dict, optional
        Front-end settings (fs/n_fft/n_shift/n_mels/fmin/fmax/win_length);
        defaults to the vcc20 recipe values (DEFAULT_FEATURE).
    spk2spk_id : dict | str | Path, optional
        Speaker-name → integer-id map (decode-dir contract,
        reference decoder/basic.py:50-53). Without it targets must be
        integer ids.
    vocoder : {"gl", "jpwg", "none"}
        Griffin-Lim (default), the native JAX Parallel WaveGAN, or mel-only.
    """

    def __init__(self, config, checkpoint, cmvn, *, bundle=None,
                 feature=None, spk2spk_id=None, vocoder="gl",
                 voc_config=None, voc_checkpoint=None, gl_iters=64,
                 bucket_frames=None, max_batch=8, batch_window_ms=5.0,
                 seed=0, data_parallel=False):
        import yaml

        _limit_malloc_arenas()

        if config is not None and not isinstance(config, dict):
            config = yaml.safe_load(open(config))
        self.config = config or {}
        self.bundle = None
        mesh = None
        pad_multiple = 1
        if data_parallel:
            # shard every coalesced model-infer batch over ALL local devices
            # (GSPMD 'data' mesh, params replicated — infer/convert.py
            # Converter(mesh=...)): a serving pod converts one batch across
            # its chips. Bundles are exported single-device artifacts.
            if bundle is not None:
                raise ValueError("data_parallel serves the live model; "
                                 "bundles are single-device artifacts")
            from ..parallel.mesh import data_mesh
            mesh = data_mesh()
            pad_multiple = int(mesh.shape["data"])
            # round max_batch up to a submittable multiple (a 12-request
            # cap on an 8-device mesh would otherwise fail the batcher's
            # divisibility check at startup)
            max_batch = -(-max(int(max_batch), pad_multiple)
                          // pad_multiple) * pad_multiple
        if bundle is not None:
            # exported-artifact backend (infer/export_serving.ServingBundle):
            # model inference runs the serialized StableHLO buckets — no
            # model code, experiment YAML, or checkpoint on the serving host
            from ..infer.export_serving import ServingBundle
            self.bundle = ServingBundle(bundle)
            self.converter = None
            self.iteration = int(self.bundle.meta.get("iteration", 0))
            self._min_frames = int(self.bundle.meta.get("min_frames", 1))
            _runner = self.bundle.infer
            max_batch = min(int(max_batch), self.bundle.batch_size)
        else:
            if config is None or checkpoint is None:
                raise ValueError(
                    "pass config + checkpoint, or bundle= (an exported "
                    "serving-bundle directory)")
            self.converter = Converter(self.config, mesh=mesh)
            self.iteration = self.converter.load_checkpoint(checkpoint)
            self._min_frames = self.converter.min_frames
            _runner = self.converter._infer_with_fallback
        self.feature = dict(DEFAULT_FEATURE, **(feature or {}))
        self.fs = int(self.feature["fs"])
        self.n_shift = int(self.feature["n_shift"])
        self.stats = (cmvn if isinstance(cmvn, np.ndarray)
                      else cmvn_mod.read_stats(cmvn))
        self.spk_map = None
        if spk2spk_id is not None:
            if isinstance(spk2spk_id, (str, Path)):
                from ..data import kaldi_io
                spk2spk_id = {k: int(v) for k, v in kaldi_io.load_dict_data(
                    spk2spk_id).items()}
            self.spk_map = dict(spk2spk_id)
        elif self.bundle is not None and self.bundle.spk2spk_id:
            self.spk_map = dict(self.bundle.spk2spk_id)
        self.bucket_frames = int(
            bucket_frames
            or (min(self.bundle.buckets) if self.bundle is not None
                else self.config.get("decode_bucket_size", 256)))
        self.gl_iters = int(gl_iters)
        self.seed = int(seed)
        self.vocoder = vocoder
        self._voc = None
        if vocoder == "jpwg":
            self._voc = _JPWG(voc_config, voc_checkpoint,
                              self.feature["n_mels"])
        elif vocoder not in ("gl", "none"):
            raise ValueError(f"unknown vocoder {vocoder!r}")
        # speaker-id bound for resolve_target's range guard: prefer the
        # model's y_num; fall back to the spk map's densest bound so older
        # bundles without y_num in meta still reject out-of-range ids
        # (the guard exists because an out-of-range id flows through the
        # jitted embedding gather into non-finite audio — serve_soak find)
        self._y_bound = int((self.bundle.meta.get("y_num") or 0)
                            if self.bundle else self.config.get("y_num", 0))
        if not self._y_bound and self.spk_map:
            self._y_bound = max(int(v) for v in self.spk_map.values()) + 1
        if not self._y_bound:
            logger.warning(
                "speaker-id range unknown (no y_num in %s, no spk2spk_id "
                "map): out-of-range numeric target ids cannot be rejected "
                "and may produce non-finite audio",
                "bundle meta" if self.bundle else "config")
        self.batcher = _InferBatcher(_runner, max_batch=max_batch,
                                     window_ms=batch_window_ms,
                                     pad_multiple=pad_multiple)
        self._jits = {}
        self._stats_lock = threading.Lock()
        self.n_requests = 0
        self.latency_ms: list = []           # rolling (last 1024)

    # ------------------------------------------------------------ helpers
    def close(self):
        self.batcher.close()

    def speakers(self):
        if self.spk_map is not None:
            return dict(self.spk_map)
        y_num = (self.bundle.meta.get("y_num") or 0) if self.bundle \
            else self.config.get("y_num", 0)
        return {str(i): i for i in range(int(y_num))}

    def resolve_target(self, target):
        if self.spk_map is not None and str(target) in self.spk_map:
            return self.spk_map[str(target)]
        try:
            idx = int(target)
        except (TypeError, ValueError):
            raise KeyError(
                f"unknown target speaker {target!r}; known: "
                f"{sorted(self.speakers())}") from None
        # range-check numeric ids: an out-of-range id silently produces a
        # garbage/non-finite conversion through the jitted embedding gather
        # (found by tools/serve_soak.py) — reject it at the API edge instead
        if self._y_bound and not 0 <= idx < self._y_bound:
            raise KeyError(f"target speaker id {idx} out of range "
                           f"[0, {self._y_bound})")
        return idx

    def _mel_jit(self):
        import jax

        fn = self._jits.get("mel")
        if fn is None:
            feat = {k: v for k, v in self.feature.items() if k != "fs"}
            fn = jax.jit(lambda w: features.logmelspectrogram(
                w, fs=self.fs, **feat))
            self._jits["mel"] = fn
        return fn

    def _gl_jit(self):
        import jax

        fn = self._jits.get("gl")
        if fn is None:
            feat = {k: v for k, v in self.feature.items() if k != "fs"}
            fn = jax.jit(lambda m: features.griffin_lim(
                m, fs=self.fs, **feat, n_iter=self.gl_iters,
                seed=self.seed))
            self._jits["gl"] = fn
        return fn

    def _mel_batch(self, xp):
        """Front-end with the same device→CPU retry as infer/GL: every
        device stage of the request path survives a wedged accelerator."""
        try:
            return np.asarray(self._mel_jit()(xp))
        except Exception as e:  # noqa: BLE001 — device failure
            import jax
            logger.warning(f"device fbank failed ({type(e).__name__}: "
                           f"{e}); retrying on CPU")
            feat = {k: v for k, v in self.feature.items() if k != "fs"}
            with jax.default_device(jax.devices("cpu")[0]):
                return np.asarray(features.logmelspectrogram(
                    xp, fs=self.fs, **feat))

    def _pick_pad(self, T_true):
        """Padded frame count for a request of ``T_true`` frames."""
        if self.bundle is not None:
            # the exported bucket list IS the shape set — pre-rounding to
            # bucket_frames multiples could overshoot the largest artifact
            return self.bundle.pick_bucket(max(T_true, self._min_frames))
        return _bucket(max(T_true, self._min_frames), self.bucket_frames)

    def _infer_mel(self, feats, T_true, tgt):
        """CMVN-domain padded feats (T_pad, M) → converted log-mel
        (≤T_true, M) through the coalescing batcher + reverse CMVN."""
        out = self.batcher.submit(feats, T_true, tgt).result()
        T_out = min(T_true, out.shape[0])
        return cmvn_mod.apply(out[:T_out], self.stats, reverse=True)

    def _count_request(self, t0):
        with self._stats_lock:
            self.n_requests += 1
            self.latency_ms.append((time.monotonic() - t0) * 1e3)
            if len(self.latency_ms) > 1024:
                del self.latency_ms[:512]

    # ------------------------------------------------------------ pipeline
    def convert(self, wav, sr, target, *, return_mel=False):
        """Convert a waveform to ``target``'s voice.

        ``wav``: 1-D float array (any scale; only the mel front-end sees
        it, matching training where inputs came through make_fbank).
        Returns ``(wav_out, fs)`` — or ``(mel_out (T, M), fs)`` with
        ``return_mel`` (the mel-level API for external vocoders).
        """
        t0 = time.monotonic()
        tgt = self.resolve_target(target)
        x = features.resample(np.asarray(wav, np.float32).ravel(),
                              int(sr), self.fs)
        if x.size == 0:
            raise ValueError("empty waveform")
        T_true = features.num_frames(x.size, self.n_shift)
        T_pad = self._pick_pad(T_true)
        # largest sample count yielding exactly T_pad frames (1 + n//shift),
        # so any true length T_true ≤ T_pad fits without truncation
        n_pad = T_pad * self.n_shift - 1
        xp = np.zeros((1, n_pad), np.float32)
        xp[0, :x.size] = x
        mel = self._mel_batch(xp)[0]                      # (T_pad, M)

        feats = np.zeros_like(mel)
        feats[:T_true] = cmvn_mod.apply(mel[:T_true], self.stats)
        mel_out = self._infer_mel(feats, T_true, tgt)

        if return_mel or self.vocoder == "none":
            result = mel_out.astype(np.float32)
        else:
            result = self._vocode(mel_out, T_pad)
        self._count_request(t0)
        return result, self.fs

    @staticmethod
    def _silence_canvas(mel_out, T_pad):
        """Valid mel placed in a log-mel-silence canvas of the bucket shape
        (log10(EPS) → magnitude EPS contributes nothing) — the synthesis
        contract shared by _vocode and the streaming sessions."""
        canvas = np.full((T_pad, mel_out.shape[1]), np.log10(features.EPS),
                         np.float32)
        canvas[:mel_out.shape[0]] = mel_out
        return canvas

    def _vocode(self, mel_out, T_pad):
        """Synthesize on the BUCKET shape (one executable per bucket) and
        cut the wav to the true length afterwards."""
        T_out = mel_out.shape[0]
        canvas = self._silence_canvas(mel_out, T_pad)
        if self.vocoder == "jpwg":
            wav = self._voc.synthesize(canvas, T_pad, self.seed)
            return wav[:T_out * self._voc.hop].astype(np.float32)
        try:
            wav = np.asarray(self._gl_jit()(canvas[None]))[0]
        except Exception as e:  # noqa: BLE001 — device failure: CPU retry,
            # keeping the server alive (observed: the tunneled TPU backend
            # raised UNIMPLEMENTED on the Griffin-Lim irfft, round 3)
            import jax
            logger.warning(f"device Griffin-Lim failed ({type(e).__name__}:"
                           f" {e}); retrying on CPU")
            feat = {k: v for k, v in self.feature.items() if k != "fs"}
            with jax.default_device(jax.devices("cpu")[0]):
                wav = np.asarray(features.griffin_lim(
                    canvas[None], fs=self.fs, **feat, n_iter=self.gl_iters,
                    seed=self.seed))[0]
        return wav[:T_out * self.n_shift].astype(np.float32)

    def warmup(self, n_buckets=1):
        """Precompile the first ``n_buckets`` bucket shapes end to end."""
        tgt = next(iter(self.speakers().values()), 0)
        if self.bundle is not None:
            # the artifact's own bucket list (asking beyond it is an error)
            pads = self.bundle.buckets[:n_buckets]
        else:
            pads = [i * self.bucket_frames for i in range(1, n_buckets + 1)]
        for T_pad in pads:
            n = (T_pad - 1) * self.n_shift
            self.convert(np.zeros((max(n, self.n_shift),), np.float32),
                         self.fs, tgt)
        # also the coalesced BATCH shapes of the first bucket: the batcher
        # pads groups to pow2-of-device-multiple sizes, and compiling those
        # lazily on first load costs whole requests (measured on-chip:
        # 28 rps with lazy batch shapes vs 48.6 through the fixed-batch
        # bundle). Live backend only — bundles pad internally.
        n_batch = 0
        if pads and self.bundle is None:
            T_pad, D = pads[0], int(self.feature["n_mels"])
            B, shapes = 1, []
            while B < self.batcher.max_batch:
                m = self.batcher.pad_multiple
                B = min(-(-(B * 2) // m) * m, self.batcher.max_batch)
                shapes.append(B)
            for B in shapes:
                self.batcher.runner(
                    np.zeros((B, T_pad, D), np.float32),
                    np.full((B,), tgt, np.int32),
                    np.full((B,), T_pad, np.int32))
            n_batch = len(shapes)
        with self._stats_lock:       # warmup doesn't count as traffic
            self.n_requests = 0
            self.latency_ms.clear()
        logger.info(f"warmup done: {len(pads)} bucket(s) + {n_batch} "
                    "batch shape(s) compiled")

    def stats_snapshot(self):
        with self._stats_lock:
            lat = np.asarray(self.latency_ms, np.float64)
            return {
                "requests": self.n_requests,
                "infer_calls": self.batcher.calls,
                "infer_items": self.batcher.items,
                "mean_batch": (self.batcher.items / self.batcher.calls
                               if self.batcher.calls else 0.0),
                "latency_ms_p50": float(np.percentile(lat, 50)) if lat.size
                else None,
                "latency_ms_p99": float(np.percentile(lat, 99)) if lat.size
                else None,
                "iteration": self.iteration,
                "vocoder": self.vocoder,
            }


class _JPWG:
    """Native Parallel WaveGAN synthesis backend (models/pwg.py) for the
    engine: one compiled chunk shape via jpwg_synthesize_chunked."""

    def __init__(self, config, checkpoint, n_mels):
        import jax
        import jax.numpy as jnp
        import yaml
        from flax import serialization

        from ..infer.vocoder import jpwg_receptive_frames
        from ..models.pwg import PWGGenerator

        if config is None or checkpoint is None:
            raise ValueError("vocoder='jpwg' needs voc_config and "
                             "voc_checkpoint")
        if not isinstance(config, dict):
            config = yaml.safe_load(open(config))
        self.config = config
        self.hop = int(np.prod(config.get("upsample_scales", (4, 4, 4, 4))))
        self.gen = PWGGenerator(arch=config)
        with open(checkpoint, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        tpl = self.gen.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64 * self.hop, 1), jnp.float32),
                            jnp.zeros((1, 64, int(n_mels)), jnp.float32)
                            )["params"]
        from ..utils.device import device_commit
        self.params = device_commit(
            serialization.from_state_dict(tpl, payload["generator"]))
        self.halo = jpwg_receptive_frames(config)

    def noise(self, T_pad, seed):
        """Full-length synthesis noise for a ``T_pad``-frame canvas — the
        (seed, shape) contract shared by one-shot and streamed synthesis
        (serve/streaming.py slices the SAME z per chunk, so outputs match)."""
        import jax

        return np.asarray(jax.random.normal(
            jax.random.PRNGKey(seed), (T_pad * self.hop, 1)), np.float32)

    def synthesize(self, mel, chunk_frames, seed):
        from ..infer.vocoder import jpwg_synthesize_chunked

        return jpwg_synthesize_chunked(
            self.gen, self.params, mel.astype(np.float32),
            self.noise(mel.shape[0], seed),
            chunk_frames=int(chunk_frames), halo_frames=self.halo,
            hop=self.hop).astype(np.float32)
