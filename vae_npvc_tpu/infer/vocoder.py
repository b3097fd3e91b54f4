"""Vocoder backends: Griffin-Lim (in-framework) + optional Parallel WaveGAN.

The reference recipe's ``voc=PWG``/``voc=MG`` path shells out to the
``parallel-wavegan-normalize``/``parallel-wavegan-decode`` CLIs of the
``parallel_wavegan`` package with a downloaded pretrained model (reference:
egs/vcc20/vae1/run.sh:192-239). That package and its checkpoints are not in
this environment (and can't be downloaded), so this module provides:

- ``griffin_lim_scp``: the always-available backend (wraps
  data/features.griffin_lim over a denormalized feats.scp);
- ``external_decode_scp``: an optional-import shim — if ``parallel_wavegan``
  IS installed (a real deployment), it loads the checkpoint and vocodes each
  utterance's mel in-process (the library-API equivalent of the reference's
  two CLI calls, including the per-model mean/scale feature normalization);
  otherwise it raises ImportError with instructions, keeping the recipe flags
  wired rather than silently absent. It serves BOTH reference exp-dir styles
  — ``voc=PWG`` (exp/parallel_wavegan) and ``voc=MG``
  (exp/multiband_melgan): the package's ``load_model`` dispatches on the
  config's ``generator_type``, and multi-band generators are resolved to
  full-band audio through the model's PQMF synthesis filter when
  ``inference`` returns sub-band channels. ``pwg_decode_scp`` is kept as a
  compatibility alias;
- ``jpwg_decode_scp``: the NATIVE backend — the in-framework JAX
  Parallel-WaveGAN generator (models/pwg.py) trained with
  ``bin/train_pwg.py``; no external package, batched bucketed synthesis on
  the device (recipe flag ``voc=JPWG``).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def griffin_lim_scp(feats_scp, out_dir, *, fs, n_fft, n_shift, n_mels,
                    fmin=None, fmax=None, iters=64):
    """Griffin-Lim every utterance of a denormalized log-mel feats.scp."""
    from ..bin.convert_fbank import convert_fbank

    return convert_fbank(feats_scp, out_dir, fs=fs, n_fft=n_fft,
                         n_shift=n_shift, n_mels=n_mels, fmin=fmin,
                         fmax=fmax, n_iter=iters)


def external_decode_scp(feats_scp, out_dir, voc_expdir):
    """External-vocoder decode (optional ``parallel_wavegan`` dependency).

    ``voc_expdir`` follows the reference layout: newest ``*.pkl`` checkpoint,
    ``config.yml``, ``stats.h5`` (reference run.sh:206-209). Both reference
    model dirs load through this one entry point (run.sh:192-239):

    - ``voc=PWG`` → exp/parallel_wavegan (ParallelWaveGANGenerator);
    - ``voc=MG``  → exp/multiband_melgan ((MB-)MelGANGenerator) — the
      package's ``load_model`` picks the class from the config's
      ``generator_type``; if ``inference`` yields sub-band channels
      (out_channels > 1) they are resolved with the model's PQMF synthesis
      filter, mirroring the package decoder's multi-band branch.
    """
    try:
        import torch
        import yaml
        from parallel_wavegan.utils import load_model, read_hdf5
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError(
            "the voc=PWG/voc=MG paths need the 'parallel_wavegan' package "
            "and a pretrained model directory (reference run.sh:192-239); "
            "install parallel_wavegan and place the model under "
            "exp/parallel_wavegan (PWG) or exp/multiband_melgan (MG), or "
            "use an in-framework backend (voc=GL / voc=JPWG)") from e

    from ..data import kaldi_io

    voc_expdir = Path(voc_expdir)
    ckpts = sorted(voc_expdir.glob("**/*.pkl"),
                   key=lambda p: p.stat().st_mtime)
    confs = sorted(voc_expdir.glob("**/config.yml"))
    stats = sorted(voc_expdir.glob("**/stats.h5"))
    if not (ckpts and confs and stats):
        raise FileNotFoundError(
            f"{voc_expdir} must hold *.pkl, config.yml, stats.h5")
    config = yaml.safe_load(open(confs[0]))
    model = load_model(str(ckpts[-1]), config)
    if hasattr(model, "remove_weight_norm"):  # MelGAN variants may lack it
        model.remove_weight_norm()
    model.eval()
    mean = read_hdf5(str(stats[0]), "mean")
    scale = read_hdf5(str(stats[0]), "scale")

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    fs = config["sampling_rate"]
    n = 0
    with torch.no_grad():
        for utt, rx in kaldi_io.read_scp(feats_scp).items():
            mel = (kaldi_io.load_mat(rx) - mean) / scale
            wav = model.inference(torch.from_numpy(mel.astype(np.float32)))
            if wav.dim() == 2 and wav.shape[-1] > 1:
                # multi-band generator: (T//bands, bands) sub-band signal →
                # PQMF synthesis to full band, as the package decoder does
                pqmf = getattr(model, "pqmf", None)
                if pqmf is None:
                    raise ValueError(
                        "multi-band generator output but the loaded model "
                        "has no PQMF synthesis filter")
                wav = pqmf.synthesis(wav.transpose(1, 0).unsqueeze(0))
            wav = wav.reshape(-1).cpu().numpy()
            _write_wav(out_dir / f"{utt}.wav", wav, fs)
            n += 1
    return n


# backwards-compatible name (pre-MG shim)
pwg_decode_scp = external_decode_scp


def jpwg_receptive_frames(config) -> int:
    """Generator receptive field in MEL FRAMES (conservative, rounded up).

    Dilated stack: sum over layers of (k-1)·2^(i % cycle) samples each side,
    plus the upsampler smoothing convs (kernel 2s+1 per stage, at growing
    rates). Used as the chunk halo so chunked synthesis is exact.
    """
    layers = config.get("layers", 30)
    stacks = config.get("stacks", 3)
    k = config.get("kernel_size", 3)
    cycle = layers // stacks
    rf_samples = sum((k - 1) * 2 ** (i % cycle) for i in range(layers)) // 2
    hop = int(np.prod(config.get("upsample_scales", (4, 4, 4, 4))))
    # upsampler smoothing: each stage's half-kernel (scale s) at its rate
    # amounts to ≤ 1 mel frame each; add one frame per stage
    up_frames = len(config.get("upsample_scales", (4, 4, 4, 4)))
    return -(-rf_samples // hop) + up_frames


def _chunk_apply_jit(gen):
    """Per-generator cached jit wrapper: a fresh ``jax.jit(lambda ...)`` per
    call would recompile the identical executable for every utterance (all
    chunk windows share one shape)."""
    import jax

    fn = _CHUNK_JIT_CACHE.get(id(gen))
    if fn is None:
        fn = jax.jit(lambda params, zz, cc: gen.apply({"params": params},
                                                      zz, cc))
        _CHUNK_JIT_CACHE[id(gen)] = fn
    return fn


_CHUNK_JIT_CACHE: dict = {}


def jpwg_synthesize_stream(gen, params, mel, z, *, chunk_frames: int,
                           halo_frames: int, hop: int,
                           stop_frame: int | None = None):
    """Chunked synthesis as a GENERATOR: yields ``(a*hop, wav_chunk)`` pairs
    in order, each ``chunk_frames·hop`` samples (last possibly shorter).

    Identical computation to :func:`jpwg_synthesize_chunked` (which is
    implemented on top of this); the generator form lets a streaming server
    ship audio to the client as each chunk comes off the device instead of
    after full synthesis (serve/streaming.py). ``stop_frame`` truncates the
    sweep: frames ≥ stop_frame are never synthesized (the serving path's
    bucket canvas is log-silence past the true length — skipping it saves
    device work without touching kept samples, the halo still sees the
    canvas context it needs).
    """
    import jax.numpy as jnp

    T = mel.shape[0]
    T_stop = T if stop_frame is None else min(int(stop_frame), T)
    step = chunk_frames
    padded = chunk_frames + 2 * halo_frames
    apply_jit = _chunk_apply_jit(gen)
    if T <= padded:
        # shorter than one padded window: single full-length pass
        wav = np.asarray(apply_jit(params, jnp.asarray(z[None]),
                                   jnp.asarray(mel[None])))[0, :, 0]
        yield 0, wav[:T_stop * hop]
        return
    for a in range(0, T_stop, step):
        b = min(a + step, T_stop)
        # the window is clamped INSIDE the utterance so every buffer edge is
        # either >= halo away from the kept region or coincides with a TRUE
        # utterance boundary (zeros appended past a fake interior edge would
        # propagate bias through the conv stack and leak into kept samples)
        lo = min(max(a - halo_frames, 0), T - padded)
        hi = lo + padded
        wav = np.asarray(apply_jit(
            params, jnp.asarray(z[None, lo * hop:hi * hop]),
            jnp.asarray(mel[None, lo:hi])))[0, :, 0]
        yield a * hop, wav[(a - lo) * hop:(b - lo) * hop]


def jpwg_synthesize_chunked(gen, params, mel, z, *, chunk_frames: int,
                            halo_frames: int, hop: int):
    """Long-utterance synthesis in fixed-size chunks with halo overlap.

    The generator is all local convs, so a chunk computed with
    ``halo_frames`` ≥ the receptive field of context on each side equals the
    full-length synthesis exactly on its kept interior (the conv-locality
    analog of the framework's time-axis halo sharding, parallel/halo.py).
    ``z`` is the FULL-length noise — each chunk sees its true slice, so
    chunk boundaries are seamless. Bounded memory, one compiled shape.
    """
    T = mel.shape[0]
    out = np.zeros((T * hop,), np.float32)
    for at, wav in jpwg_synthesize_stream(
            gen, params, mel, z, chunk_frames=chunk_frames,
            halo_frames=halo_frames, hop=hop):
        out[at:at + wav.size] = wav
    return out


def jpwg_decode_scp(feats_scp, out_dir, config, checkpoint, *,
                    batch_size: int = 8, bucket: int = 64, seed: int = 0,
                    chunk_frames: int | None = None):
    """Vocode a denormalized log-mel feats.scp with the native PWG generator.

    ``config`` is the vocoder training YAML (dict or path); ``checkpoint`` a
    ``bin/train_pwg.py`` msgpack. Utterances are bucketed by padded mel
    length (few compiled shapes) and synthesized batched; padded frames are
    dropped from the written wav (length = true_frames x hop).
    """
    import jax
    import jax.numpy as jnp
    import yaml
    from flax import serialization

    from ..data import kaldi_io
    from ..models.pwg import PWGGenerator

    if not isinstance(config, dict):
        config = yaml.safe_load(open(config))
    hop = int(np.prod(config.get("upsample_scales", (4, 4, 4, 4))))
    fs = config.get("fs", 24000)
    gen = PWGGenerator(arch=config)

    with open(checkpoint, "rb") as f:
        payload = serialization.msgpack_restore(f.read())

    items = [(u, kaldi_io.load_mat(rx))
             for u, rx in kaldi_io.read_scp(feats_scp).items()]
    if not items:
        return 0
    n_mels = items[0][1].shape[1]
    # params template for from_state_dict tree structure
    tpl = gen.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, bucket * hop, 1), jnp.float32),
                   jnp.zeros((1, bucket, n_mels), jnp.float32))["params"]
    from ..utils.device import device_commit
    params = device_commit(
        serialization.from_state_dict(tpl, payload["generator"]))

    apply_jit = jax.jit(lambda z, c: gen.apply({"params": params}, z, c))

    # long utterances go through fixed-size chunked synthesis (bounded
    # memory, one compiled shape, exact via receptive-field halos)
    long_items: list = []
    if chunk_frames:
        long_items = [it for it in items if it[1].shape[0] > chunk_frames]
        items = [it for it in items if it[1].shape[0] <= chunk_frames]

    buckets: dict = {}
    for u, mel in items:
        T_pad = -(-mel.shape[0] // bucket) * bucket
        buckets.setdefault(T_pad, []).append((u, mel))

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = jax.random.PRNGKey(seed)
    n = 0
    for u, mel in long_items:
        rng, zk = jax.random.split(rng)
        z = np.asarray(jax.random.normal(zk, (mel.shape[0] * hop, 1)),
                       np.float32)
        wav = jpwg_synthesize_chunked(
            gen, params, mel.astype(np.float32), z,
            chunk_frames=chunk_frames,
            halo_frames=jpwg_receptive_frames(config), hop=hop)
        _write_wav(out_dir / f"{u}.wav", wav, fs)
        n += 1
    for T_pad in sorted(buckets):
        group = buckets[T_pad]
        for lo in range(0, len(group), batch_size):
            chunk = group[lo:lo + batch_size]
            c = np.zeros((batch_size, T_pad, n_mels), np.float32)
            for b, (u, mel) in enumerate(chunk):
                c[b, :mel.shape[0]] = mel
            rng, zk = jax.random.split(rng)
            z = jax.random.normal(zk, (batch_size, T_pad * hop, 1))
            wav = np.asarray(apply_jit(z, jnp.asarray(c)))[..., 0]
            for b, (u, mel) in enumerate(chunk):
                _write_wav(out_dir / f"{u}.wav",
                           wav[b, :mel.shape[0] * hop], fs)
                n += 1
    return n


def _write_wav(path, x, fs):
    import wave

    pcm = (np.clip(x, -1.0, 1.0) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(fs)
        w.writeframes(pcm.tobytes())
