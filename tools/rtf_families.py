"""Per-family inference RTF table (VERDICT r3 item 6).

Measures the BASELINE RTF metric (processing time / audio time; target
< 0.05 on one v5e chip) everywhere it applies:

- any-to-many conversion through the Converter's jitted infer for
  flat / vqvae2 / vqvae2a / vqvae2b (batch 8 x 1024 frames x 80 mels at the
  VCC2020 93.75 frames/s rate — the README headline shape);
- token_tts synthesis (conv NAR / transformer / tacotron2 AR) at the
  aishell3 shape (batch 8 x 128 tokens -> up to 512 mel frames at
  80.2 frames/s);
- vocoding: Griffin-Lim vs the native JPWG generator over batch 8 x 1024
  mel frames (audio seconds = frames * hop / fs).

Two numbers per row: ``rtf_amortized`` (time_steps over ``--steps`` chained
calls, device-side throughput — the deployment-relevant number) and
``rtf_single`` (one cold-cache call incl. the host fetch — on the tunneled
dev backend this is dominated by tunnel latency; on local chips the two
converge). Weights are random inits — inference wall time is
weight-independent. Reference inference shape:
/root/reference/vae_npvc/decoder/basic.py:58-75 (serial, per-utterance).

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/rtf_families.py \
      [--families flat,vqvae2,...] [--out PROFILE_rtf.json] [--steps 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from tools._measure import time_steps

ROOT = Path(__file__).resolve().parents[1]

VCC_FRAME_HZ = 93.75          # fs 24 kHz / hop 256
AISHELL_FRAME_HZ = 44100 / 550  # ~80.2


def _conversion_row(name, config, B=8, T=1024, steps=8):
    import jax.numpy as jnp

    from vae_npvc_tpu.infer.convert import Converter
    from vae_npvc_tpu.models import build_model
    import jax

    cv = Converter(config)
    x = jnp.zeros((1, max(32, cv.min_frames), 80), jnp.float32)
    cv.variables = cv.model.init(
        {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
        x, jnp.zeros((1,), jnp.int32), train=True)

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
    lens = jnp.full((B,), T, jnp.int32)
    y = jnp.asarray(rng.integers(0, config.get("y_num", 8), size=(B,))
                    .astype(np.int32))

    audio_s = B * T / VCC_FRAME_HZ
    # single cold-ish call incl. fetch (after one warmup for compile)
    np.asarray(cv._infer_jit(cv.variables, feats, y, lens))
    t0 = time.perf_counter()
    np.asarray(cv._infer_jit(cv.variables, feats, y, lens))
    single = time.perf_counter() - t0

    sec, _ = time_steps(
        lambda: cv._infer_jit(cv.variables, feats, y, lens),
        lambda o: np.asarray(o[0, 0, 0]), steps)
    return {"family": name, "kind": "conversion", "batch": B, "frames": T,
            "rtf_amortized": round(sec / audio_s, 7),
            "rtf_single": round(single / audio_s, 7),
            "frames_per_sec": round(B * T / sec, 1)}


def _tts_row(name, config, B=8, Ttok=128, Tmel=512, steps=8):
    import jax
    import jax.numpy as jnp

    from vae_npvc_tpu.models import build_model

    model = build_model(config)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(
        0, config.get("token_num", 128), size=(B, Ttok)).astype(np.int32))
    dur = np.full((B, Ttok), Tmel // Ttok, np.int32)
    dur[:, -1] += Tmel - dur.sum(axis=1)
    y = jnp.asarray(rng.integers(0, config.get("y_num", 8), size=(B,))
                    .astype(np.int32))
    tok_lens = jnp.full((B,), Ttok, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
        tokens, jnp.asarray(dur),
        jnp.zeros((B, Tmel, config.get("mel_dim", 160)), jnp.float32),
        y, tok_lens, jnp.full((B,), Tmel, jnp.int32), train=True)

    infer = jax.jit(lambda v, t, yy, tl: model.apply(
        v, t, yy, tl, max_frames=Tmel, method="infer"))

    mel, mel_lens = infer(variables, tokens, y, tok_lens)
    np.asarray(mel)   # fence the warmup (async backend) before timing t0,
    #                   same methodology as _conversion_row/_gl_row
    # the compute always covers the full B x Tmel canvas (NAR renders every
    # frame; the AR scan runs max_frames steps regardless of the stop
    # token), so RTF is computed over it — random-init mel_lens (a trained
    # model's stop/durations) would under-credit the same wall time
    frames = B * Tmel
    audio_s = frames / AISHELL_FRAME_HZ
    t0 = time.perf_counter()
    np.asarray(infer(variables, tokens, y, tok_lens)[0])
    single = time.perf_counter() - t0

    sec, _ = time_steps(
        lambda: infer(variables, tokens, y, tok_lens),
        lambda o: np.asarray(o[0][0, 0, 0]), steps)
    return {"family": name, "kind": "tts_synthesis", "batch": B,
            "frames": frames,
            "rtf_amortized": round(sec / audio_s, 7),
            "rtf_single": round(single / audio_s, 7),
            "frames_per_sec": round(frames / sec, 1)}


def _gl_row(B=8, T=1024, steps=3, n_iter=64):
    import jax
    import jax.numpy as jnp

    from vae_npvc_tpu.data.features import griffin_lim

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32) - 4.0)
    fn = jax.jit(lambda m: griffin_lim(
        m, fs=24000, n_fft=1024, n_shift=256, n_mels=80, fmin=80,
        fmax=7600, n_iter=n_iter))
    audio_s = B * T * 256 / 24000

    np.asarray(fn(mel))
    t0 = time.perf_counter()
    np.asarray(fn(mel))
    single = time.perf_counter() - t0
    sec, _ = time_steps(lambda: fn(mel), lambda o: np.asarray(o[0, 0]),
                        steps)
    return {"family": f"griffin_lim_{n_iter}", "kind": "vocoder",
            "batch": B, "frames": B * T,
            "rtf_amortized": round(sec / audio_s, 7),
            "rtf_single": round(single / audio_s, 7)}


def _jpwg_row(B=8, T=256, steps=3):
    # T is capped at the production bucket scale: the decode path vocodes in
    # bucketed/chunked mel windows (infer/vocoder.jpwg_decode_scp bucket=64,
    # chunked long utterances); a full 1024-frame batch through the 30-layer
    # generator at fp32 needs >31 GB HBO temps (measured OOM on v5e — the
    # 64-channel activations pad 2x in the (8,128) layout) and is a shape
    # the shipped pipeline never runs.
    import jax
    import jax.numpy as jnp

    from vae_npvc_tpu.models.pwg import PWGGenerator

    cfg = ROOT / "egs/vcc20/vae1/conf/train_jpwg.yaml"
    import yaml
    config = yaml.safe_load(open(cfg))
    hop = int(np.prod(config.get("upsample_scales", (4, 4, 4, 4))))
    gen = PWGGenerator(arch=config)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(B, T, 80)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(B, T * hop, 1)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), z, mel)["params"]
    fn = jax.jit(lambda zz, m: gen.apply({"params": params}, zz, m))
    audio_s = B * T * hop / config.get("fs", 24000)

    np.asarray(fn(z, mel))
    t0 = time.perf_counter()
    np.asarray(fn(z, mel))
    single = time.perf_counter() - t0
    sec, _ = time_steps(lambda: fn(z, mel),
                        lambda o: np.asarray(o).ravel()[0], steps)
    return {"family": "jpwg", "kind": "vocoder", "batch": B,
            "frames": B * T,
            "rtf_amortized": round(sec / audio_s, 7),
            "rtf_single": round(single / audio_s, 7)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="flat,vqvae2,vqvae2a,vqvae2b,"
                    "token_tts_conv,token_tts_transformer,"
                    "token_tts_tacotron2,gl,jpwg")
    ap.add_argument("--out", default=None)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=1024)
    args = ap.parse_args(argv)

    from tools.perf_families import families
    fams = families()
    want = args.families.split(",")
    rows = []
    for name in want:
        try:
            if name in ("flat", "vqvae2", "vqvae2a", "vqvae2b"):
                cfg = dict(fams[name][0])
                cfg.pop("grad_accum", None)
                row = _conversion_row(name, cfg, B=args.batch,
                                      T=args.frames, steps=args.steps)
            elif name.startswith("token_tts"):
                key = {"token_tts_conv": "token_tts_conv",
                       "token_tts_transformer": "token_tts_transformer",
                       "token_tts_tacotron2": "token_tts_tacotron2"}[name]
                row = _tts_row(name, dict(fams[key][0]), B=args.batch,
                               steps=args.steps)
            elif name == "gl":
                row = _gl_row(B=args.batch, T=args.frames)
            elif name == "jpwg":
                row = _jpwg_row(B=args.batch, T=min(args.frames, 256))
            else:
                print(f"unknown family {name}", file=sys.stderr)
                continue
        except Exception as e:  # noqa: BLE001 — keep the sweep going
            row = {"family": name, "error": f"{type(e).__name__}: {e}"}
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
