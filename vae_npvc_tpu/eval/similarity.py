"""Speaker-similarity evaluation with an in-framework x-vector-style embedder.

The reference's similarity stage downloads a pretrained Kaldi SITW x-vector
model and scores converted audio with PLDA *and* cosine (reference:
egs/vcc20/vae1/local/ob_eval/evaluate_similarity.sh:54-142) — external
binaries and network downloads. This module is the self-contained equivalent:
a small conv + statistics-pooling speaker embedder trained on the experiment's
own training mels, then cosine scoring between converted utterances and
target-speaker enrollment embeddings, plus PLDA scoring (eval/plda.py) with
the PLDA trained on the same training embeddings (the offline stand-in for
Kaldi's downloaded SITW PLDA model).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

def _stats_pool(h, lengths):
    import jax.numpy as jnp
    if lengths is not None:
        t = jnp.arange(h.shape[1])[None, :, None]
        m = (t < lengths[:, None, None]).astype(h.dtype)
        cnt = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        mean = jnp.sum(h * m, axis=1) / cnt
        var = jnp.sum(jnp.square(h - mean[:, None, :]) * m, axis=1) / cnt
    else:
        mean = jnp.mean(h, axis=1)
        var = jnp.var(h, axis=1)
    return jnp.concatenate([mean, jnp.sqrt(var + 1e-6)], axis=-1)


def _embedder(num_speakers, emb_dim=64, width=128, arch="tdnn"):
    import jax.numpy as jnp
    from flax import linen as nn

    class XVectorTDNN(nn.Module):
        """SITW x-vector TDNN (the architecture the reference downloads:
        egs/vcc20/vae1/local/ob_eval/evaluate_similarity.sh:54-64 fetches the
        Kaldi SITW 0003 x-vector nnet3 model — a 5-layer dilated TDNN
        frame stack, statistics pooling, and two segment-level layers, per
        Snyder et al. 2018). The x-vector is the first segment affine's
        pre-activation output, as in Kaldi's tdnn6.affine extraction point.

        Deviations from the Kaldi net: LayerNorm instead of batchnorm
        (stateless; equivalent stabilization role) and configurable widths —
        ``width=512`` reproduces the SITW sizes (frame5 = 3*width = 1536 vs
        Kaldi's 1500); the default 128 keeps in-recipe training fast on the
        experiment-scale corpora this environment allows.

        Mel (B, T, D) -> (x-vector (B, E), softmax logits (B, S))."""

        @nn.compact
        def __call__(self, x, lengths=None):
            h = x
            # (kernel, dilation, out) per frame-level layer: contexts
            # {t-2..t+2}, {t-2,t,t+2}, {t-3,t,t+3}, {t}, {t}
            specs = [(5, 1, width), (3, 2, width), (3, 3, width),
                     (1, 1, width), (1, 1, 3 * width)]
            for i, (k, d, w) in enumerate(specs):
                h = nn.Conv(w, (k,), kernel_dilation=d, name=f"tdnn_{i}")(h)
                h = nn.relu(h)
                h = nn.LayerNorm(name=f"norm_{i}")(h)
            stats = _stats_pool(h, lengths)
            emb = nn.Dense(emb_dim, name="embed")(stats)      # the x-vector
            h2 = nn.LayerNorm(name="seg6_norm")(nn.relu(emb))
            h2 = nn.Dense(emb_dim, name="segment7")(h2)
            h2 = nn.LayerNorm(name="seg7_norm")(nn.relu(h2))
            logits = nn.Dense(num_speakers, name="classify")(h2)
            return emb, logits

    class SpeakerEmbedder(nn.Module):
        """Legacy round-2 embedder: 3 plain convs + stats pooling."""

        @nn.compact
        def __call__(self, x, lengths=None):
            h = x
            for i, dil in enumerate((1, 2, 3)):
                h = nn.Conv(width, (5,), kernel_dilation=dil,
                            name=f"conv_{i}")(h)
                h = nn.relu(h)
            stats = _stats_pool(h, lengths)
            emb = nn.Dense(emb_dim, name="embed")(stats)
            logits = nn.Dense(num_speakers, name="classify")(nn.relu(emb))
            return emb, logits

    return XVectorTDNN() if arch == "tdnn" else SpeakerEmbedder()


def save_embedder(path, model_meta, params):
    """Persist the trained embedder (meta + params) for reuse across the
    per-pair eval invocations of run.sh stage 7."""
    from flax import serialization
    payload = {"meta": dict(model_meta),
               "params": serialization.to_state_dict(params)}
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_embedder(path):
    """→ (model, params, meta). Rebuilds the net from the stored meta."""
    import jax
    import jax.numpy as jnp
    from flax import serialization
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = payload["meta"]
    model = _embedder(int(meta["num_speakers"]), int(meta["emb_dim"]),
                      int(meta["width"]), meta.get("arch", "tdnn"))
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 8, int(meta["feat_dim"]))))["params"]
    from ..utils.device import device_commit
    params = device_commit(
        serialization.from_state_dict(template, payload["params"]))
    return model, params, meta


def train_embedder(data_dir, config, *, steps=2000, batch_size=64,
                   emb_dim=64, lr=1e-3, seed=0, log_every=500, feats=None,
                   arch="tdnn", width=128, ckpt=None):
    """Train the speaker classifier on a dump dir; returns (model, params).

    ``feats``: optional {utt: (T, D)} override — the wav-domain MFCC+VAD
    front-end (``mfcc_vad_scp``) instead of the dump dir's mels; speaker
    labels still come from the dir's ``utt2spk_id``.
    ``arch``: 'tdnn' (SITW x-vector TDNN, default) or 'conv3' (the legacy
    3-conv stand-in). ``ckpt``: load-if-exists-else-train-and-save path.
    """
    import jax
    import jax.numpy as jnp
    import optax

    if ckpt is not None:
        from pathlib import Path
        if Path(ckpt).exists():
            model, params, meta = load_embedder(ckpt)
            # reuse only when the stored model matches the request — a stale
            # checkpoint from a run with different --embedder/--width would
            # otherwise silently score with the wrong architecture
            if feats:
                feat_dim = np.asarray(next(iter(feats.values()))).shape[-1]
            else:
                from ..data import kaldi_io
                scp = kaldi_io.read_scp(Path(data_dir) / "feats.scp")
                feat_dim = kaldi_io.matrix_header(next(iter(scp.values())))[1]
            if (meta.get("arch", "tdnn") == arch
                    and int(meta.get("width", width)) == int(width)
                    and int(meta.get("emb_dim", emb_dim)) == int(emb_dim)
                    and (feat_dim is None
                         or int(meta.get("feat_dim", feat_dim))
                         == int(feat_dim))):
                print(f"loaded speaker embedder from {ckpt}")
                return model, params
            print(f"ignoring {ckpt}: stored "
                  f"{meta.get('arch')}/w{meta.get('width')}/"
                  f"e{meta.get('emb_dim')} != requested "
                  f"{arch}/w{width}/e{emb_dim}; retraining")

    if feats is not None:
        it, num_speakers, feats0 = _override_batches(
            data_dir, feats, batch_size, seed)
    else:
        # lazy scp-backed sampler so training pools match eval pooling:
        # both batch paths yield real per-row lengths, and the stats pool
        # masks padding during TRAINING exactly as embed_feats does at
        # scoring time (an unmasked pool would dilute short utterances'
        # mean/stddev with zeros and shift them off the classifier's
        # training distribution)
        from pathlib import Path

        from ..data import kaldi_io
        scp = kaldi_io.read_scp(Path(data_dir) / "feats.scp")
        crop = int((config or {}).get("crop_length", 200))
        it, num_speakers, feats0 = _override_batches(
            data_dir, scp, batch_size, seed, crop=crop)
    model = _embedder(num_speakers, emb_dim, width, arch)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros_like(feats0))["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, feats, spks, lengths):
        def loss_fn(p):
            emb, logits = model.apply({"params": p}, feats, lengths)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, spks).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i, (feats, spks, lengths) in enumerate(it):
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(feats),
                                       jnp.asarray(spks),
                                       jnp.asarray(lengths))
        if log_every and i % log_every == 0:
            print(f"spk-embedder step {i}: loss {float(loss):.4f}")
        if i + 1 >= steps:
            break
    if ckpt is not None:
        save_embedder(ckpt, {"arch": arch, "width": width,
                             "emb_dim": emb_dim,
                             "num_speakers": num_speakers,
                             "feat_dim": int(feats0.shape[-1])}, params)
        print(f"saved speaker embedder to {ckpt}")
    return model, params


def _override_batches(data_dir, feats, batch_size, seed, crop=200):
    """Batch iterator with labels from ``data_dir/utt2spk_id`` (random
    crop-or-pad to ``crop`` frames). Yields ``(x, spk, lengths)`` — lengths
    carry each row's real frame count so the stats pool can mask padding
    during training exactly as it does at scoring time. ``feats`` is either
    an in-memory {utt: (T, D)} dict or a feats.scp mapping {utt: position}
    (entries loaded lazily per batch)."""
    from pathlib import Path

    from ..data import kaldi_io

    utt2spk = {}
    for line in open(Path(data_dir) / "utt2spk_id"):
        u, s = line.split()
        utt2spk[u] = int(s)
    lazy = feats and isinstance(next(iter(feats.values())), str)

    def load(u):
        return kaldi_io.load_mat(feats[u]) if lazy else feats[u]

    if lazy:
        utts = [u for u in feats if u in utt2spk
                and kaldi_io.matrix_header(feats[u])[0] > 0]
        D = kaldi_io.matrix_header(feats[utts[0]])[1] if utts else 0
    else:
        utts = [u for u in feats if u in utt2spk and len(feats[u]) > 0]
        D = feats[utts[0]].shape[1] if utts else 0
    if not utts:
        raise ValueError(f"no labeled utterances with voiced frames in "
                         f"{data_dir}")
    num_speakers = max(utt2spk[u] for u in utts) + 1
    batch_size = min(batch_size, len(utts))
    rng = np.random.default_rng(seed)

    def gen():
        while True:
            pick = rng.choice(len(utts), size=batch_size, replace=False)
            x = np.zeros((batch_size, crop, D), np.float32)
            y = np.zeros((batch_size,), np.int32)
            lens = np.zeros((batch_size,), np.int32)
            for b, i in enumerate(pick):
                mat, u = load(utts[i]), utts[i]
                if len(mat) > crop:
                    t0 = rng.integers(0, len(mat) - crop + 1)
                    x[b] = mat[t0:t0 + crop]
                    lens[b] = crop
                else:
                    x[b, :len(mat)] = mat
                    lens[b] = len(mat)
                y[b] = utt2spk[u]
            yield x, y, lens

    return gen(), num_speakers, np.zeros((batch_size, crop, D), np.float32)


def mfcc_vad_scp(wav_scp, fs=16000, *, mfcc_opts=None, vad_opts=None):
    """Wav-domain front-end: wav.scp → {utt: voiced MFCC frames}.

    The reference chain re-extracts 30-dim MFCC + energy VAD from the
    converted/enrollment wavs before x-vector extraction
    (evaluate_similarity.sh:82-104 with conf/mfcc.conf + conf/vad.conf);
    non-16k sources are polyphase-resampled in-framework (no sox).
    ``wav_scp``: a wav.scp path or an in-memory {utt: wav-path} dict."""
    from ..data import kaldi_io
    from ..data.mfcc import mfcc_vad

    opts = dict(mfcc_opts or {})
    opts.setdefault("high_freq", 7600.0)  # conf/mfcc.conf
    entries = (wav_scp if isinstance(wav_scp, Mapping)
               else kaldi_io.load_dict_data(wav_scp))
    out = {}
    for utt, entry in entries.items():
        sr, x = kaldi_io.read_wav_scp_entry(entry)
        if sr != fs:
            from ..data.features import resample
            x = resample(x, sr, fs)
        # Kaldi computes features on int16-scale samples; the conf's VAD
        # threshold (5.5) and the energy C0 are calibrated to that scale
        out[utt] = mfcc_vad(x * 32768.0, fs, mfcc_opts=opts,
                            vad_opts=vad_opts)
    return out


def embed_scp(model, params, scp_path, max_frames=800, batch_size=16,
              bucket=128):
    """Embed every utterance in a feats.scp → {utt: unit-norm embedding}.

    Length-bucketed and batched under one jitted fn per bucket shape (a naive
    per-utterance loop recompiles for every distinct length — pathological on
    remote backends).
    """
    from ..data import kaldi_io

    items = [(u, kaldi_io.load_mat(rx)[:max_frames])
             for u, rx in kaldi_io.read_scp(scp_path).items()]
    return embed_feats(model, params, items, batch_size=batch_size,
                       bucket=bucket)


def embed_feats(model, params, items, batch_size=16, bucket=128,
                max_frames=800):
    """Embed [(utt, (T, D))] or {utt: (T, D)} → {utt: unit-norm embedding}."""
    import jax
    import jax.numpy as jnp

    if isinstance(items, Mapping):
        items = list(items.items())
    items = [(u, np.asarray(m)[:max_frames]) for u, m in items]
    items = [(u, m) for u, m in items if len(m) > 0]

    embed_jit = jax.jit(lambda x, l: model.apply({"params": params}, x, l)[0])
    buckets: dict = {}
    for u, mat in items:
        T_pad = -(-mat.shape[0] // bucket) * bucket
        buckets.setdefault(T_pad, []).append((u, mat))

    out = {}
    for T_pad in sorted(buckets):
        group = buckets[T_pad]
        for lo in range(0, len(group), batch_size):
            chunk = group[lo:lo + batch_size]
            D = chunk[0][1].shape[1]
            x = np.zeros((batch_size, T_pad, D), np.float32)
            lens = np.ones((batch_size,), np.int32)
            for b, (u, mat) in enumerate(chunk):
                x[b, :mat.shape[0]] = mat
                lens[b] = mat.shape[0]
            embs = np.asarray(embed_jit(jnp.asarray(x),
                                        jnp.asarray(lens)))
            for b, (u, _) in enumerate(chunk):
                e = embs[b]
                out[u] = e / max(np.linalg.norm(e), 1e-9)
    return out


def cosine_similarity_report(conv_embs, enroll_embs, utt2target,
                             enroll_utt2spk):
    """Mean cosine of each converted utt vs its target speaker's enrollment
    centroid. Returns (mean_score, per_utt dict)."""
    spk_centroid: dict = {}
    for utt, spk in enroll_utt2spk.items():
        if utt in enroll_embs:
            spk_centroid.setdefault(spk, []).append(enroll_embs[utt])
    spk_centroid = {s: np.mean(v, axis=0) for s, v in spk_centroid.items()}
    per_utt = {}
    for utt, tgt in utt2target.items():
        if utt in conv_embs and tgt in spk_centroid:
            c = spk_centroid[tgt]
            per_utt[utt] = float(np.dot(conv_embs[utt],
                                        c / max(np.linalg.norm(c), 1e-9)))
    if not per_utt:
        raise ValueError("no scorable (converted utt, target) pairs")
    return float(np.mean(list(per_utt.values()))), per_utt


def plda_similarity_report(plda, conv_embs, enroll_embs, utt2target,
                           enroll_utt2spk):
    """Mean PLDA LLR of each converted utt vs its target speaker's raw-mean
    enrollment vector (Kaldi ivector-mean + --num-utts semantics,
    reference evaluate_similarity.sh:121-129). Returns (mean, per_utt)."""
    from .plda import plda_score

    spk_vecs: dict = {}
    for utt, spk in enroll_utt2spk.items():
        if utt in enroll_embs:
            spk_vecs.setdefault(spk, []).append(enroll_embs[utt])
    spk_mean = {s: np.mean(v, axis=0) for s, v in spk_vecs.items()}
    spk_count = {s: len(v) for s, v in spk_vecs.items()}
    per_utt = {}
    for utt, tgt in utt2target.items():
        if utt in conv_embs and tgt in spk_mean:
            per_utt[utt] = plda_score(plda, spk_mean[tgt], conv_embs[utt],
                                      n_enroll=spk_count[tgt])
    if not per_utt:
        raise ValueError("no scorable (converted utt, target) pairs")
    return float(np.mean(list(per_utt.values()))), per_utt


def write_scores(path, target, per_utt, mean):
    """Reference scores-file shape: ``<trg>_enroll <utt> <score>`` rows plus
    a final Mean row (evaluate_similarity.sh:136-142; test.sh greps $3 of the
    tail line)."""
    with open(path, "w") as f:
        for utt, s in per_utt.items():
            f.write(f"{target}_enroll {utt} {s:.6f}\n")
        f.write(f"{target}_enroll Mean {mean:.6f}\n")
