"""Serving export: the conversion graph as serialized StableHLO artifacts.

Beyond-reference deployment subsystem. The reference's inference story is
"run bin/decode.py inside a checkout" (reference: vae_npvc/decoder/basic.py
— Decoder builds the torch model from the experiment YAML and loads the
checkpoint); nothing deployable exists. Here the bucketed conversion
functions are exported with ``jax.export`` into a self-contained bundle
directory:

    bundle.json          metadata (buckets, batch/target shape, speaker map)
    params.msgpack       the model variables, stored ONCE
    bucket_<T>.hlo       jax.export artifact for padded length T

Loading a bundle needs **jax + numpy only** — no model code, no experiment
YAML, no checkpoint parsing — and the artifacts execute on every platform
recorded at export time (default ``("cpu", "tpu")``; ``jax.export`` embeds a
platform-dispatch index so one file serves both). That makes the bundle the
unit you ship to a serving fleet: the training repo stays behind, version
skew between trainer and server cannot change numerics, and the server
binary is a thin ``ServingBundle.infer`` wrapper.

Design notes:

- The exported callable takes the variables as an *argument* (not baked-in
  constants), so the per-bucket artifacts are a few hundred KB of StableHLO
  instead of a full parameter copy per bucket; ``params.msgpack`` carries
  the weights once. Pytree structure is plain nested dicts on both sides
  (dict flattening is key-sorted, hence stable across processes).
- Export always runs with ``use_pallas_vq: false``: inference lowers to pure
  StableHLO portable across the bundle's platforms (a TPU-only Pallas custom
  call would pin the artifact to TPU and break the CPU leg). The masked
  GroupNorm/attention inference paths never take a Pallas kernel anyway
  (nn/blocks.py group_norm requires mask is None for the fused path).
- Bucketing mirrors infer/convert.Converter: smallest multiple of
  ``decode_bucket_size`` ≥ the utterance length, clamped to the model
  family's ``min_input_frames`` — masked inference makes the padded batch
  numerically identical to unpadded runs, so a bundle's outputs match
  ``bin/decode.py`` exactly (pinned by tests/test_export_serving.py).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger("vae_npvc_tpu.export_serving")

_FORMAT_VERSION = 1


_Q8_KEY = "__q8__"


def _quantize_tree(tree, min_size):
    """Weight-only symmetric int8: float leaves with ≥ ``min_size`` elements
    become ``{__q8__, scale}`` nodes (per-last-axis-channel scales). The
    dequantized weight differs from the original by ≤ scale/2 elementwise;
    small leaves (norm scales, biases, tiny codebooks) stay fp32."""
    def q(leaf):
        a = np.asarray(leaf)
        # ndim < 2: a per-last-axis scale would be per-ELEMENT (5 bytes/elem
        # — larger than fp32); 1-D leaves are biases/gains, keep them exact
        if a.dtype.kind != "f" or a.size < min_size or a.ndim < 2:
            return a
        amax = np.max(np.abs(a), axis=tuple(range(a.ndim - 1)))
        scale = np.maximum(amax, 1e-12).astype(np.float32) / 127.0
        q8 = np.clip(np.rint(a / scale), -127, 127).astype(np.int8)
        return {_Q8_KEY: q8, "scale": scale}

    if isinstance(tree, dict):
        return {k: _quantize_tree(v, min_size) for k, v in tree.items()}
    return q(tree)


def _dequantize_tree(tree):
    if isinstance(tree, dict):
        if _Q8_KEY in tree:
            return (tree[_Q8_KEY].astype(np.float32)
                    * np.asarray(tree["scale"], np.float32))
        return {k: _dequantize_tree(v) for k, v in tree.items()}
    return tree


def export_bundle(config, checkpoint, out_dir, *, buckets=None,
                  max_frames=2048, batch_size=None, n_targets=1,
                  platforms=("cpu", "tpu"), spk2spk_id=None,
                  quantize=None, quantize_min_size=4096):
    """Export a checkpoint's conversion path into a serving bundle.

    ``buckets``: explicit padded lengths; default = every multiple of the
    config's ``decode_bucket_size`` up to ``max_frames``. ``n_targets`` is
    the trials-line target count baked into the artifact shapes (1 for
    single-target conversion; the hierarchical families accept per-level
    targets, reference vqvae2b.py:78 — rows with fewer targets repeat the
    last one, same as infer/convert.decode). ``spk2spk_id`` (name→int dict)
    is embedded in the metadata so servers can resolve speaker names.

    ``quantize="int8"`` stores the model *params* weight-only-quantized
    (symmetric per-channel int8, ~4x smaller ``params.msgpack``); the loader
    dequantizes to fp32 before calling, so the StableHLO artifacts are
    unchanged and the only numeric effect is the <= scale/2 weight rounding.
    Float param leaves smaller than ``quantize_min_size`` elements (norm
    scales, biases, small codebooks) stay fp32; non-param collections (EMA
    codebook statistics) are never quantized.

    Returns the metadata dict.
    """
    import jax
    from flax import serialization
    from jax import export as jexport

    from .convert import Converter, encoder_archs

    if quantize not in (None, "int8"):
        raise ValueError(f"unknown quantize mode {quantize!r} "
                         "(supported: 'int8')")
    config = dict(config)
    config["use_pallas_vq"] = False  # portable StableHLO (module docstring)
    conv = Converter(config)
    iteration = conv.load_checkpoint(checkpoint)
    B = int(batch_size or conv.batch_size)
    K = int(n_targets)
    D = conv._feat_dim_guess()
    if buckets is None:
        bs = conv.bucket_size
        buckets = list(range(bs, int(max_frames) + 1, bs)) or [bs]
    buckets = sorted({max(int(t), conv.min_frames) for t in buckets})

    variables = jax.device_get(conv.variables)
    # the exported callable's variables argument is the flax STATE-DICT form
    # (pure nested dicts — jax.export can't serialize custom pytree nodes
    # like the EMA quantizer's EmaVqState NamedTuple); the structured pytree
    # is rebuilt inside the traced function. from_state_dict reads only the
    # *structure* of the template, all leaf values come from the traced
    # argument, so no parameter constants are baked into the artifact.
    state_dict = serialization.to_state_dict(variables)
    fn = jax.jit(lambda v, x, y, lens: conv.model.apply(
        serialization.from_state_dict(variables, v), x, y, lens,
        method="infer"))
    vspec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        state_dict)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for T in buckets:
        specs = (vspec,
                 jax.ShapeDtypeStruct((B, T, D), np.float32),
                 jax.ShapeDtypeStruct((B, K), np.int32),
                 jax.ShapeDtypeStruct((B,), np.int32))
        exp = jexport.export(fn, platforms=tuple(platforms))(*specs)
        path = out / f"bucket_{T:05d}.hlo"
        path.write_bytes(exp.serialize())
        logger.info(f"exported {path.name} ({path.stat().st_size} bytes)")
    store = state_dict
    if quantize == "int8":
        store = dict(state_dict)
        if "params" in store:
            store["params"] = _quantize_tree(store["params"],
                                             int(quantize_min_size))
    (out / "params.msgpack").write_bytes(
        serialization.msgpack_serialize(store))

    meta = {
        # quantized params are unreadable by pre-quantization loaders —
        # bump the version so an old fleet rejects them cleanly at load
        # instead of dying at call time on the {__q8__, scale} pytree
        "format_version": 2 if quantize else _FORMAT_VERSION,
        "model_type": config.get("model_type", ""),
        "iteration": int(iteration),
        "feat_dim": int(D),
        "batch_size": B,
        "n_targets": K,
        "buckets": [int(t) for t in buckets],
        "min_frames": int(conv.min_frames),
        "n_encoder_levels": len(encoder_archs(config)),
        "y_num": int(config.get("y_num", 0)),
        "quantize": quantize,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "spk2spk_id": ({str(k): int(v) for k, v in spk2spk_id.items()}
                       if spk2spk_id else None),
    }
    (out / "bundle.json").write_text(json.dumps(meta, indent=1))
    return meta


class ServingBundle:
    """Load an exported bundle and run conversion without model code.

    Artifacts are deserialized lazily per bucket (first request of a length
    class pays the load; the process-wide XLA compilation of a deserialized
    module is cached by jax as usual).
    """

    def __init__(self, path):
        self.path = Path(path)
        self.meta = json.loads((self.path / "bundle.json").read_text())
        if self.meta.get("format_version") not in (1, 2):
            raise ValueError(
                f"bundle format {self.meta.get('format_version')} not in "
                f"supported (1, 2)")
        import jax
        # device-resident once at load: passing host numpy to every .call
        # would re-upload the full parameter set per request
        self.variables = jax.device_put(self._load_host_variables())
        self.batch_size = int(self.meta["batch_size"])
        self.n_targets = int(self.meta["n_targets"])
        self.feat_dim = int(self.meta["feat_dim"])
        self.buckets = sorted(int(t) for t in self.meta["buckets"])
        self.spk2spk_id = self.meta.get("spk2spk_id") or None
        self._fns = {}

    def _load_host_variables(self):
        """Read + (if quantized) dequantize params.msgpack on the host."""
        from flax import serialization
        tree = serialization.msgpack_restore(
            (self.path / "params.msgpack").read_bytes())
        if self.meta.get("quantize") == "int8":
            tree = dict(tree)
            if "params" in tree:
                tree["params"] = _dequantize_tree(tree["params"])
        return tree

    def _fn(self, T):
        if T not in self._fns:
            from jax import export as jexport
            self._fns[T] = jexport.deserialize(
                (self.path / f"bucket_{T:05d}.hlo").read_bytes())
        return self._fns[T]

    def pick_bucket(self, T):
        for b in self.buckets:
            if b >= T:
                return b
        raise ValueError(
            f"utterance length {T} exceeds the largest exported bucket "
            f"{self.buckets[-1]}; re-export with a larger --max_frames")

    def resolve_target(self, t):
        """Speaker name or int id → int id (via the embedded speaker map)."""
        if isinstance(t, str) and not t.lstrip("-").isdigit():
            if not self.spk2spk_id:
                raise ValueError(
                    f"named target {t!r} but the bundle embeds no spk2spk_id"
                    " map (pass spk2spk_id= at export time)")
            return int(self.spk2spk_id[t])
        return int(t)

    def infer(self, feats, tgts, lengths):
        """Padded-batch conversion through the exported artifact.

        ``feats`` (b, T, D) float32 with b ≤ batch_size, ``tgts`` (b,) or
        (b, K') int32 (K' ≤ n_targets; missing columns repeat the last,
        infer/convert.decode semantics), ``lengths`` (b,). Returns the raw
        (b, T_out, D) array; callers trim to per-utterance lengths.
        """
        feats = np.asarray(feats, np.float32)
        b, T, D = feats.shape
        if b > self.batch_size:
            raise ValueError(f"batch {b} > exported batch {self.batch_size}")
        if D != self.feat_dim:
            raise ValueError(f"feat dim {D} != exported {self.feat_dim}")
        Tp = self.pick_bucket(T)
        B, K = self.batch_size, self.n_targets
        x = np.zeros((B, Tp, D), np.float32)
        x[:b, :T] = feats
        tg = np.asarray(tgts, np.int32)
        if tg.ndim == 1:
            tg = tg[:, None]
        if tg.shape[1] > K:
            raise ValueError(
                f"{tg.shape[1]} targets per row > exported n_targets {K}")
        y = np.zeros((B, K), np.int32)
        y[:b] = tg[:, [min(j, tg.shape[1] - 1) for j in range(K)]]
        lens = np.ones((B,), np.int32)
        lens[:b] = np.maximum(np.asarray(lengths, np.int32), 1)
        try:
            out = np.asarray(self._fn(Tp).call(self.variables, x, y, lens))
        except Exception as e:  # noqa: BLE001 — any device failure
            out = self._infer_cpu_retry(Tp, x, y, lens, e)
        return out[:b]

    def _infer_cpu_retry(self, Tp, x, y, lens, err):
        """Accelerator-failure fallback: rerun the batch on host CPU (the
        analog of the live path's Converter fallback, infer/convert.py
        _infer_with_fallback). The artifact embeds a cpu lowering whenever
        exported with the default platforms; parameters are re-read from
        disk because the device copies may be unreachable after a failure.
        """
        import jax

        if "cpu" not in self.meta.get("platforms", []):
            raise err
        cpu = jax.devices("cpu")[0]
        logger.warning(f"bundle inference failed ({type(err).__name__}: "
                       f"{err}); retrying batch on CPU")
        host_vars = self._load_host_variables()
        with jax.default_device(cpu):
            return np.asarray(self._fn(Tp).call(
                jax.device_put(host_vars, cpu), x, y, lens))

    def convert(self, items):
        """Convert a list of ``(feat[T, D], targets)`` pairs.

        ``targets`` is an int id, speaker name, or a per-level list of them.
        Items are grouped by bucket and chunked to the exported batch size.
        Returns converted arrays trimmed to each utterance's length, in
        input order.
        """
        jobs = []
        for i, (feat, targets) in enumerate(items):
            feat = np.asarray(feat, np.float32)
            if not isinstance(targets, (list, tuple)):
                targets = [targets]
            tgt = [self.resolve_target(t) for t in targets]
            jobs.append((i, feat, feat.shape[0], tgt))
        buckets: dict[int, list] = {}
        for job in jobs:
            buckets.setdefault(self.pick_bucket(job[2]), []).append(job)
        results = [None] * len(jobs)
        for Tp in sorted(buckets):
            group = buckets[Tp]
            for lo in range(0, len(group), self.batch_size):
                chunk = group[lo:lo + self.batch_size]
                Tmax = max(j[2] for j in chunk)
                feats = np.zeros((len(chunk), Tmax, self.feat_dim),
                                 np.float32)
                lens = np.zeros((len(chunk),), np.int32)
                Kc = max(len(j[3]) for j in chunk)
                tgts = np.zeros((len(chunk), Kc), np.int32)
                for r, (i, feat, T, tgt) in enumerate(chunk):
                    feats[r, :T] = feat
                    lens[r] = T
                    tgts[r] = [tgt[min(j, len(tgt) - 1)] for j in range(Kc)]
                out = self.infer(feats, tgts, lens)
                for r, (i, feat, T, tgt) in enumerate(chunk):
                    results[i] = out[r, :min(T, out.shape[1])]
        return results
