"""Any-to-many conversion driver: trials → converted mel arks.

Re-design of the reference inference driver (reference: vae_npvc/decoder/basic.py
— Decoder), which runs utterances serially, unpadded, one H2D copy each. Here:

- utterances are **bucketed by padded length and batched**: each bucket shape
  compiles once and the batch rides the MXU together. Length masks inside the
  model make the padded computation numerically identical to the reference's
  unpadded per-utterance runs (see nn/blocks.py group_norm);
- batches are padded to a fixed batch size so the number of compiled shapes is
  ``O(#buckets)``, not ``O(#utterances)``;
- outputs are written utterance-at-a-time to ``feats.ark``/``feats.scp`` with
  Kaldi compression method 1, the reference's output contract
  (decoder/basic.py:55-57).

File contract (decoder/basic.py:39-53): ``decode_dir`` holds ``trials`` lines
``utt target[ target...]`` and ``feats.scp``; optional ``spk2spk_id`` maps
speaker names to integer ids.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

from ..data import kaldi_io
from ..models import build_model

logger = logging.getLogger("vae_npvc_tpu.convert")


def _migrate_codebook(template, stored):
    """Graceful codebook-shape migration on load: if the stored (plain-VQ)
    codebook size differs from the config's, adopt the stored shape
    (reference behavior: vae_npvc/model/vqvae.py:106-119)."""
    import numpy as np

    key = "quantizer_embedding"
    if key in template and key in stored:
        tpl, st = np.asarray(template[key]), np.asarray(stored[key])
        if tpl.shape != st.shape:
            logger.warning(
                f"codebook size mismatch: checkpoint {st.shape} vs config "
                f"{tpl.shape}; adopting the checkpoint's shape")
            template = dict(template)
            template[key] = np.zeros(st.shape, np.float32)
    return template


def _bucket(T, bucket_size, min_len=1):
    return max(-(-T // bucket_size) * bucket_size, min_len)


def auto_bucket_edges(lengths, max_buckets=6, align=32, min_len=1):
    """Padded-length bucket edges minimizing total padded frames.

    The fixed-grid policy (multiples of ``decode_bucket_size``) wastes
    compute when the corpus length distribution is skewed — every frame
    beyond an utterance's true length is MXU work on masked zeros. This
    picks at most ``max_buckets`` edges from the corpus's own (align-rounded)
    lengths by exact partition DP: cost of covering a group by its largest
    member = sum of pad frames; O(n²·K) over n unique rounded lengths.
    Masked inference keeps results identical for any bucketing, so this is
    a pure throughput knob (config ``decode_bucket_auto: true``).
    """
    cands = sorted({_bucket(int(T), align, min_len) for T in lengths})
    n = len(cands)
    if n == 0:
        return []
    K = min(max_buckets, n)
    idx = {c: i for i, c in enumerate(cands)}
    counts = np.zeros(n, np.int64)
    sums = np.zeros(n, np.float64)
    for T in lengths:
        i = idx[_bucket(int(T), align, min_len)]
        counts[i] += 1
        sums[i] += T
    # cost(i, j) = pad frames when lengths rounded into (cands[i-1], cands[j]]
    # are all padded to cands[j]
    ccum = np.concatenate([[0], np.cumsum(counts)])
    scum = np.concatenate([[0.0], np.cumsum(sums)])

    def cost(i, j):          # groups i..j inclusive, edge = cands[j]
        return cands[j] * (ccum[j + 1] - ccum[i]) - (scum[j + 1] - scum[i])

    INF = float("inf")
    dp = np.full((K + 1, n), INF)
    choice = np.zeros((K + 1, n), np.int64)
    for j in range(n):
        dp[1][j] = cost(0, j)
    for k in range(2, K + 1):
        for j in range(k - 1, n):
            best, arg = INF, 0
            for i in range(k - 2, j):
                c = dp[k - 1][i] + cost(i + 1, j)
                if c < best:
                    best, arg = c, i
            dp[k][j], choice[k][j] = best, arg
    k_best = int(np.argmin([dp[k][n - 1] for k in range(1, K + 1)])) + 1
    edges, j = [], n - 1
    for k in range(k_best, 0, -1):
        edges.append(cands[j])
        j = int(choice[k][j])
    return sorted(edges)


def encoder_archs(config):
    """The chained encoder arch dicts of a config (flat or hierarchical)."""
    if "encoder" in config:
        return [config["encoder"]]
    keys = sorted((k for k in config if k.startswith("encoder.")),
                  key=lambda k: int(k.split(".")[1]))
    return [config[k] for k in keys]


class Converter:
    """Builds the model once; compiles one infer fn per bucket shape."""

    def __init__(self, config, mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``'data'`` axis —
        the batched ``infer`` executable is then GSPMD-sharded along the
        batch dimension (params replicated), so one conversion call rides
        every chip of a serving pod. Callers must submit batches divisible
        by the mesh's data size (the serving engine's batcher pads to a
        multiple, serve/engine.py); the offline CLI path stays
        single-device. No reference counterpart (serving subsystem)."""
        import jax

        self.config = config
        self.mesh = mesh
        self.model = build_model(config)
        self.bucket_size = config.get("decode_bucket_size", 256)
        self.batch_size = config.get("decode_batch_size", 8)
        # corpus-adaptive bucket edges (auto_bucket_edges) instead of the
        # fixed decode_bucket_size grid — same results (masked inference),
        # less padded compute on skewed length distributions
        self.auto_buckets = bool(config.get("decode_bucket_auto", False))
        self.max_buckets = int(config.get("decode_max_buckets", 6))
        # utterances shorter than the hierarchy's total downsampling must be
        # padded up so no level's time axis is empty (see
        # models/vqvae.Encoder.min_input_frames); real lengths stay exact
        from ..models.vqvae import Encoder as _Enc
        self.min_frames = _Enc.min_input_frames(encoder_archs(config))
        self.variables = None
        # every model family threads length masks (padded batch == unpadded
        # runs, tests/test_masked_inference.py incl. the hierarchical
        # families), so all models share the bucketed-padded batching path
        self.supports_lengths = True
        _infer = lambda v, x, y, lengths: self.model.apply(  # noqa: E731
            v, x, y, lengths, method="infer")
        if mesh is None:
            self._infer_jit = jax.jit(_infer)
            self._repl_sharding = None
        else:
            from jax.sharding import NamedSharding, PartitionSpec

            batch = NamedSharding(mesh, PartitionSpec("data"))
            repl = NamedSharding(mesh, PartitionSpec())
            self._infer_jit = jax.jit(
                _infer, in_shardings=(repl, batch, batch, batch),
                out_shardings=batch)
            self._repl_sharding = repl

    def load_checkpoint(self, path):
        import jax
        import jax.numpy as jnp
        from flax import serialization

        x = jnp.zeros((1, max(32, self.min_frames),
                       self._feat_dim_guess()), jnp.float32)
        y = jnp.zeros((1,), jnp.int32)
        variables = self.model.init(
            {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
            x, y, train=True)
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        variables = dict(variables)
        template = variables.pop("params")
        template = _migrate_codebook(template, payload["model"])
        from ..utils.migrate import maybe_migrate_model
        model_tree, _ = maybe_migrate_model(
            payload, serialization.to_state_dict(template))
        params = serialization.from_state_dict(template, model_tree)
        ema = serialization.from_state_dict(variables, payload.get("ema", {}))
        # commit the restored leaves to the device ONCE (utils/device.py
        # device_commit rationale); under a serving mesh the steady state
        # is the replicated layout. The HOST copy is retained for the CPU
        # fallback — fetching params back from a wedged accelerator would
        # defeat it (_infer_with_fallback).
        from ..utils.device import device_commit
        self._host_variables = {"params": params, **ema}
        self.variables = device_commit(self._host_variables,
                                       self._repl_sharding)
        return payload.get("iteration", 0)

    def _feat_dim_guess(self):
        enc = self.config.get("encoder",
                              self.config.get("encoder.0", {}))
        return enc.get("in_channels", [80])[0]

    def _bucket_fn(self, jobs):
        """Bucketing policy for a job list of ``(utt, rx, T, ...)`` tuples:
        the fixed decode_bucket_size grid, or corpus-adaptive DP edges
        (``decode_bucket_auto: true``)."""
        if not self.auto_buckets or not jobs:
            return lambda T: _bucket(T, self.bucket_size, self.min_frames)
        lens = [j[2] for j in jobs]
        edges = auto_bucket_edges(lens, max_buckets=self.max_buckets,
                                  align=32, min_len=self.min_frames)

        def pick(T):
            T = max(T, self.min_frames)
            for e in edges:
                if e >= T:
                    return e
            return edges[-1]

        fixed = sum(_bucket(T, self.bucket_size, self.min_frames) - T
                    for T in lens)
        auto = sum(pick(T) - T for T in lens)
        logger.info(f"auto buckets {edges}: {auto} padded frames vs "
                    f"{fixed} on the fixed {self.bucket_size} grid")
        return pick

    def _infer_with_fallback(self, feats, tgts, lengths):
        """Run the jitted infer; on accelerator failure (e.g. OOM on a long
        bucket) retry the batch on the host CPU — the analog of the
        reference's per-utterance GPU→CPU fallback (decoder/basic.py:27-36).
        """
        import jax
        import jax.numpy as jnp

        try:
            return np.asarray(self._infer_jit(
                self.variables, jnp.asarray(feats), jnp.asarray(tgts),
                jnp.asarray(lengths)))
        except Exception as e:  # noqa: BLE001 — any device failure
            cpu = jax.devices("cpu")[0]
            logger.warning(f"device inference failed ({type(e).__name__}: "
                           f"{e}); retrying batch on CPU")
            with jax.default_device(cpu):
                # from the RETAINED host copy: pulling self.variables back
                # off a wedged accelerator would hang the fallback too
                cpu_vars = jax.device_put(self._host_variables, cpu)
                out = self.model.apply(
                    cpu_vars, jnp.asarray(feats), jnp.asarray(tgts),
                    jnp.asarray(lengths), method="infer")
                return np.asarray(out)

    # --------------------------------------------------------------- sweep
    def sweep(self, decode_dir, output_dir, targets, compress=True):
        """Any-to-ALL conversion: every source utterance decoded to every
        target speaker, batched along the speaker axis (BASELINE.json config
        "conversion inference sweep"). Each source is encoded ONCE; its code
        sequence is tiled across the K targets and decoded in one jitted call
        per bucket. Outputs are keyed ``<utt>__<target>``.
        """
        import jax
        import jax.numpy as jnp

        if not type(self.model).__module__.endswith(".vqvae"):
            # hierarchical/VAE families: the shared bucketed masked path
            # (vqvae2/2a/2b encode once and decode per target inside
            # _sweep_generic; the flat model keeps the speaker-axis decode
            # below)
            return self._sweep_generic(decode_dir, output_dir, targets,
                                       compress=compress)
        decode_dir = Path(decode_dir)
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        feats_scp = kaldi_io.load_dict_data(decode_dir / "feats.scp")
        spk_map = None
        if (decode_dir / "spk2spk_id").exists():
            spk_map = {k: int(v) for k, v in kaldi_io.load_dict_data(
                decode_dir / "spk2spk_id").items()}
        tgt_ids = [spk_map[t] if spk_map else int(t) for t in targets]
        tgt_names = [str(t) for t in targets]
        K = len(tgt_ids)

        from ..models.vqvae import Encoder as FlatEncoder

        encode_jit = jax.jit(lambda v, x, l: self.model.apply(
            v, x, l, method="encode"))
        decode_jit = jax.jit(lambda v, ids, y, l: self.model.apply(
            v, ids, y, l, method="decode"))

        jobs = [(u, rx, kaldi_io.matrix_header(rx)[0])
                for u, rx in feats_scp.items()]
        buckets: dict[int, list] = {}
        pick_bucket = self._bucket_fn(jobs)
        for job in jobs:
            buckets.setdefault(pick_bucket(job[2]), []).append(job)

        wspec = f"ark,scp:{output_dir}/feats.ark,{output_dir}/feats.scp"
        n_done = 0
        enc_arch = self.config.get("encoder", {})
        with kaldi_io.write_helper(
                wspec, compression_method=1 if compress else None) as wf:
            for T_pad in sorted(buckets):
                for utt, rx, T in buckets[T_pad]:
                    x = np.zeros((1, T_pad, kaldi_io.matrix_header(rx)[1]),
                                 np.float32)
                    x[0, :T] = kaldi_io.load_mat(rx)
                    lengths = jnp.asarray([T], jnp.int32)
                    ids = encode_jit(self.variables, jnp.asarray(x), lengths)
                    z_len = int(FlatEncoder.out_lengths(
                        enc_arch, np.asarray([T]))[0])
                    ids_k = jnp.tile(ids, (K, 1))
                    z_lens = jnp.full((K,), z_len, jnp.int32)
                    out = np.asarray(decode_jit(
                        self.variables, ids_k,
                        jnp.asarray(tgt_ids, jnp.int32), z_lens))
                    for k, name in enumerate(tgt_names):
                        wf[f"{utt}__{name}"] = out[k, :min(T, out.shape[1])]
                        n_done += 1
                    logger.info(f"Sweep: {utt} -> {K} targets")
        return n_done

    def _sweep_generic(self, decode_dir, output_dir, targets, compress=True):
        """Any-to-all sweep via the shared bucketed masked path.

        Hierarchical families (vqvae2/2a/2b) encode each batch ONCE and
        decode per target — their ``infer`` is literally encode∘decode
        (models/vqvae2*.py), so this halves the sweep's encoder work for
        K targets with identical results; any device failure falls back to
        the per-target infer path (which carries the CPU retry). Other
        families run per-target infer directly.
        """
        import jax
        import jax.numpy as jnp

        decode_dir = Path(decode_dir)
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        feats_scp = kaldi_io.load_dict_data(decode_dir / "feats.scp")
        spk_map = None
        if (decode_dir / "spk2spk_id").exists():
            spk_map = {k: int(v) for k, v in kaldi_io.load_dict_data(
                decode_dir / "spk2spk_id").items()}
        tgt_ids = [spk_map[t] if spk_map else int(t) for t in targets]
        tgt_names = [str(t) for t in targets]

        jobs = [(u, rx, kaldi_io.matrix_header(rx)[0])
                for u, rx in feats_scp.items()]
        buckets: dict[int, list] = {}
        pick_bucket = self._bucket_fn(jobs)
        for job in jobs:
            buckets.setdefault(pick_bucket(job[2]), []).append(job)

        mod = type(self.model).__module__
        hier = mod.endswith((".vqvae2", ".vqvae2a", ".vqvae2b"))
        with_style = mod.endswith(".vqvae2")   # encode returns (ids, style)
        if hier:
            encode_jit = jax.jit(lambda v, x, l: self.model.apply(
                v, x, l, method="encode"))
            if with_style:
                decode_jit = jax.jit(
                    lambda v, enc, y, tl, l: self.model.apply(
                        v, enc[0], y, style=enc[1], target_len=tl,
                        lengths=l, method="decode"), static_argnums=3)
            else:
                decode_jit = jax.jit(
                    lambda v, enc, y, tl, l: self.model.apply(
                        v, enc, y, target_len=tl, lengths=l,
                        method="decode"), static_argnums=3)

        wspec = f"ark,scp:{output_dir}/feats.ark,{output_dir}/feats.scp"
        n_done = 0
        with kaldi_io.write_helper(
                wspec, compression_method=1 if compress else None) as wf:
            for T_pad in sorted(buckets):
                group = buckets[T_pad]
                for lo in range(0, len(group), self.batch_size):
                    chunk = group[lo:lo + self.batch_size]
                    D = kaldi_io.matrix_header(chunk[0][1])[1]
                    feats = np.zeros((self.batch_size, T_pad, D), np.float32)
                    lengths = np.ones((self.batch_size,), np.int32)
                    for b, (utt, rx, T) in enumerate(chunk):
                        feats[b, :T] = kaldi_io.load_mat(rx)
                        lengths[b] = T
                    outs = None
                    if hier:
                        try:
                            enc = encode_jit(self.variables,
                                             jnp.asarray(feats),
                                             jnp.asarray(lengths))
                            outs = {}
                            for tid, name in zip(tgt_ids, tgt_names):
                                tgts = jnp.full((self.batch_size,), tid,
                                                jnp.int32)
                                outs[name] = np.asarray(decode_jit(
                                    self.variables, enc, tgts, T_pad,
                                    jnp.asarray(lengths)))
                        except Exception as e:  # noqa: BLE001
                            logger.warning(
                                f"encode-once sweep failed "
                                f"({type(e).__name__}: {e}); falling back "
                                f"to per-target infer for this batch")
                            outs = None
                    if outs is None:
                        outs = {}
                        for tid, name in zip(tgt_ids, tgt_names):
                            tgts = np.full((self.batch_size,), tid, np.int32)
                            outs[name] = self._infer_with_fallback(
                                feats, tgts, lengths)
                    for name in tgt_names:
                        out = outs[name]
                        for b, (utt, rx, T) in enumerate(chunk):
                            wf[f"{utt}__{name}"] = out[b, :min(T,
                                                               out.shape[1])]
                            n_done += 1
                    logger.info(f"Sweep: {len(chunk)} utts -> "
                                f"{len(tgt_ids)} targets")
        return n_done

    # ------------------------------------------------------------------ decode
    def decode(self, decode_dir, output_dir, compress=True):
        import jax.numpy as jnp

        decode_dir = Path(decode_dir)
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        for f in ("trials", "feats.scp"):
            if not (decode_dir / f).is_file():
                raise FileNotFoundError(decode_dir / f)

        trials = [line for line in kaldi_io.load_list_data(decode_dir / "trials")]
        feats_scp = kaldi_io.load_dict_data(decode_dir / "feats.scp")
        spk_map = None
        if (decode_dir / "spk2spk_id").exists():
            spk_map = {k: int(v) for k, v in
                       kaldi_io.load_dict_data(decode_dir / "spk2spk_id").items()}

        # resolve trials → (utt, rx, T, target_ids)
        jobs = []
        for parts in trials:
            utt, targets = parts[0], parts[1:]
            tgt = []
            for t in targets:
                try:
                    tgt.append(spk_map[t] if spk_map else int(t))
                except (ValueError, KeyError) as e:
                    raise ValueError(
                        f"trial target {t!r} in {decode_dir}/trials is not "
                        f"{'in spk2spk_id' if spk_map else 'an integer id'}; "
                        f"named targets need a spk2spk_id file in the "
                        f"decode dir (reference decoder/basic.py:50-53)"
                    ) from e
            T = kaldi_io.matrix_header(feats_scp[utt])[0]
            jobs.append((utt, feats_scp[utt], T, tgt))

        # bucket by padded length; masked inference keeps padded batches
        # numerically identical to unpadded runs for every model family
        buckets: dict[int, list] = {}
        pick_bucket = self._bucket_fn(jobs)
        for job in jobs:
            buckets.setdefault(pick_bucket(job[2]), []).append(job)

        wspec = f"ark,scp:{output_dir}/feats.ark,{output_dir}/feats.scp"
        n_done = 0
        with kaldi_io.write_helper(
                wspec, compression_method=1 if compress else None) as wf:
            for T_pad in sorted(buckets):
                batch_jobs = buckets[T_pad]
                for lo in range(0, len(batch_jobs), self.batch_size):
                    chunk = batch_jobs[lo:lo + self.batch_size]
                    B = self.batch_size
                    D = kaldi_io.matrix_header(chunk[0][1])[1]
                    feats = np.zeros((B, T_pad, D), np.float32)
                    lengths = np.zeros((B,), np.int32)
                    # multi-target trials lines carry PER-LEVEL speaker ids
                    # for the hierarchical families ("utt spkA spkB spkC" →
                    # level i conditioned on speaker i, reference
                    # vqvae2a.py:111/vqvae2b.py:78); rows with fewer targets
                    # repeat the last one, and single-speaker families read
                    # column 0 — identical to the old behavior for K == 1
                    K = max(len(j[3]) for j in chunk)
                    tgts = np.zeros((B, K), np.int32)
                    for b, (utt, rx, T, tgt) in enumerate(chunk):
                        feats[b, :T] = kaldi_io.load_mat(rx)
                        lengths[b] = T
                        tgts[b] = [tgt[min(j, len(tgt) - 1)]
                                   for j in range(K)]
                    lengths = np.maximum(lengths, 1)
                    out = self._infer_with_fallback(feats, tgts, lengths)
                    for b, (utt, rx, T, tgt) in enumerate(chunk):
                        # strided encoder/decoder pairs may round the length
                        wf[utt] = out[b, :min(T, out.shape[1])]
                        n_done += 1
                        logger.info(f"Decode {n_done}: {utt} to "
                                    f"{' '.join(map(str, tgt))}")
        return n_done
