"""Corpus-adaptive decode bucketing (decode_bucket_auto).

auto_bucket_edges is an exact partition DP over align-rounded lengths; the
edges must (a) cover every length, (b) be optimal (checked against brute
force on a small case), and (c) leave conversion outputs identical to the
fixed-grid policy (masked inference is bucket-invariant).
"""

import itertools

import numpy as np

from vae_npvc_tpu.data import kaldi_io
from vae_npvc_tpu.infer.convert import _bucket, auto_bucket_edges


def _brute_force(lengths, max_buckets, align, min_len):
    cands = sorted({max(-(-int(T) // align) * align, min_len)
                    for T in lengths})
    best, best_edges = float("inf"), None
    for k in range(1, min(max_buckets, len(cands)) + 1):
        for combo in itertools.combinations(cands, k):
            if combo[-1] != cands[-1]:
                continue
            cost = 0
            ok = True
            for T in lengths:
                r = max(-(-int(T) // align) * align, min_len)
                edge = next((e for e in combo if e >= r), None)
                if edge is None:
                    ok = False
                    break
                cost += edge - T
            if ok and cost < best:
                best, best_edges = cost, list(combo)
    return best, best_edges


def test_edges_cover_and_are_optimal():
    rng = np.random.default_rng(0)
    lengths = list(rng.integers(10, 400, size=40))
    for K in (1, 2, 3, 4):
        edges = auto_bucket_edges(lengths, max_buckets=K, align=32,
                                  min_len=8)
        # coverage
        assert max(edges) >= max(lengths)
        assert len(edges) <= K
        cost = sum(next(e for e in edges if e >= max(
            -(-int(T) // 32) * 32, 8)) - T for T in lengths)
        want, _ = _brute_force(lengths, K, 32, 8)
        assert cost == want, (K, cost, want)


def _waste(lengths, edges):
    return sum(next(e for e in edges if e >= max(
        -(-int(T) // 32) * 32, 8)) - T for T in lengths)


def test_auto_waste_not_worse_than_fixed_grid():
    rng = np.random.default_rng(1)
    # uniform corpus: auto is never worse than the fixed grid
    uniform = list(rng.integers(20, 900, size=200))
    edges = auto_bucket_edges(uniform, max_buckets=6, align=32, min_len=8)
    assert _waste(uniform, edges) <= sum(
        _bucket(int(T), 256, 8) - T for T in uniform)
    # skewed corpus (many short, few long — the realistic shape): the fixed
    # 256 grid pads every short utterance to 256; auto cuts waste sharply
    skewed = list(rng.integers(40, 120, size=180)) + \
        list(rng.integers(600, 900, size=20))
    edges = auto_bucket_edges(skewed, max_buckets=6, align=32, min_len=8)
    fixed = sum(_bucket(int(T), 256, 8) - T for T in skewed)
    assert _waste(skewed, edges) < 0.5 * fixed


def test_decode_outputs_identical_to_fixed(tmp_path):
    import sys
    from pathlib import Path as P
    sys.path.insert(0, str(P(__file__).parent))
    from toy_config import toy_config

    from vae_npvc_tpu.infer.convert import Converter
    from vae_npvc_tpu.train.trainer import Trainer

    cfg = toy_config()
    tr = Trainer(cfg)
    rng = np.random.default_rng(2)
    batch = (rng.normal(size=(2, 32, 10)).astype(np.float32),
             np.zeros((2,), np.int32))
    tr.init_state(batch)
    tr.train_step(batch)
    ck = tmp_path / "m.ckpt"
    tr.save_checkpoint(ck)

    dec = tmp_path / "dec"
    dec.mkdir()
    with kaldi_io.ArkWriter(dec / "f.ark", dec / "feats.scp") as w, \
            open(dec / "trials", "w") as tf:
        for i, T in enumerate((12, 40, 70)):
            w.write(f"u{i}", rng.normal(size=(T, 10)).astype(np.float32))
            tf.write(f"u{i} {i % 3}\n")

    outs = {}
    for mode, extra in (("fixed", {}),
                        ("auto", {"decode_bucket_auto": True,
                                  "decode_max_buckets": 3})):
        cv = Converter(dict(cfg, decode_bucket_size=32, **extra))
        cv.load_checkpoint(ck)
        assert cv.decode(dec, tmp_path / mode, compress=False) == 3
        outs[mode] = dict(kaldi_io.read_ark(
            f"scp:{tmp_path / mode}/feats.scp"))
    for u in outs["fixed"]:
        # bucket/batch composition differs → ulp-level reassociation only
        np.testing.assert_allclose(outs["auto"][u], outs["fixed"][u],
                                   rtol=1e-5, atol=1e-6)
