"""Serving-bundle export: jax.export artifacts == live Converter outputs.

The bundle (infer/export_serving.py) is a beyond-reference deployment
artifact; these tests pin its contract: a deserialized StableHLO bucket must
produce exactly the same converted mel as the in-process jitted model, the
convenience ``convert`` API must bucket/trim like infer/convert, and the
embedded speaker map + shape guards must behave.
"""

import numpy as np
import pytest

from tests.toy_config import toy_config
from vae_npvc_tpu.infer.convert import Converter
from vae_npvc_tpu.infer.export_serving import ServingBundle, export_bundle
from vae_npvc_tpu.train.trainer import Trainer


def _make_ckpt(cfg, tmp, D=10):
    tr = Trainer(cfg)
    rng = np.random.default_rng(0)
    batch = (rng.normal(size=(2, 32, D)).astype(np.float32),
             np.zeros((2,), np.int32))
    tr.init_state(batch)
    tr.train_step(batch)
    ck = tmp / "m.ckpt"
    tr.save_checkpoint(ck)
    return ck


@pytest.fixture(scope="module")
def flat_bundle(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("export_flat")
    cfg = toy_config()
    ck = _make_ckpt(cfg, tmp)
    meta = export_bundle(cfg, ck, tmp / "bundle", buckets=[32, 64],
                         batch_size=2, n_targets=1, platforms=("cpu",),
                         spk2spk_id={"A": 0, "B": 1, "C": 2})
    return cfg, ck, tmp / "bundle", meta


def test_bundle_metadata(flat_bundle):
    cfg, ck, path, meta = flat_bundle
    assert meta["buckets"] == [32, 64]
    assert meta["batch_size"] == 2 and meta["n_targets"] == 1
    assert meta["feat_dim"] == 10
    assert (path / "params.msgpack").exists()
    assert (path / "bucket_00032.hlo").exists()
    assert (path / "bucket_00064.hlo").exists()


def test_bundle_matches_live_converter(flat_bundle):
    """Deserialized artifact output == in-process jitted model, bit-exact."""
    cfg, ck, path, _ = flat_bundle
    bundle = ServingBundle(path)
    conv = Converter(dict(cfg, use_pallas_vq=False))
    conv.load_checkpoint(ck)

    rng = np.random.default_rng(1)
    feats = np.zeros((2, 32, 10), np.float32)
    feats[0, :20] = rng.normal(size=(20, 10))
    feats[1, :27] = rng.normal(size=(27, 10))
    tgts = np.array([[1], [2]], np.int32)
    lengths = np.array([20, 27], np.int32)

    got = bundle.infer(feats, tgts, lengths)
    want = conv._infer_with_fallback(feats, tgts, lengths)
    np.testing.assert_array_equal(got, want)


def test_convert_buckets_and_trims(flat_bundle):
    """convert(): per-item results trimmed to true lengths, both buckets."""
    cfg, ck, path, _ = flat_bundle
    bundle = ServingBundle(path)
    conv = Converter(dict(cfg, use_pallas_vq=False))
    conv.load_checkpoint(ck)

    rng = np.random.default_rng(2)
    items = [(rng.normal(size=(20, 10)).astype(np.float32), 1),
             (rng.normal(size=(50, 10)).astype(np.float32), "C"),
             (rng.normal(size=(27, 10)).astype(np.float32), [2])]
    outs = bundle.convert(items)
    assert [o.shape[0] for o in outs] == [20, 50, 27]

    # oracle: the same padded batches through the live model. Batch
    # composition differs (B=1 here vs the bundle's B=2 padding), so XLA
    # reassociation gives ulp-level differences — the bit-exact pin is
    # test_bundle_matches_live_converter, which matches shapes exactly.
    for (feat, tgt), out in zip(items, outs):
        T = feat.shape[0]
        Tp = 32 if T <= 32 else 64
        x = np.zeros((1, Tp, 10), np.float32)
        x[0, :T] = feat
        tid = {1: 1, "C": 2}.get(tgt if not isinstance(tgt, list) else tgt[0],
                                 2)
        want = conv._infer_with_fallback(
            x, np.array([[tid]], np.int32), np.array([T], np.int32))
        np.testing.assert_allclose(out, want[0, :T], rtol=1e-5, atol=1e-5)


def test_guards_and_name_resolution(flat_bundle):
    cfg, ck, path, _ = flat_bundle
    bundle = ServingBundle(path)
    assert bundle.resolve_target("B") == 1
    assert bundle.resolve_target(2) == 2
    assert bundle.resolve_target("2") == 2
    with pytest.raises(KeyError):
        bundle.resolve_target("nope")
    with pytest.raises(ValueError, match="largest exported bucket"):
        bundle.pick_bucket(100)
    with pytest.raises(ValueError, match="targets per row"):
        bundle.infer(np.zeros((1, 8, 10), np.float32),
                     np.zeros((1, 2), np.int32), np.array([8]))
    with pytest.raises(ValueError, match="feat dim"):
        bundle.infer(np.zeros((1, 8, 9), np.float32),
                     np.zeros((1,), np.int32), np.array([8]))


def test_cli_export(flat_bundle, tmp_path):
    """bin/export_serving end to end: YAML + ckpt + spk map -> bundle."""
    import yaml

    from vae_npvc_tpu.bin.export_serving import main

    cfg, ck, _, _ = flat_bundle
    cfg_path = tmp_path / "conf.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    (tmp_path / "spk2spk_id").write_text("A 0\nB 1\nC 2\n")
    out = tmp_path / "bundle"
    main(["-c", str(cfg_path), "-m", str(ck), "-o", str(out),
          "--buckets", "32", "--batch_size", "2", "--platforms", "cpu",
          "--spk2spk_id", str(tmp_path / "spk2spk_id")])
    bundle = ServingBundle(out)
    assert bundle.resolve_target("B") == 1
    feat = np.random.default_rng(4).normal(size=(16, 10)).astype(np.float32)
    (o,) = bundle.convert([(feat, "A")])
    assert o.shape == (16, 10) and np.isfinite(o).all()


def test_hierarchical_bundle_matches_converter(tmp_path):
    """vqvae2 (3 levels + GST): exported artifact == live masked infer."""
    from tests.test_model_vqvae2 import make_cfg

    cfg = make_cfg(use_gst=True, use_ema=False)
    cfg.update({"optim_type": "Adam", "learning_rate": 1e-3,
                "max_grad_norm": 10, "seed": 7, "use_pallas_vq": False})
    ck = _make_ckpt(cfg, tmp_path)
    export_bundle(cfg, ck, tmp_path / "bundle", buckets=[32],
                  batch_size=2, n_targets=1, platforms=("cpu",))
    bundle = ServingBundle(tmp_path / "bundle")

    conv = Converter(dict(cfg))
    conv.load_checkpoint(ck)
    rng = np.random.default_rng(3)
    feats = np.zeros((2, 32, 10), np.float32)
    feats[0, :24] = rng.normal(size=(24, 10))
    feats[1, :32] = rng.normal(size=(32, 10))
    tgts = np.array([[1], [3]], np.int32)
    lengths = np.array([24, 32], np.int32)
    got = bundle.infer(feats, tgts, lengths)
    want = conv._infer_with_fallback(feats, tgts, lengths)
    np.testing.assert_array_equal(got, want)


def test_single_bucket_bundle_cpu_retry_and_y_num(flat_bundle, tmp_path):
    """Fault-injected device failure falls back to the artifact's cpu
    lowering; y_num is embedded for integer-target listings."""
    cfg, ck, path, meta = flat_bundle
    assert meta["y_num"] == 3
    bundle = ServingBundle(path)
    feats = np.random.default_rng(6).normal(size=(1, 16, 10)).astype(
        np.float32)
    want = bundle.infer(feats, np.array([1], np.int32), np.array([16]))

    real = bundle._fn(32)

    class FlakyOnce:
        calls = 0

        def call(self, *args):
            FlakyOnce.calls += 1
            if FlakyOnce.calls == 1:
                raise RuntimeError("injected device failure")
            return real.call(*args)

    bundle._fns[32] = FlakyOnce()
    got = bundle.infer(feats, np.array([1], np.int32), np.array([16]))
    assert FlakyOnce.calls == 2          # failed once, retried on cpu
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_int8_quantized_bundle(flat_bundle, tmp_path):
    """Weight-only int8: smaller params, bounded weight rounding error,
    loader dequantizes transparently (same call convention)."""
    from vae_npvc_tpu.infer.export_serving import (_Q8_KEY, _dequantize_tree,
                                                   _quantize_tree)

    cfg, ck, fp32_path, _ = flat_bundle
    meta = export_bundle(cfg, ck, tmp_path / "q8", buckets=[32],
                         batch_size=2, platforms=("cpu",),
                         quantize="int8", quantize_min_size=64)
    assert meta["quantize"] == "int8"
    # quantization bound: |deq - orig| <= scale/2 per element
    rng = np.random.default_rng(8)
    w = rng.normal(size=(3, 12, 12)).astype(np.float32)
    q = _quantize_tree({"k": w}, min_size=64)["k"]
    assert q[_Q8_KEY].dtype == np.int8
    deq = _dequantize_tree(q)
    assert np.all(np.abs(deq - w) <= q["scale"] / 2 + 1e-7)

    size_q8 = (tmp_path / "q8" / "params.msgpack").stat().st_size
    size_fp = (fp32_path / "params.msgpack").stat().st_size
    assert size_q8 < 0.6 * size_fp      # most weight bytes went int8

    bundle = ServingBundle(tmp_path / "q8")
    ref = ServingBundle(fp32_path)
    feats = np.zeros((2, 32, 10), np.float32)
    feats[0, :20] = rng.normal(size=(20, 10))
    feats[1, :32] = rng.normal(size=(32, 10))
    lengths = np.array([20, 32], np.int32)
    tgts = np.array([1, 2], np.int32)
    got = bundle.infer(feats, tgts, lengths)
    want = ref.infer(feats, tgts, lengths)
    assert got.shape == want.shape and np.isfinite(got).all()
    # weight rounding is small for a near-init toy model
    assert float(np.abs(got - want).mean()) < 0.1


def test_quantize_guards_and_formats(flat_bundle, tmp_path):
    """Mode validated before any artifact is written; quantized bundles
    carry format_version 2; 1-D leaves never get per-element scales."""
    from vae_npvc_tpu.infer.export_serving import _Q8_KEY, _quantize_tree

    cfg, ck, _, meta_fp32 = flat_bundle
    assert meta_fp32["format_version"] == 1
    with pytest.raises(ValueError, match="quantize mode"):
        export_bundle(cfg, ck, tmp_path / "bad", buckets=[32],
                      batch_size=2, platforms=("cpu",), quantize="int4")
    assert not list((tmp_path / "bad").glob("*.hlo")) \
        if (tmp_path / "bad").exists() else True

    meta = export_bundle(cfg, ck, tmp_path / "q8", buckets=[32],
                         batch_size=2, platforms=("cpu",),
                         quantize="int8", quantize_min_size=64)
    assert meta["format_version"] == 2

    # 1-D float leaf above min_size stays fp32 (a per-last-axis scale would
    # be per-element, inflating the leaf)
    bias = np.random.default_rng(9).normal(size=(4096,)).astype(np.float32)
    q = _quantize_tree({"bias": bias}, min_size=64)["bias"]
    assert isinstance(q, np.ndarray) and q.dtype == np.float32


def test_bundle_check_uses_last_trial_line(flat_bundle, tmp_path):
    """A source utt repeated with different targets: decode's scp keeps the
    LAST write, so bundle_check must compare against the last trial line."""
    from vae_npvc_tpu.bin.bundle_check import main as check_main
    from vae_npvc_tpu.data import kaldi_io

    cfg, ck, bundle_path, _ = flat_bundle
    conv = Converter(dict(cfg, use_pallas_vq=False))
    conv.load_checkpoint(ck)

    dec = tmp_path / "dec"
    dec.mkdir()
    rng = np.random.default_rng(11)
    with kaldi_io.ArkWriter(dec / "f.ark", dec / "feats.scp") as w:
        w.write("u0", rng.normal(size=(20, 10)).astype(np.float32))
    (dec / "trials").write_text("u0 1\nu0 2\n")
    out = tmp_path / "off"
    assert conv.decode(dec, out) == 2
    check_main(["--bundle", str(bundle_path), "--decode_dir", str(dec),
                "--offline_scp", str(out / "feats.scp")])  # PASS = no exit
