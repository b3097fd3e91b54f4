"""Tests: Gaussian VAE model family + the all-targets conversion sweep."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_npvc_tpu.data import kaldi_io
from vae_npvc_tpu.infer.convert import Converter
from vae_npvc_tpu.models import build_model
from vae_npvc_tpu.train.trainer import Trainer

FLAT = {
    "model_type": "vae_npvc.model.vqvae", "trainer_type": "basic", "seed": 5,
    "y_dim": 8, "y_num": 4, "z_dim": 8, "z_num": 16,
    "use_ema": True, "beta": 0.01, "mu": 0.9, "jitter_p": 0.0,
    "optim_type": "Adam", "learning_rate": 1e-3, "max_grad_norm": 10,
    "decode_bucket_size": 32, "decode_batch_size": 4,
    "use_pallas_vq": False, "use_native_loader": False,
    "encoder": {"in_channels": [10], "out_channels": [12], "kernel_size": 3,
                "downsample_scales": [1], "z_channels": 8, "dilation": False,
                "stack_kernel_size": 3, "stack_layers": 1, "stacks": [1],
                "use_weight_norm": True},
    "decoder": {"in_channels": [8], "out_channels": [12], "cond_channels": 8,
                "skip_channels": 8, "final_channels": 10, "kernel_size": 3,
                "upsample_scales": [1], "dilation": False,
                "stack_kernel_size": 3, "stacks": [1],
                "use_weight_norm": True},
}


class TestGaussianVae:
    def test_forward_and_infer(self):
        cfg = dict(FLAT, model_type="vae_npvc.model.vae", kld_weight=1.0)
        cfg["encoder"] = dict(FLAT["encoder"], z_channels=16)  # mu ‖ logvar
        model = build_model(cfg)
        x = jnp.array(np.random.default_rng(0).normal(size=(2, 16, 10)),
                      jnp.float32)
        y = jnp.array([0, 2], jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "vq": jax.random.PRNGKey(1)}, x, y,
                               train=True)
        xhat, loss, detail = model.apply(variables, x, y, train=True,
                                         rngs={"vq": jax.random.PRNGKey(2)})
        assert xhat.shape == (2, 16, 10)
        assert np.isfinite(float(loss))
        assert "KLD loss" in detail and float(detail["KLD loss"]) > 0
        # eval forward is deterministic (posterior mean)
        a = model.apply(variables, x, y, train=False)[0]
        b = model.apply(variables, x, y, train=False)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        out = model.apply(variables, x, y, method="infer")
        assert out.shape == (2, 16, 10)

    def test_trainable(self):
        cfg = dict(FLAT, model_type="vae_npvc.model.vae", kld_weight=0.1)
        cfg["encoder"] = dict(FLAT["encoder"], z_channels=16)
        tr = Trainer(cfg)
        rng = np.random.default_rng(1)
        batch = (rng.normal(size=(4, 16, 10)).astype(np.float32),
                 np.zeros((4,), np.int32))
        tr.init_state(batch)
        first = None
        for _ in range(10):
            d = tr.train_step(batch)
            if first is None:
                first = float(d["Total"])
        assert float(d["Total"]) < first


class TestSweep:
    def test_all_targets_matches_trials_decode(self, tmp_path):
        tr = Trainer(FLAT)
        rng = np.random.default_rng(0)
        batch = (rng.normal(size=(2, 16, 10)).astype(np.float32),
                 np.zeros((2,), np.int32))
        tr.init_state(batch)
        tr.train_step(batch)
        ck = tmp_path / "m.ckpt"
        tr.save_checkpoint(ck)

        dec_dir = tmp_path / "dec"
        dec_dir.mkdir()
        with kaldi_io.ArkWriter(dec_dir / "f.ark", dec_dir / "feats.scp") as w:
            for i, T in enumerate((14, 25)):
                w.write(f"u{i}", rng.normal(size=(T, 10)).astype(np.float32))

        cv = Converter(FLAT)
        cv.load_checkpoint(ck)
        out_dir = tmp_path / "sweep"
        n = cv.sweep(dec_dir, out_dir, ["1", "3"])
        assert n == 4  # 2 utts × 2 targets
        mats = dict(kaldi_io.read_ark(f"scp:{out_dir}/feats.scp"))
        assert set(mats) == {"u0__1", "u0__3", "u1__1", "u1__3"}
        assert mats["u1__3"].shape == (25, 10)

        # sweep output equals the trials-driven decode for the same pair
        (dec_dir / "trials").write_text("u0 3\nu1 1\n")
        out2 = tmp_path / "trials_out"
        cv.decode(dec_dir, out2, compress=False)
        mats2 = dict(kaldi_io.read_ark(f"scp:{out2}/feats.scp"))
        # sweep arks are compressed (method 1) → compare loosely
        np.testing.assert_allclose(mats["u0__3"], mats2["u0"], rtol=1e-2,
                                   atol=5e-3)
        np.testing.assert_allclose(mats["u1__1"], mats2["u1"], rtol=1e-2,
                                   atol=5e-3)


def test_sweep_hierarchical(tmp_path):
    """Generic sweep fallback covers hierarchical models."""
    import sys
    from pathlib import Path as P
    sys.path.insert(0, str(P(__file__).parent))
    from test_convert_hier import hier_cfg

    from vae_npvc_tpu.infer.convert import Converter
    from vae_npvc_tpu.train.trainer import Trainer

    cfg = hier_cfg()
    tr = Trainer(cfg)
    rng = np.random.default_rng(0)
    batch = (rng.normal(size=(2, 16, 10)).astype(np.float32),
             np.zeros((2,), np.int32))
    tr.init_state(batch)
    tr.train_step(batch)
    ck = tmp_path / "m.ckpt"
    tr.save_checkpoint(ck)

    dec = tmp_path / "dec"
    dec.mkdir()
    with kaldi_io.ArkWriter(dec / "f.ark", dec / "feats.scp") as w:
        for i, T in enumerate((16, 24)):
            w.write(f"u{i}", rng.normal(size=(T, 10)).astype(np.float32))
    cv = Converter(cfg)
    cv.load_checkpoint(ck)
    n = cv.sweep(dec, tmp_path / "out", targets=["1", "2", "3"])
    assert n == 6
    mats = dict(kaldi_io.read_ark(f"scp:{tmp_path / 'out'}/feats.scp"))
    assert sorted(mats) == ["u0__1", "u0__2", "u0__3",
                            "u1__1", "u1__2", "u1__3"]
    assert mats["u1__2"].shape == (24, 10)
    assert all(np.all(np.isfinite(m)) for m in mats.values())


def test_hier_sweep_encode_once_matches_infer(tmp_path):
    """The hierarchical sweep's encode-once/decode-per-target path must
    equal the per-target infer (infer IS encode∘decode; ulp tolerance for
    jit fusion differences)."""
    import sys
    from pathlib import Path as P
    sys.path.insert(0, str(P(__file__).parent))
    from test_convert_hier import hier_cfg

    from vae_npvc_tpu.infer.convert import Converter
    from vae_npvc_tpu.train.trainer import Trainer

    cfg = hier_cfg()
    tr = Trainer(cfg)
    rng = np.random.default_rng(3)
    batch = (rng.normal(size=(2, 16, 10)).astype(np.float32),
             np.zeros((2,), np.int32))
    tr.init_state(batch)
    tr.train_step(batch)
    ck = tmp_path / "m.ckpt"
    tr.save_checkpoint(ck)

    dec = tmp_path / "dec"
    dec.mkdir()
    utts = {}
    with kaldi_io.ArkWriter(dec / "f.ark", dec / "feats.scp") as w:
        for i, T in enumerate((16, 24)):
            utts[f"u{i}"] = rng.normal(size=(T, 10)).astype(np.float32)
            w.write(f"u{i}", utts[f"u{i}"])
    cv = Converter(cfg)
    cv.load_checkpoint(ck)
    assert cv.sweep(dec, tmp_path / "out", ["1", "2"], compress=False) == 4
    mats = dict(kaldi_io.read_ark(f"scp:{tmp_path / 'out'}/feats.scp"))

    # oracle: the SAME padded batch through per-target infer
    B = cv.batch_size
    T_pad = max(((24 + cv.bucket_size - 1) // cv.bucket_size)
                * cv.bucket_size, cv.min_frames)
    feats = np.zeros((B, T_pad, 10), np.float32)
    lengths = np.ones((B,), np.int32)
    for b, (u, m) in enumerate(utts.items()):
        feats[b, :m.shape[0]] = m
        lengths[b] = m.shape[0]
    for tid, name in ((1, "1"), (2, "2")):
        want = cv._infer_with_fallback(
            feats, np.full((B,), tid, np.int32), lengths)
        for b, (u, m) in enumerate(utts.items()):
            T = m.shape[0]
            np.testing.assert_allclose(
                mats[f"{u}__{name}"], want[b, :min(T, want.shape[1])],
                rtol=1e-5, atol=1e-5)
