"""Converter drives hierarchical models via the same bucketed-padded
batching as the flat model (masked inference makes padded == unpadded,
tests/test_masked_inference.py)."""

import numpy as np
import jax
import pytest

from vae_npvc_tpu.data import kaldi_io
from vae_npvc_tpu.infer.convert import Converter
from vae_npvc_tpu.train.trainer import Trainer


def hier_cfg():
    def enc(in_ch, ds):
        return {"in_channels": [in_ch], "out_channels": [16],
                "kernel_size": 3, "downsample_scales": [ds], "z_channels": 8,
                "dilation": False, "stack_kernel_size": 3, "stack_layers": 1,
                "stacks": [1], "use_weight_norm": True}

    def dec(in_ch, cond, final):
        return {"in_channels": [in_ch], "out_channels": [16],
                "cond_channels": cond, "skip_channels": 8,
                "final_channels": final, "kernel_size": 3,
                "upsample_scales": [1], "dilation": False,
                "stack_kernel_size": 3, "stacks": [1],
                "use_weight_norm": True}

    return {
        "model_type": "vae_npvc.model.vqvae2", "trainer_type": "basic",
        "levels": 2, "y_dim": 8, "y_num": 4, "beta": 0.01,
        "use_gst": False, "use_ema": False, "jitter_p": 0.0, "seed": 3,
        "optim_type": "Adam", "learning_rate": 1e-3, "max_grad_norm": 10,
        "decode_batch_size": 4,
        "encoder.0": enc(10, 1), "encoder.1": enc(16, 2),
        "decoder.0": dec(16, 8, 10), "decoder.1": dec(8, 8, 8),
        "quantizer.0": {"z_dim": 8, "z_num": 16, "normalize": True},
        "quantizer.1": {"z_dim": 8, "z_num": 16, "normalize": True},
    }


def test_decode_hierarchical(tmp_path):
    cfg = hier_cfg()
    tr = Trainer(cfg)
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
        for i, T in enumerate((16, 16, 24)):   # two equal-length + one other
            w.write(f"u{i}", rng.normal(size=(T, 10)).astype(np.float32))
    (dec_dir / "trials").write_text("u0 1\nu1 2\nu2 1\n")

    cv = Converter(cfg)
    assert cv.supports_lengths   # hierarchical models bucket like the flat path
    cv.load_checkpoint(ck)
    out_dir = tmp_path / "out"
    assert cv.decode(dec_dir, out_dir) == 3
    mats = dict(kaldi_io.read_ark(f"scp:{out_dir}/feats.scp"))
    assert mats["u0"].shape == (16, 10)
    assert mats["u2"].shape == (24, 10)
    assert all(np.all(np.isfinite(m)) for m in mats.values())


def test_multi_target_trials_per_level_speakers(tmp_path):
    """A trials line 'utt spkA spkB' conditions level i on speaker i for
    families with per-level speakers (reference vqvae2b.py:78); rows with
    fewer targets repeat the last, and 'utt 1' equals 'utt 1 1'."""
    cfg = hier_cfg()
    cfg["model_type"] = "vae_npvc.model.vqvae2b"
    cfg["decoder.0"] = dict(cfg["decoder.0"], in_channels=[8],
                            final_channels=10)
    cfg["decoder.1"] = dict(cfg["decoder.1"], final_channels=10)
    cfg["final_decoder"] = {"in_channels": [20], "out_channels": [16],
                            "cond_channels": 0, "skip_channels": 8,
                            "final_channels": 10, "kernel_size": 3,
                            "upsample_scales": [1], "dilation": False,
                            "stack_kernel_size": 3, "stacks": [1],
                            "use_weight_norm": True}
    tr = Trainer(cfg)
    rng = np.random.default_rng(1)
    batch = (rng.normal(size=(2, 16, 10)).astype(np.float32),
             np.zeros((2,), np.int32))
    tr.init_state(batch)
    tr.train_step(batch)
    ck = tmp_path / "m.ckpt"
    tr.save_checkpoint(ck)

    def run(trial_line):
        d = tmp_path / f"dec_{abs(hash(trial_line))}"
        d.mkdir()
        with kaldi_io.ArkWriter(d / "f.ark", d / "feats.scp") as w:
            w.write("u0", rng2.normal(size=(16, 10)).astype(np.float32))
        (d / "trials").write_text(trial_line + "\n")
        out = tmp_path / f"out_{abs(hash(trial_line))}"
        cv = Converter(cfg)
        cv.load_checkpoint(str(ck))
        cv.decode(d, out, compress=False)
        return kaldi_io.load_mat(kaldi_io.read_scp(out / "feats.scp")["u0"])

    rng2 = np.random.default_rng(2)
    a = run("u0 1 2")
    rng2 = np.random.default_rng(2)
    b = run("u0 1 1")
    rng2 = np.random.default_rng(2)
    c = run("u0 1")
    # per-level control is real: (1,2) differs from (1,1)
    assert np.abs(a - b).max() > 1e-4
    # a single target repeats across levels == explicit (1,1)
    np.testing.assert_allclose(c, b, rtol=1e-5, atol=1e-5)
