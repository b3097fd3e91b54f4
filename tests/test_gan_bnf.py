"""Tests: WGAN-GP trainer phases/checkpoints + BNF extraction."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_npvc_tpu.data import kaldi_io
from vae_npvc_tpu.infer.bnf import BnfExtractor, collapse_consecutive
from vae_npvc_tpu.train import build_trainer

TINY = {
    "trainer_type": "vae_npvc.trainer.wgan_gp",
    "model_type": "vae_npvc.model.vqvae",
    "seed": 7,
    "y_dim": 8, "y_num": 3, "z_dim": 8, "z_num": 16,
    "use_ema": True, "beta": 0.01, "mu": 0.9, "jitter_p": 0.0,
    "pre_iter": 2, "gamma": 1.0, "gp_weight": 1.0,
    "generator_param": {"per_iteration": 1, "optim_type": "RAdam",
                        "learning_rate": 1e-4, "max_grad_norm": 10,
                        "lr_scheduler": {"step_size": 1000, "gamma": 0.5}},
    "discriminator_param": {"per_iteration": 1, "optim_type": "RAdam",
                            "learning_rate": 5e-5, "max_grad_norm": 1,
                            "lr_scheduler": {"step_size": 1000,
                                             "gamma": 0.5}},
    "discriminator": {"channels": [8, 16], "kernel_size": 5,
                      "strides": [2, 2]},
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


class TestWganGp:
    def test_dp_matches_single_device(self):
        """All three GAN phases under an 8-device GSPMD data mesh must equal
        the 1-device run exactly up to reduction order — the DP-equality
        evidence the basic trainer has (test_parallel) extended to the
        second trainer."""
        from vae_npvc_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(0)
        batch = (rng.normal(size=(8, 16, 10)).astype(np.float32),
                 (np.arange(8) % 3).astype(np.int32))

        results = []
        for mesh in (make_mesh(n_data=1, devices=jax.devices()[:1]),
                     make_mesh(n_data=len(jax.devices()))):
            trainer = build_trainer(TINY, mesh=mesh)
            trainer.init_state(batch)
            details = [trainer.train_step(batch) for _ in range(4)]
            results.append((jax.device_get(trainer.state.params), details))

        (p1, d1), (p8, d8) = results
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p8)):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
        # critic + adversarial detail from the post-pre_iter steps
        assert "DISC loss" in d1[-1] and "ADV loss" in d1[-1]
        for da, db in zip(d1, d8):
            for k in da:
                np.testing.assert_allclose(float(da[k]), float(db[k]),
                                           rtol=2e-4, atol=2e-5,
                                           err_msg=k)

    def test_phase_schedule_and_checkpoint(self, tmp_path):
        trainer = build_trainer(TINY)
        rng = np.random.default_rng(0)
        batch = (rng.normal(size=(4, 16, 10)).astype(np.float32),
                 np.zeros((4,), np.int32))
        trainer.init_state(batch)

        # phase 1: VAE pretrain — no adversarial keys
        d0 = trainer.train_step(batch)
        assert "X like" in d0 and "DISC loss" not in d0

        # run past pre_iter → adversarial phase adds critic/gen detail
        for _ in range(3):
            d = trainer.train_step(batch)
        assert "DISC loss" in d and "gradient_penalty" in d
        assert "ADV loss" in d
        assert np.isfinite(float(d["DISC loss"]))
        assert np.isfinite(float(d["gradient_penalty"]))

        # dual-net checkpoint roundtrip
        ck = tmp_path / "gan.ckpt"
        trainer.save_checkpoint(ck)
        it = trainer.iteration
        trainer2 = build_trainer(TINY)
        trainer2.init_state(batch)
        assert trainer2.load_checkpoint(ck) == int(
            jax.device_get(trainer.state.step))
        d2 = trainer2.train_step(batch)
        assert np.isfinite(float(list(d2.values())[0]))


class TestBnf:
    def test_collapse_consecutive(self):
        np.testing.assert_array_equal(
            collapse_consecutive([1, 1, 2, 2, 2, 1, 3, 3]), [1, 2, 1, 3])
        assert collapse_consecutive([]).size == 0

    def test_extract_txt_and_ark(self, tmp_path):
        from flax import serialization

        cfg = {k: v for k, v in TINY.items()
               if k not in ("trainer_type", "discriminator",
                            "generator_param", "discriminator_param",
                            "pre_iter", "gamma", "gp_weight")}
        cfg["decode_bucket_size"] = 32
        cfg["decode_batch_size"] = 2
        # minimal checkpoint from a basic trainer
        from vae_npvc_tpu.train.trainer import Trainer
        tr = Trainer(dict(cfg, trainer_type="vae_npvc.trainer.basic"))
        rng = np.random.default_rng(1)
        batch = (rng.normal(size=(2, 16, 10)).astype(np.float32),
                 np.zeros((2,), np.int32))
        tr.init_state(batch)
        tr.train_step(batch)  # EMA codebook init
        ck = tmp_path / "m.ckpt"
        tr.save_checkpoint(ck)

        # toy features ark
        with kaldi_io.ArkWriter(tmp_path / "f.ark", tmp_path / "f.scp") as w:
            for i in range(3):
                T = 10 + 7 * i
                w.write(f"u{i}", rng.normal(size=(T, 10)).astype(np.float32))

        ex = BnfExtractor(cfg)
        ex.load_checkpoint(ck)
        out_txt = tmp_path / "tokens.txt"
        n = ex.extract(f"scp:{tmp_path / 'f.scp'}", str(out_txt), "csid",
                       output_txt=True)
        assert n == 3
        lines = out_txt.read_text().strip().splitlines()
        assert len(lines) == 3
        utt, tokens = lines[0].split(None, 1)
        assert utt == "u0" and tokens.startswith("<") and tokens.endswith(">")

        # id kind: token count equals frame count
        out_txt2 = tmp_path / "ids.txt"
        ex.extract(f"scp:{tmp_path / 'f.scp'}", str(out_txt2), "id", True)
        for line in out_txt2.read_text().strip().splitlines():
            utt, tokens = line.split(None, 1)
            T = {"u0": 10, "u1": 17, "u2": 24}[utt]
            assert tokens.count("<") == T

        # ark output path works (the reference's is broken)
        wspec = f"ark,scp:{tmp_path}/b.ark,{tmp_path}/b.scp"
        n = ex.extract(f"scp:{tmp_path / 'f.scp'}", wspec, "token",
                       output_txt=False)
        assert n == 3
        mats = dict(kaldi_io.read_ark(f"scp:{tmp_path}/b.scp"))
        assert mats["u1"].shape[0] == 17


def test_gan_valid_loop():
    """GanTrainer.valid works with the generalized batch-tuple API."""
    trainer = build_trainer(TINY)
    rng = np.random.default_rng(2)
    batch = (rng.normal(size=(4, 16, 10)).astype(np.float32),
             np.zeros((4,), np.int32))
    trainer.init_state(batch)
    trainer.train_step(batch)
    detail = trainer.valid([batch, batch])
    assert "X like" in detail and len(detail["X like"]) == 2
    assert all(np.isfinite(v) for v in detail["X like"])


def test_gan_finetune_from_basic_checkpoint(tmp_path):
    """GanTrainer.load_checkpoint on a basic-Trainer checkpoint (no
    discriminator/optimizer_G keys) must load the generator and fall back to
    fresh adversary state — the fine-tune-with-adversary path."""
    from vae_npvc_tpu.train.trainer import Trainer

    rng = np.random.default_rng(3)
    batch = (rng.normal(size=(4, 16, 10)).astype(np.float32),
             np.zeros((4,), np.int32))
    base_cfg = {k: v for k, v in TINY.items()}
    base = Trainer(base_cfg)
    base.init_state(batch)
    base.train_step(batch)
    ck = tmp_path / "iter.1"
    base.save_checkpoint(str(ck))

    gan = build_trainer(TINY)
    gan.init_state(batch)
    it = gan.load_checkpoint(str(ck))
    assert it == 1
    # generator params came from the checkpoint
    a = jax.tree_util.tree_leaves(jax.device_get(base.state.params))
    b = jax.tree_util.tree_leaves(jax.device_get(gan.state.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # and training continues (all three phases run fine after the load)
    for _ in range(4):
        detail = gan.train_step(batch)
    assert np.isfinite(float(detail["Total"]))
