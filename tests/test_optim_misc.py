"""Optimizer variants, indivisible-batch valid weighting, vocoder shim."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_npvc_tpu.train.optim import build_optimizer, build_schedule


class TestOptimVariants:
    @pytest.mark.parametrize("kind", ["Adam", "RAdam", "PlainRAdam", "AdamW"])
    def test_builds_and_steps(self, kind):
        tx = build_optimizer({"optim_type": kind, "learning_rate": 1e-3,
                              "max_grad_norm": 5, "warmup": 10,
                              "weight_decay": 0.01})
        params = {"w": jnp.ones((4,))}
        state = tx.init(params)
        grads = {"w": jnp.full((4,), 0.5)}
        updates, state = tx.update(grads, state, params)
        assert np.all(np.isfinite(np.asarray(updates["w"])))

    def test_adamw_warmup_ramps(self):
        """Reference warmup: lr ramps ~linearly from ~0 over `warmup` steps
        (radam.py:195-198) — early updates much smaller than late ones."""
        tx = build_optimizer({"optim_type": "AdamW", "learning_rate": 1e-2,
                              "max_grad_norm": 0, "warmup": 100})
        params = {"w": jnp.zeros((1,))}
        state = tx.init(params)
        grads = {"w": jnp.ones((1,))}
        u_first, state = tx.update(grads, state, params)
        for _ in range(99):
            u_last, state = tx.update(grads, state, params)
        assert abs(float(u_first["w"][0])) < abs(float(u_last["w"][0])) / 10

    def test_steplr_schedule(self):
        s = build_schedule({"learning_rate": 1.0, "lr_scheduler": "StepLR",
                            "lr_param": {"step_size": 10, "gamma": 0.5}})
        assert float(s(0)) == 1.0
        assert float(s(10)) == 0.5
        assert float(s(25)) == 0.25


class TestValidWeighting:
    def test_indivisible_batch_exact(self):
        """valid() on an indivisible batch equals the full-batch mean."""
        from vae_npvc_tpu.train.trainer import Trainer

        cfg = {
            "model_type": "vae_npvc.model.vqvae",
            "y_dim": 8, "y_num": 3, "z_dim": 8, "z_num": 16,
            "use_ema": True, "beta": 0.01, "optim_type": "Adam",
            "learning_rate": 1e-3, "max_grad_norm": 10, "seed": 0,
            "encoder": {"in_channels": [6], "out_channels": [12],
                        "kernel_size": 3, "downsample_scales": [1],
                        "z_channels": 8, "dilation": False,
                        "stack_kernel_size": 3, "stack_layers": 1,
                        "stacks": [1], "use_weight_norm": True},
            "decoder": {"in_channels": [8], "out_channels": [12],
                        "cond_channels": 8, "skip_channels": 8,
                        "final_channels": 6, "kernel_size": 3,
                        "upsample_scales": [1], "dilation": False,
                        "stack_kernel_size": 3, "stacks": [1],
                        "use_weight_norm": True},
        }
        tr = Trainer(cfg)
        rng = np.random.default_rng(0)
        # 11 rows: indivisible by the 8-device test mesh
        batch = (rng.normal(size=(11, 16, 6)).astype(np.float32),
                 rng.integers(0, 3, size=(11,)).astype(np.int32))
        tr.init_state(batch)
        got = tr.valid([batch])
        # oracle: single replicated full-batch step
        from jax.sharding import NamedSharding, PartitionSpec as P
        full = tuple(jax.device_put(a, tr.repl) for a in batch)
        want = tr._valid_step(tr.state, full)
        for k in ("Total", "X like"):
            assert float(got[k][0]) == pytest.approx(float(want[k]),
                                                     rel=1e-5)


class TestVocoderShim:
    def test_pwg_raises_without_package(self, tmp_path):
        from vae_npvc_tpu.infer.vocoder import pwg_decode_scp

        with pytest.raises((ImportError, FileNotFoundError)) as ei:
            pwg_decode_scp(tmp_path / "feats.scp", tmp_path / "wav",
                           tmp_path / "pwg")
        assert "parallel_wavegan" in str(ei.value) or "pkl" in str(ei.value)
