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


def _fake_exp_dir(tmp_path, name, generator_type, out_bands=1):
    """Reference-layout vocoder exp dir: newest *.pkl, config.yml, stats.h5
    (reference run.sh:206-209). The pkl/h5 are placeholders — the fake
    package below never opens them."""
    d = tmp_path / name
    d.mkdir()
    (d / "checkpoint-400000steps.pkl").write_bytes(b"fake")
    (d / "config.yml").write_text(
        f"generator_type: {generator_type}\n"
        f"sampling_rate: 8000\n"
        f"generator_params:\n  out_channels: {out_bands}\n")
    (d / "stats.h5").write_bytes(b"fake")
    return d


def _install_fake_pwg_package(monkeypatch, n_mels, hop=4, bands=1):
    """Inject a minimal parallel_wavegan.utils with load_model/read_hdf5.

    load_model dispatches on the config's generator_type, like the real
    package; the fake models record what they were asked to do so the shim's
    PWG-vs-MG behavior is assertable."""
    import sys
    import types

    import torch

    calls = {}

    class FakePQMF:
        def synthesis(self, x):  # (1, bands, T) -> (1, 1, T*bands)
            calls["pqmf"] = tuple(x.shape)
            b, c, t = x.shape
            return x.transpose(1, 2).reshape(b, 1, t * c)

    class FakeModel(torch.nn.Module):
        def __init__(self, gtype, bands):
            super().__init__()
            self.gtype, self.bands = gtype, bands
            if bands > 1:
                self.pqmf = FakePQMF()

        def remove_weight_norm(self):
            calls["removed_wn"] = True

        def inference(self, c):  # mel (T, D) -> (T*hop[, bands])
            calls["model"] = self.gtype
            t = c.shape[0] * hop
            if self.bands > 1:
                return torch.zeros(t // self.bands, self.bands) + 0.25
            return torch.zeros(t, 1) + 0.25

    utils = types.ModuleType("parallel_wavegan.utils")

    def load_model(ckpt, config):
        calls["ckpt"] = ckpt
        return FakeModel(config["generator_type"],
                         config["generator_params"]["out_channels"])

    def read_hdf5(path, key):
        return np.zeros(n_mels) if key == "mean" else np.ones(n_mels)

    utils.load_model = load_model
    utils.read_hdf5 = read_hdf5
    pkg = types.ModuleType("parallel_wavegan")
    pkg.utils = utils
    monkeypatch.setitem(sys.modules, "parallel_wavegan", pkg)
    monkeypatch.setitem(sys.modules, "parallel_wavegan.utils", utils)
    return calls


class TestExternalVocoderDispatch:
    """voc=PWG and voc=MG ride one shim that dispatches on the exp dir's
    config (reference run.sh:192-239 swaps exp/parallel_wavegan for
    exp/multiband_melgan; both go through parallel-wavegan-decode)."""

    def _feats(self, tmp_path, n_mels=10, frames=20):
        from vae_npvc_tpu.data import kaldi_io
        d = tmp_path / "mels"
        d.mkdir()
        rng = np.random.default_rng(0)
        with kaldi_io.ArkWriter(d / "f.ark", d / "feats.scp") as w:
            w.write("utt1", rng.normal(size=(frames, n_mels))
                    .astype(np.float32))
        return d / "feats.scp"

    def test_pwg_exp_dir(self, tmp_path, monkeypatch):
        import wave

        from vae_npvc_tpu.infer.vocoder import external_decode_scp

        calls = _install_fake_pwg_package(monkeypatch, n_mels=10)
        exp = _fake_exp_dir(tmp_path, "parallel_wavegan",
                            "ParallelWaveGANGenerator")
        scp = self._feats(tmp_path)
        n = external_decode_scp(scp, tmp_path / "out", exp)
        assert n == 1 and calls["model"] == "ParallelWaveGANGenerator"
        assert calls["removed_wn"] and "pqmf" not in calls
        with wave.open(str(tmp_path / "out" / "utt1.wav")) as wv:
            assert wv.getframerate() == 8000
            assert wv.getnframes() == 20 * 4

    def test_melgan_exp_dir_pqmf_resolved(self, tmp_path, monkeypatch):
        import wave

        from vae_npvc_tpu.infer.vocoder import external_decode_scp

        calls = _install_fake_pwg_package(monkeypatch, n_mels=10, bands=4)
        exp = _fake_exp_dir(tmp_path, "multiband_melgan",
                            "MelGANGenerator", out_bands=4)
        scp = self._feats(tmp_path)
        n = external_decode_scp(scp, tmp_path / "out", exp)
        assert n == 1 and calls["model"] == "MelGANGenerator"
        # sub-band output went through the PQMF synthesis filter
        assert calls["pqmf"] == (1, 4, 20)
        with wave.open(str(tmp_path / "out" / "utt1.wav")) as wv:
            assert wv.getnframes() == 20 * 4  # full-band length restored

    def test_legacy_alias(self):
        from vae_npvc_tpu.infer import vocoder
        assert vocoder.pwg_decode_scp is vocoder.external_decode_scp


def test_skl_loss_penalizes_mean_separation_at_small_variance():
    """Reference bug fixed (layers.py:278-281): the symmetric Gaussian KL
    must multiply the squared mean gap by (1/v1 + 1/v2); the reference
    divides, making mean separation vanish at small variances."""
    import jax.numpy as jnp
    import numpy as np

    from vae_npvc_tpu.ops.losses import skl_loss

    lv = jnp.log(jnp.asarray([1e-4]))
    mu1, mu2 = jnp.asarray([0.0]), jnp.asarray([1.0])
    got = float(skl_loss(mu1, lv, mu2, lv))
    np.testing.assert_allclose(got, 0.5 * (2.0 - 2.0 + 1.0 * 2e4), rtol=1e-6)
    assert float(skl_loss(mu1, lv, mu1, lv)) == 0.0
