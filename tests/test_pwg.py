"""Native Parallel-WaveGAN vocoder: STFT loss, model shapes, training, decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_npvc_tpu.ops.stft_loss import multi_stft_loss, single_stft_loss

PWG_CFG = {
    "fs": 8000, "n_fft": 64, "n_shift": 4, "n_mels": 16,
    "fmin": 0, "fmax": 4000,
    "layers": 6, "stacks": 2, "residual_channels": 16, "gate_channels": 32,
    "skip_channels": 16, "kernel_size": 3, "upsample_scales": [2, 2],
    "disc_layers": 4, "disc_channels": 16,
    "batch_max_frames": 24, "batch_size": 4,
    "lambda_adv": 1.0, "discriminator_train_start_steps": 40,
    "generator_param": {"learning_rate": 2e-3},
    "discriminator_param": {"learning_rate": 1e-3},
    "stft_loss_params": [[64, 16, 32], [128, 32, 64]],
    "seed": 0,
}


def sine_corpus(tmp_path, n=6, samples=4000, fs=8000, seed=0):
    from vae_npvc_tpu.infer.vocoder import _write_wav

    rng = np.random.default_rng(seed)
    d = tmp_path / "wavs"
    d.mkdir()
    with open(tmp_path / "wav.scp", "w") as f:
        for i in range(n):
            freq = 200.0 + 100.0 * i
            t = np.arange(samples) / fs
            x = 0.5 * np.sin(2 * np.pi * freq * t) \
                + 0.05 * rng.normal(size=samples)
            p = d / f"u{i:02d}.wav"
            _write_wav(p, x.astype(np.float32), fs)
            f.write(f"u{i:02d} {p}\n")
    return tmp_path


class TestStftLoss:
    def test_zero_for_identical(self):
        x = jnp.asarray(np.random.default_rng(0)
                        .normal(size=(2, 512)).astype(np.float32))
        sc, mag = multi_stft_loss(x, x, [(128, 32, 64)])
        assert float(sc) == pytest.approx(0.0, abs=1e-6)
        assert float(mag) == pytest.approx(0.0, abs=1e-6)

    def test_positive_and_differentiable(self):
        rng = np.random.default_rng(1)
        y = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))
        sc, mag = multi_stft_loss(x, y, [(128, 32, 64)])
        assert float(sc) > 0 and float(mag) > 0

        g = jax.grad(lambda a: sum(single_stft_loss(a, y, 128, 32, 64)))(x)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0


class TestPwgModel:
    def test_generator_shapes(self):
        from vae_npvc_tpu.models.pwg import PWGGenerator

        gen = PWGGenerator(arch=PWG_CFG)
        B, T = 2, 12
        hop = 4  # prod(upsample_scales)
        z = jnp.zeros((B, T * hop, 1), jnp.float32)
        c = jnp.zeros((B, T, PWG_CFG["n_mels"]), jnp.float32)
        params = gen.init(jax.random.PRNGKey(0), z, c)["params"]
        wav = gen.apply({"params": params}, z, c)
        assert wav.shape == (B, T * hop, 1)
        assert wav.dtype == jnp.float32

    def test_generator_bf16_compute(self):
        """compute_dtype bfloat16: fp32 params, bf16 conv path, finite fp32
        output (the framework-wide mixed-precision convention)."""
        import jax.numpy as jnp

        from vae_npvc_tpu.models.pwg import PWGGenerator

        gen = PWGGenerator(arch=PWG_CFG, dtype=jnp.bfloat16)
        z = jnp.zeros((1, 32, 1), jnp.float32)
        c = jnp.zeros((1, 8, PWG_CFG["n_mels"]), jnp.float32)
        params = gen.init(jax.random.PRNGKey(0), z, c)["params"]
        leaves = jax.tree_util.tree_leaves(params)
        assert all(l.dtype == jnp.float32 for l in leaves)
        wav = gen.apply({"params": params}, z, c)
        assert wav.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(wav)))

    def test_discriminator_shapes(self):
        from vae_npvc_tpu.models.pwg import PWGDiscriminator

        disc = PWGDiscriminator(arch=PWG_CFG)
        x = jnp.zeros((2, 96, 1), jnp.float32)
        params = disc.init(jax.random.PRNGKey(0), x)["params"]
        out = disc.apply({"params": params}, x)
        assert out.shape == (2, 96, 1)


class TestPwgTraining:
    def test_stft_loss_decreases(self, tmp_path):
        """Pure STFT-loss phase (pre-adversarial): the log-magnitude term is
        the decisively learnable signal at smoke scale (spectral convergence
        needs far more steps/capacity, as in the published schedule where
        the adversary only starts at 100k steps)."""
        from vae_npvc_tpu.data.wav_mel import WavMelDataset
        from vae_npvc_tpu.train.pwg import PwgTrainer

        cfg = dict(PWG_CFG, discriminator_train_start_steps=100000)
        root = sine_corpus(tmp_path)
        ds = WavMelDataset(root, cfg)
        trainer = PwgTrainer(cfg)
        batches = ds.batches(4, seed=1)
        trainer.init_state(next(batches))
        details = []
        for i, batch in enumerate(batches):
            details.append(trainer.train_step(batch))
            if i >= 300:
                break
        mag_first = float(jax.device_get(details[0]["log_stft_magnitude"]))
        mag_last = float(np.mean([
            float(jax.device_get(d["log_stft_magnitude"]))
            for d in details[-10:]]))
        assert mag_last < mag_first * 0.7, (mag_first, mag_last)
        tot_first = float(jax.device_get(details[0]["Total"]))
        tot_last = float(np.mean([float(jax.device_get(d["Total"]))
                                  for d in details[-10:]]))
        assert tot_last < tot_first, (tot_first, tot_last)

    def test_adversarial_phase_engages(self, tmp_path):
        from vae_npvc_tpu.data.wav_mel import WavMelDataset
        from vae_npvc_tpu.train.pwg import PwgTrainer

        cfg = dict(PWG_CFG, discriminator_train_start_steps=10)
        root = sine_corpus(tmp_path)
        ds = WavMelDataset(root, cfg)
        trainer = PwgTrainer(cfg)
        batches = ds.batches(4, seed=2)
        trainer.init_state(next(batches))
        d0 = jax.device_get(trainer.state.d_params)
        for i, batch in enumerate(batches):
            detail = trainer.train_step(batch)
            if i >= 40:
                break
        for k in ("Total", "adversarial", "disc_real", "disc_fake"):
            assert np.isfinite(float(jax.device_get(detail[k]))), k
        # discriminator actually trained after the start step
        d1 = jax.device_get(trainer.state.d_params)
        changed = any(
            not np.array_equal(a, b)
            for a, b in zip(jax.tree_util.tree_leaves(d0),
                            jax.tree_util.tree_leaves(d1)))
        assert changed

    def test_discriminator_frozen_before_start(self, tmp_path):
        from vae_npvc_tpu.data.wav_mel import WavMelDataset
        from vae_npvc_tpu.train.pwg import PwgTrainer

        root = sine_corpus(tmp_path)
        cfg = dict(PWG_CFG, discriminator_train_start_steps=10000)
        ds = WavMelDataset(root, cfg)
        trainer = PwgTrainer(cfg)
        batches = ds.batches(4, seed=2)
        trainer.init_state(next(batches))
        d0 = jax.device_get(trainer.state.d_params)
        for i, batch in enumerate(batches):
            trainer.train_step(batch)
            if i >= 3:
                break
        d1 = jax.device_get(trainer.state.d_params)
        for a, b in zip(jax.tree_util.tree_leaves(d0),
                        jax.tree_util.tree_leaves(d1)):
            np.testing.assert_array_equal(a, b)
        # the D optimizer state (incl. its schedule count) must not advance
        # either — the published schedule is relative to the start step
        o1 = jax.device_get(trainer.state.d_opt_state)
        t2 = PwgTrainer(cfg)
        t2.init_state(next(ds.batches(4, seed=9)))
        o0 = jax.device_get(t2.state.d_opt_state)
        for a, b in zip(jax.tree_util.tree_leaves(o0),
                        jax.tree_util.tree_leaves(o1)):
            np.testing.assert_array_equal(a, b)

    def test_small_corpus_still_yields_batches(self, tmp_path):
        """batch_size larger than the corpus clamps instead of spinning
        forever in an empty epoch loop."""
        from vae_npvc_tpu.data.wav_mel import WavMelDataset

        root = sine_corpus(tmp_path, n=3)
        ds = WavMelDataset(root, PWG_CFG)
        wav, mel = next(ds.batches(8, seed=0))
        assert wav.shape[0] == 3 and mel.shape[0] == 3

    def test_lazy_loading_matches_preloaded(self, tmp_path):
        """Above preload_limit the dataset loads per batch; crops are
        identical to the preloaded path for the same seed."""
        from vae_npvc_tpu.data.wav_mel import WavMelDataset

        root = sine_corpus(tmp_path, n=5)
        pre = WavMelDataset(root, PWG_CFG)
        lazy = WavMelDataset(root, dict(PWG_CFG, preload_limit=2))
        assert pre.preload and not lazy.preload and lazy.items is None
        w1, m1 = next(pre.batches(4, seed=7))
        w2, m2 = next(lazy.batches(4, seed=7))
        np.testing.assert_array_equal(w1, w2)
        np.testing.assert_allclose(m1, m2, rtol=1e-6, atol=1e-6)

    def test_pwg_optimizers_use_published_betas(self):
        """PWG uses RAdam betas (0.9, 0.999), not the VC trainer's 0.5."""
        import optax

        from vae_npvc_tpu.train.pwg import GEN_DEFAULTS, _sub_optimizer

        tx = _sub_optimizer(dict(GEN_DEFAULTS, lr_scheduler=None,
                                 max_grad_norm=0))
        ref = optax.radam(GEN_DEFAULTS["learning_rate"], b1=0.9, b2=0.999)
        wrong = optax.radam(GEN_DEFAULTS["learning_rate"], b1=0.5, b2=0.999)
        p = {"w": jnp.ones((4,))}
        g = {"w": jnp.full((4,), 0.3)}
        # advance two steps so momentum (b1) affects the update
        def two_steps(t):
            s = t.init(p)
            u1, s = t.update(g, s, p)
            u2, _ = t.update({"w": jnp.full((4,), -0.1)}, s, p)
            return np.asarray(u2["w"])
        np.testing.assert_allclose(two_steps(tx), two_steps(ref), rtol=1e-6)
        assert not np.allclose(two_steps(tx), two_steps(wrong))

    def test_multi_step_scan_matches_sequential(self, tmp_path):
        """K steps in one lax.scan dispatch == K sequential train_step calls
        (same data, same rng folding)."""
        from vae_npvc_tpu.data.wav_mel import WavMelDataset
        from vae_npvc_tpu.train.pwg import PwgTrainer

        cfg = dict(PWG_CFG, discriminator_train_start_steps=2)
        root = sine_corpus(tmp_path)
        ds = WavMelDataset(root, cfg)
        gen = ds.batches(4, seed=11)
        first = next(gen)
        data = [next(gen) for _ in range(6)]

        t1 = PwgTrainer(cfg)
        t1.init_state(first)
        for b in data:
            t1.train_step(b)

        t2 = PwgTrainer(cfg)
        t2.init_state(first)
        t2.train_steps(data[:3])
        t2.train_steps(data[3:])

        for a, b in zip(jax.tree_util.tree_leaves(
                            jax.device_get(t1.state.g_params)),
                        jax.tree_util.tree_leaves(
                            jax.device_get(t2.state.g_params))):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(
                            jax.device_get(t1.state.d_params)),
                        jax.tree_util.tree_leaves(
                            jax.device_get(t2.state.d_params))):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    def test_device_resident_training(self, tmp_path):
        """HBM-staged corpus + in-scan crop sampling: steps advance, losses
        finite, runs are deterministic for the same seed."""
        from vae_npvc_tpu.data.wav_mel import WavMelDataset
        from vae_npvc_tpu.train.pwg import PwgTrainer

        cfg = dict(PWG_CFG, discriminator_train_start_steps=3)
        root = sine_corpus(tmp_path)
        ds = WavMelDataset(root, cfg)

        def run():
            tr = PwgTrainer(cfg)
            tr.init_state(next(ds.batches(4, seed=0)))
            tr.stage_dataset(ds, batch_size=4)
            d = tr.train_steps_device(6)
            return tr, d

        t1, d1 = run()
        assert int(t1.state.step) == 6
        for k, v in d1.items():
            assert np.all(np.isfinite(jax.device_get(v))), k
        t2, d2 = run()
        for a, b in zip(jax.tree_util.tree_leaves(
                            jax.device_get(t1.state.g_params)),
                        jax.tree_util.tree_leaves(
                            jax.device_get(t2.state.g_params))):
            np.testing.assert_array_equal(a, b)

    def test_padded_arrays_bounds(self, tmp_path):
        from vae_npvc_tpu.data.wav_mel import WavMelDataset

        root = sine_corpus(tmp_path, n=4)
        ds = WavMelDataset(root, PWG_CFG)
        wavs, mels, m_hi = ds.padded_arrays()
        M, hop = PWG_CFG["batch_max_frames"], 4
        assert wavs.shape[0] == mels.shape[0] == m_hi.shape[0] == 4
        for i, (_, x, mel) in enumerate(ds.items):
            expect = max(min(mel.shape[0], len(x) // hop) - M, 0)
            assert m_hi[i] == expect
            # worst-case crop stays inside the padded arrays
            assert (m_hi[i] + M) * hop <= wavs.shape[1]
            assert m_hi[i] + M <= mels.shape[1]

    def test_checkpoint_roundtrip(self, tmp_path):
        from vae_npvc_tpu.data.wav_mel import WavMelDataset
        from vae_npvc_tpu.train.pwg import PwgTrainer

        root = sine_corpus(tmp_path)
        ds = WavMelDataset(root, PWG_CFG)
        batches = ds.batches(4, seed=3)
        first = next(batches)
        trainer = PwgTrainer(PWG_CFG)
        trainer.init_state(first)
        trainer.train_step(first)
        trainer.save_checkpoint(tmp_path / "pwg.ckpt")

        t2 = PwgTrainer(PWG_CFG)
        t2.init_state(first)
        it = t2.load_checkpoint(tmp_path / "pwg.ckpt")
        assert it == 1
        for a, b in zip(jax.tree_util.tree_leaves(
                            jax.device_get(trainer.state.g_params)),
                        jax.tree_util.tree_leaves(
                            jax.device_get(t2.state.g_params))):
            np.testing.assert_array_equal(a, b)


class TestTrainPwgCLI:
    def test_finished_run_rerun_is_idempotent(self, tmp_path):
        """Re-invoking a completed training (recipe-stage rerun) leaves
        model.final byte-identical — no stray warm-up step."""
        import argparse

        import yaml

        from vae_npvc_tpu.bin.train_pwg import train

        root = sine_corpus(tmp_path)
        cfg = dict(PWG_CFG, max_iter=4, iters_per_checkpoint=2,
                   iters_per_log=2, steps_per_call=2,
                   discriminator_train_start_steps=1)
        conf = tmp_path / "pwg.yaml"
        conf.write_text(yaml.safe_dump(
            {k: list(v) if isinstance(v, tuple) else v
             for k, v in cfg.items()}))
        out = tmp_path / "exp"
        args = argparse.Namespace(config=str(conf), train_dir=str(root),
                                  output_dir=str(out), checkpoint=None)
        train(args)
        final = (out / "model.final").read_bytes()
        train(args)  # auto-resumes at iter.4 == max_iter -> no-op
        assert (out / "model.final").read_bytes() == final


class TestPwgDataParallel:
    def test_mesh_matches_single_device(self, tmp_path):
        """GSPMD batch sharding over 8 devices gives the same parameters as
        the single-device run (state replicated, batch on 'data')."""
        from jax.sharding import Mesh

        from vae_npvc_tpu.data.wav_mel import WavMelDataset
        from vae_npvc_tpu.train.pwg import PwgTrainer

        cfg = dict(PWG_CFG, discriminator_train_start_steps=2)
        root = sine_corpus(tmp_path, n=8)
        ds = WavMelDataset(root, cfg)
        gen = ds.batches(8, seed=4)
        first = next(gen)
        data = [next(gen) for _ in range(3)]

        t1 = PwgTrainer(cfg, mesh=Mesh(np.array(jax.devices()[:1]),
                                       ("data",)))
        t8 = PwgTrainer(cfg, mesh=Mesh(np.array(jax.devices()), ("data",)))
        for t in (t1, t8):
            t.init_state(first)
            for b in data:
                t.train_step(b)
        # cross-shard reductions reorder float sums, so equality is to
        # accumulation noise, not bitwise (max ~6e-6 abs observed)
        for a, b in zip(jax.tree_util.tree_leaves(
                            jax.device_get(t1.state.g_params)),
                        jax.tree_util.tree_leaves(
                            jax.device_get(t8.state.g_params))):
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=2e-5)


class TestJpwgDecode:
    def test_decode_scp_writes_wavs(self, tmp_path):
        import wave

        from vae_npvc_tpu.data import kaldi_io
        from vae_npvc_tpu.data.wav_mel import WavMelDataset
        from vae_npvc_tpu.infer.vocoder import jpwg_decode_scp
        from vae_npvc_tpu.train.pwg import PwgTrainer

        root = sine_corpus(tmp_path, n=3)
        ds = WavMelDataset(root, PWG_CFG)
        trainer = PwgTrainer(PWG_CFG)
        batches = ds.batches(3, seed=0)
        trainer.init_state(next(batches))
        trainer.save_checkpoint(tmp_path / "pwg.ckpt")

        # write the full-utterance mels as a feats.scp
        d = tmp_path / "mels"
        d.mkdir()
        with kaldi_io.ArkWriter(d / "feats.ark", d / "feats.scp") as w:
            for utt, _, mel in ds.items:
                w.write(utt, mel)

        n = jpwg_decode_scp(d / "feats.scp", tmp_path / "out", PWG_CFG,
                            tmp_path / "pwg.ckpt", batch_size=2, bucket=32)
        assert n == 3
        for utt, _, mel in ds.items:
            p = tmp_path / "out" / f"{utt}.wav"
            assert p.exists()
            with wave.open(str(p)) as wv:
                assert wv.getframerate() == PWG_CFG["fs"]
                assert wv.getnframes() == mel.shape[0] * 4  # hop

    def test_chunked_synthesis_matches_full(self):
        """Fixed-size chunked synthesis with receptive-field halos equals
        the full-length pass exactly on every kept sample (conv locality —
        the serving path for unbounded-length utterances)."""
        import jax.numpy as jnp

        from vae_npvc_tpu.infer.vocoder import (jpwg_receptive_frames,
                                                jpwg_synthesize_chunked)
        from vae_npvc_tpu.models.pwg import PWGGenerator

        rng = np.random.default_rng(3)
        T, hop, D = 60, 4, PWG_CFG["n_mels"]
        mel = rng.normal(size=(T, D)).astype(np.float32)
        z = rng.normal(size=(T * hop, 1)).astype(np.float32)
        gen = PWGGenerator(arch=PWG_CFG)
        params = gen.init(jax.random.PRNGKey(0), jnp.asarray(z[None]),
                          jnp.asarray(mel[None]))["params"]
        full = np.asarray(gen.apply({"params": params}, jnp.asarray(z[None]),
                                    jnp.asarray(mel[None])))[0, :, 0]
        halo = jpwg_receptive_frames(PWG_CFG)
        chunked = jpwg_synthesize_chunked(gen, params, mel, z,
                                          chunk_frames=16, halo_frames=halo,
                                          hop=hop)
        np.testing.assert_allclose(chunked, full, rtol=1e-5, atol=1e-5)

    def test_decode_scp_chunked_long_utterance(self, tmp_path):
        """chunk_frames routes long utterances through chunked synthesis
        and still writes the right number of samples."""
        import wave

        from vae_npvc_tpu.data import kaldi_io
        from vae_npvc_tpu.data.wav_mel import WavMelDataset
        from vae_npvc_tpu.infer.vocoder import jpwg_decode_scp
        from vae_npvc_tpu.train.pwg import PwgTrainer

        root = sine_corpus(tmp_path, n=2, samples=2000)
        ds = WavMelDataset(root, PWG_CFG)
        trainer = PwgTrainer(PWG_CFG)
        trainer.init_state(next(ds.batches(2, seed=0)))
        trainer.save_checkpoint(tmp_path / "pwg.ckpt")
        d = tmp_path / "mels"
        d.mkdir()
        with kaldi_io.ArkWriter(d / "feats.ark", d / "feats.scp") as w:
            for utt, _, mel in ds.items:
                w.write(utt, mel)
        n = jpwg_decode_scp(d / "feats.scp", tmp_path / "out", PWG_CFG,
                            tmp_path / "pwg.ckpt", chunk_frames=64)
        assert n == 2
        for utt, _, mel in ds.items:
            with wave.open(str(tmp_path / "out" / f"{utt}.wav")) as wv:
                assert wv.getnframes() == mel.shape[0] * 4

    def test_dataset_alignment_and_shapes(self, tmp_path):
        from vae_npvc_tpu.data.wav_mel import WavMelDataset

        root = sine_corpus(tmp_path, n=4)
        ds = WavMelDataset(root, PWG_CFG)
        wav, mel = next(ds.batches(4, seed=5))
        M, hop = PWG_CFG["batch_max_frames"], 4
        assert wav.shape == (4, M * hop)
        assert mel.shape == (4, M, PWG_CFG["n_mels"])
        # same seed => identical crops (deterministic pipeline)
        wav2, mel2 = next(ds.batches(4, seed=5))
        np.testing.assert_array_equal(wav, wav2)
        np.testing.assert_array_equal(mel, mel2)
