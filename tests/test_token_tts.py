"""Token-to-mel synthesizer: data contract, training, duration inference."""

import argparse

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_npvc_tpu.data.token_mel import (TokenMelDataset, parse_token_line,
                                         write_token_mel_dir)
from vae_npvc_tpu.infer.bnf import collapse_with_durations
from vae_npvc_tpu.models import build_model
from vae_npvc_tpu.train import build_trainer

CFG = {
    "model_type": "vae_npvc.model.token_tts", "trainer_type": "basic",
    "seed": 3, "optim_type": "Adam", "learning_rate": 2e-3,
    "max_grad_norm": 10,
    "token_num": 8, "token_dim": 8, "y_num": 3, "y_dim": 8,
    "mel_dim": 6, "hidden": 16, "enc_stacks": 2, "dec_stacks": 2,
    "dur_weight": 0.1, "max_tokens": 10, "max_frames": 40,
}


def make_data(tmp_path, n=24, seed=0):
    rng = np.random.default_rng(seed)
    token_mel = rng.normal(size=(8, 6)).astype(np.float32) * 2  # token → mel
    spk_off = rng.normal(size=(3, 6)).astype(np.float32)
    items = []
    for i in range(n):
        L = int(rng.integers(3, 9))
        toks = rng.integers(0, 8, L)
        durs = rng.integers(2, 5, L)
        spk = i % 3
        mel = np.repeat(token_mel[toks], durs, axis=0) + spk_off[spk]
        items.append((f"u{i:02d}", toks, durs, mel, spk))
    write_token_mel_dir(tmp_path / "tm", items)
    return tmp_path / "tm"


class TestTokenMelData:
    def test_parse_and_roundtrip(self, tmp_path):
        d = make_data(tmp_path)
        ds = TokenMelDataset(d, CFG)
        assert len(ds) == 24 and ds.mel_dim == 6
        batch = next(ds.batches(4, shuffle=False, epochs=1))
        toks, durs, mels, spks, tok_lens, mel_lens = batch
        assert toks.shape == (4, 10) and mels.shape == (4, 40, 6)
        for b in range(4):
            assert int(durs[b, :tok_lens[b]].sum()) == int(mel_lens[b])
        np.testing.assert_array_equal(parse_token_line("<3><0><7>"), [3, 0, 7])

    def test_collapse_with_durations(self):
        toks, runs = collapse_with_durations([5, 5, 5, 2, 7, 7])
        np.testing.assert_array_equal(toks, [5, 2, 7])
        np.testing.assert_array_equal(runs, [3, 1, 2])


class TestTokenTtsTraining:
    def test_loss_decreases_and_infer(self, tmp_path):
        d = make_data(tmp_path)
        ds = TokenMelDataset(d, CFG)
        trainer = build_trainer(CFG)
        trainer.init_state(next(ds.batches(8, shuffle=False, epochs=1)))
        losses = []
        for i, batch in enumerate(ds.batches(8, shuffle=True, seed=1)):
            detail = trainer.train_step(batch)
            losses.append(detail)
            if i >= 60:
                break
        first = float(jax.device_get(losses[0]["Total"]))
        last = float(np.mean([jax.device_get(l["Total"])
                              for l in losses[-5:]]))
        assert last < first * 0.7, (first, last)

        # inference with predicted durations through the public apply
        model = trainer.model
        v = {"params": jax.device_get(trainer.state.params)}
        toks = jnp.asarray([[1, 2, 3, 0, 0, 0, 0, 0, 0, 0]], jnp.int32)
        mel, lens = model.apply(v, toks, jnp.asarray([1], jnp.int32),
                                jnp.asarray([3], jnp.int32), method="infer")
        assert mel.shape == (1, 40, 6)
        assert 3 <= int(lens[0]) <= 40
        # frames past the predicted length are masked to zero
        assert np.all(np.asarray(mel)[0, int(lens[0]):] == 0.0)


class TestTtsCli:
    def test_train_tts_cli(self, tmp_path):
        import yaml

        from vae_npvc_tpu.bin.train_tts import train as tts_train

        d = make_data(tmp_path)
        cfg = dict(CFG, max_iter=8, iters_per_checkpoint=8, iters_per_log=4,
                   batch_size=8)
        conf = tmp_path / "tts.yaml"
        conf.write_text(yaml.safe_dump(cfg))
        out = tmp_path / "exp"
        tts_train(argparse.Namespace(
            config=str(conf), output_dir=str(out), checkpoint=None,
            train_dir=str(d), valid_dir=str(d)))
        assert (out / "iter.8").exists()
        assert (out / "model.loss.best").exists()

    def test_train_tts_cli_steps_per_call(self, tmp_path):
        """K-step scan dispatch works on the 6-tuple token-mel batches."""
        import yaml

        from vae_npvc_tpu.bin.train_tts import train as tts_train

        d = make_data(tmp_path)
        cfg = dict(CFG, max_iter=8, iters_per_checkpoint=8, iters_per_log=4,
                   batch_size=8, steps_per_call=3)
        conf = tmp_path / "tts.yaml"
        conf.write_text(yaml.safe_dump(cfg))
        out = tmp_path / "exp_spc"
        tts_train(argparse.Namespace(
            config=str(conf), output_dir=str(out), checkpoint=None,
            train_dir=str(d), valid_dir=None))
        assert (out / "iter.8").exists()
        log = (out / "train.log").read_text()
        assert "Iter 4:" in log and "Iter 8:" in log


class TestVarianceAndPostnet:
    def test_detail_keys_present(self, tmp_path):
        d = make_data(tmp_path)
        ds = TokenMelDataset(d, CFG)
        batch = next(ds.batches(4, shuffle=False, epochs=1))
        model = build_model({**CFG, "postnet_layers": 2,
                             "variance_predictor": True})
        variables = model.init(jax.random.PRNGKey(0),
                               *map(jnp.asarray, batch), train=True)
        _, loss, detail = model.apply(variables, *map(jnp.asarray, batch),
                                      train=True)
        for k in ("X like", "X pre like", "DUR loss", "PITCH loss",
                  "ENERGY loss", "Total"):
            assert k in detail and np.isfinite(float(detail[k])), k

    def test_variance_proxies(self):
        from vae_npvc_tpu.models.token_tts import mel_energy, mel_pitch_proxy

        mel = np.zeros((1, 4, 8), np.float32)
        mel[0, :, 6] = 5.0   # energy concentrated in a high bin
        p_high = mel_pitch_proxy(jnp.asarray(mel))
        mel2 = np.zeros((1, 4, 8), np.float32)
        mel2[0, :, 1] = 5.0  # low bin
        p_low = mel_pitch_proxy(jnp.asarray(mel2))
        assert float(p_high.mean()) > float(p_low.mean())
        e = mel_energy(jnp.asarray(mel))
        np.testing.assert_allclose(np.asarray(e), 5.0 / 8, rtol=1e-5)


TRANSFORMER_CFG = dict(
    CFG, block_type="transformer",
    # reference key names (train_pytorch_transformer+spkemb.yaml)
    adim=16, aheads=2, elayers=2, dlayers=2, eunits=32, dunits=32,
)


class TestTransformerBackbone:
    def test_loss_decreases_and_infer(self, tmp_path):
        d = make_data(tmp_path)
        ds = TokenMelDataset(d, TRANSFORMER_CFG)
        trainer = build_trainer(TRANSFORMER_CFG)
        trainer.init_state(next(ds.batches(8, shuffle=False, epochs=1)))
        losses = []
        for i, batch in enumerate(ds.batches(8, shuffle=True, seed=1)):
            losses.append(trainer.train_step(batch))
            if i >= 60:
                break
        first = float(jax.device_get(losses[0]["Total"]))
        last = float(np.mean([jax.device_get(l["Total"])
                              for l in losses[-5:]]))
        assert last < first * 0.7, (first, last)

        model = trainer.model
        v = {"params": jax.device_get(trainer.state.params)}
        toks = jnp.asarray([[1, 2, 3, 0, 0, 0, 0, 0, 0, 0]], jnp.int32)
        mel, lens = model.apply(v, toks, jnp.asarray([1], jnp.int32),
                                jnp.asarray([3], jnp.int32), method="infer")
        assert mel.shape == (1, 40, 6)
        assert np.all(np.isfinite(np.asarray(mel)))

    def test_padded_equals_unpadded(self, tmp_path):
        """Key-padding masks make padded batches exactly equal unpadded
        runs (the framework-wide masked-inference contract; attention must
        exclude padded keys for this to hold)."""
        model = build_model(TRANSFORMER_CFG)
        rng = np.random.default_rng(0)
        L, Lpad = 5, 10
        toks = rng.integers(0, 8, (1, L)).astype(np.int32)
        durs = rng.integers(2, 4, (1, L)).astype(np.int32)
        T = int(durs.sum())
        mel = rng.normal(size=(1, T, 6)).astype(np.float32)
        y = np.array([1], np.int32)

        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(toks), jnp.asarray(durs),
            jnp.asarray(mel), jnp.asarray(y),
            jnp.asarray([L], jnp.int32), jnp.asarray([T], jnp.int32),
            train=True)

        out_unpad, _, _ = model.apply(
            variables, jnp.asarray(toks), jnp.asarray(durs),
            jnp.asarray(mel), jnp.asarray(y),
            jnp.asarray([L], jnp.int32), jnp.asarray([T], jnp.int32),
            train=False)

        toks_p = np.zeros((1, Lpad), np.int32)
        toks_p[:, :L] = toks
        durs_p = np.zeros((1, Lpad), np.int32)
        durs_p[:, :L] = durs
        mel_p = np.zeros((1, T + 16, 6), np.float32)
        mel_p[:, :T] = mel
        out_pad, _, _ = model.apply(
            variables, jnp.asarray(toks_p), jnp.asarray(durs_p),
            jnp.asarray(mel_p), jnp.asarray(y),
            jnp.asarray([L], jnp.int32), jnp.asarray([T], jnp.int32),
            train=False)
        np.testing.assert_allclose(np.asarray(out_pad)[:, :T],
                                   np.asarray(out_unpad)[:, :T],
                                   rtol=1e-5, atol=1e-5)

    def test_sinusoidal_positions_shape_and_range(self):
        from vae_npvc_tpu.models.token_tts import sinusoidal_positions

        for dim in (8, 7):   # even + odd dims
            pe = np.asarray(sinusoidal_positions(12, dim))
            assert pe.shape == (12, dim)
            assert np.all(np.abs(pe) <= 1.0 + 1e-6)
        # position 0: sin=0, cos=1 pattern
        pe = np.asarray(sinusoidal_positions(4, 6))
        np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-7)
        np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-7)


TACOTRON2_CFG = dict(
    CFG, block_type="tacotron2",
    # reference key names (train_pytorch_tacotron2+spkemb.yaml), toy sizes
    **{"embed-dim": 16, "econv-layers": 2, "econv-chans": 16,
       "econv-filts": 5, "elayers": 1, "eunits": 16, "dlayers": 2,
       "dunits": 24, "prenet-layers": 2, "prenet-units": 8,
       "postnet-layers": 2, "postnet-chans": 8, "postnet-filts": 5,
       "adim": 8, "aconv-chans": 4, "aconv-filts": 3,
       "cumulate-att-w": True, "use-concate": True, "bce-pos-weight": 3.0,
       "reduction-factor": 2, "zoneout-rate": 0.1, "dropout-rate": 0.5},
)


class TestTacotron2Backbone:
    """AR prenet + location-sensitive attention + stop token — the
    reference's default second-stage family (reference:
    egs/aishell3/vc2/conf/train_pytorch_tacotron2+spkemb.yaml)."""

    def test_loss_decreases_and_infer(self, tmp_path):
        d = make_data(tmp_path)
        ds = TokenMelDataset(d, TACOTRON2_CFG)
        trainer = build_trainer(TACOTRON2_CFG)
        trainer.init_state(next(ds.batches(8, shuffle=False, epochs=1)))
        losses = []
        for i, batch in enumerate(ds.batches(8, shuffle=True, seed=1)):
            losses.append(trainer.train_step(batch))
            if i >= 80:
                break
        first = float(jax.device_get(losses[0]["Total"]))
        last = float(np.mean([jax.device_get(l["Total"])
                              for l in losses[-5:]]))
        assert last < first * 0.8, (first, last)
        for k in ("X like", "X pre like", "STOP loss"):
            assert k in losses[-1], k

        # free-running AR inference with stop-token lengths
        model = trainer.model
        v = {"params": jax.device_get(trainer.state.params)}
        toks = jnp.asarray([[1, 2, 3, 0, 0, 0, 0, 0, 0, 0]], jnp.int32)
        mel, lens = model.apply(v, toks, jnp.asarray([1], jnp.int32),
                                jnp.asarray([3], jnp.int32), method="infer")
        assert mel.shape == (1, 40, 6)
        assert np.all(np.isfinite(np.asarray(mel)))
        assert 1 <= int(lens[0]) <= 40
        # frames past the stop-predicted length are masked to zero
        assert np.all(np.asarray(mel)[0, int(lens[0]):] == 0.0)

    def test_padded_equals_unpadded(self, tmp_path):
        """Teacher-forced AR loss path: masked attention keys, index-flipped
        BiLSTM, and the masked postnet make padded batches exactly equal
        unpadded runs (framework-wide contract); the scan's extra padded
        steps are causal and cannot reach valid frames."""
        model = build_model(TACOTRON2_CFG)
        rng = np.random.default_rng(0)
        L, Lpad = 5, 10
        toks = rng.integers(0, 8, (1, L)).astype(np.int32)
        durs = rng.integers(2, 4, (1, L)).astype(np.int32)
        T = int(durs.sum())
        mel = rng.normal(size=(1, T, 6)).astype(np.float32)
        y = np.array([1], np.int32)

        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(toks), jnp.asarray(durs),
            jnp.asarray(mel), jnp.asarray(y),
            jnp.asarray([L], jnp.int32), jnp.asarray([T], jnp.int32),
            train=True)
        out_unpad, loss_u, _ = model.apply(
            variables, jnp.asarray(toks), jnp.asarray(durs),
            jnp.asarray(mel), jnp.asarray(y),
            jnp.asarray([L], jnp.int32), jnp.asarray([T], jnp.int32),
            train=False)

        toks_p = np.zeros((1, Lpad), np.int32)
        toks_p[:, :L] = toks
        durs_p = np.zeros((1, Lpad), np.int32)
        durs_p[:, :L] = durs
        mel_p = np.zeros((1, T + 16, 6), np.float32)
        mel_p[:, :T] = mel
        out_pad, loss_p, _ = model.apply(
            variables, jnp.asarray(toks_p), jnp.asarray(durs_p),
            jnp.asarray(mel_p), jnp.asarray(y),
            jnp.asarray([L], jnp.int32), jnp.asarray([T], jnp.int32),
            train=False)
        np.testing.assert_allclose(np.asarray(out_pad)[:, :T],
                                   np.asarray(out_unpad)[:, :T],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(loss_p), float(loss_u), rtol=1e-5)

    def test_reduction_factor_groups(self, tmp_path):
        """r frames per decoder step: T not divisible by r is padded
        internally and the output still covers exactly T frames."""
        cfg = dict(TACOTRON2_CFG, **{"reduction-factor": 3})
        model = build_model(cfg)
        rng = np.random.default_rng(1)
        toks = rng.integers(0, 8, (2, 6)).astype(np.int32)
        durs = np.full((2, 6), 2, np.int32)
        T = 11  # not divisible by r=3
        mel = rng.normal(size=(2, T, 6)).astype(np.float32)
        v = model.init(jax.random.PRNGKey(0), jnp.asarray(toks),
                       jnp.asarray(durs), jnp.asarray(mel),
                       jnp.asarray([0, 1], jnp.int32),
                       jnp.asarray([6, 6], jnp.int32),
                       jnp.asarray([T, T], jnp.int32), train=True)
        out, loss, detail = model.apply(
            v, jnp.asarray(toks), jnp.asarray(durs), jnp.asarray(mel),
            jnp.asarray([0, 1], jnp.int32), jnp.asarray([6, 6], jnp.int32),
            jnp.asarray([T, T], jnp.int32), train=False)
        assert out.shape == (2, T, 6)
        assert np.isfinite(float(loss))

    def test_bf16_compute_and_spk_embed(self):
        """bf16 compute dtype + continuous speaker embeddings: the scan
        carry must be dtype-stable (regression: the attention context was
        initialized in compute dtype but produced in the BiLSTM's fp32,
        breaking lax.scan's carry-type invariant under bfloat16)."""
        cfg = dict(TACOTRON2_CFG, compute_dtype="bfloat16",
                   use_spk_embed=True, spk_embed_dim=8)
        model = build_model(cfg)
        rng = np.random.default_rng(2)
        toks = rng.integers(0, 8, (2, 6)).astype(np.int32)
        durs = np.full((2, 6), 2, np.int32)
        T = 12
        mel = rng.normal(size=(2, T, 6)).astype(np.float32)
        y = rng.normal(size=(2, 8)).astype(np.float32)
        v = model.init({"params": jax.random.PRNGKey(0),
                        "vq": jax.random.PRNGKey(1)},
                       jnp.asarray(toks), jnp.asarray(durs),
                       jnp.asarray(mel), jnp.asarray(y),
                       jnp.asarray([6, 4], jnp.int32),
                       jnp.asarray([T, 9], jnp.int32), train=True)
        out, loss, _ = model.apply(
            v, jnp.asarray(toks), jnp.asarray(durs), jnp.asarray(mel),
            jnp.asarray(y), jnp.asarray([6, 4], jnp.int32),
            jnp.asarray([T, 9], jnp.int32), train=True,
            rngs={"vq": jax.random.PRNGKey(2)})
        assert np.isfinite(float(loss))
        mel_o, lens = model.apply(
            {"params": v["params"]}, jnp.asarray(toks), jnp.asarray(y),
            jnp.asarray([6, 4], jnp.int32), method="infer")
        assert np.all(np.isfinite(np.asarray(mel_o, np.float32)))


class TestSpeakerEmbeddingMode:
    def _embs(self, n=24, dim=12, seed=1):
        rng = np.random.default_rng(seed)
        spk_emb = rng.normal(size=(3, dim)).astype(np.float32)
        return {f"u{i:02d}": spk_emb[i % 3] for i in range(n)}, spk_emb

    def test_train_and_unseen_speaker_infer(self, tmp_path):
        cfg = {**CFG, "use_spk_embed": True, "spk_embed_dim": 12}
        rng = np.random.default_rng(0)
        embs, spk_emb = self._embs()
        # data whose speaker offset is a linear function of the embedding
        token_mel = rng.normal(size=(8, 6)).astype(np.float32) * 2
        W = rng.normal(size=(12, 6)).astype(np.float32) * 0.3
        items = []
        for i in range(24):
            L = int(rng.integers(3, 9))
            toks = rng.integers(0, 8, L)
            durs = rng.integers(2, 5, L)
            mel = np.repeat(token_mel[toks], durs, axis=0) \
                + embs[f"u{i:02d}"] @ W
            items.append((f"u{i:02d}", toks, durs, mel, i % 3))
        write_token_mel_dir(tmp_path / "tm", items, spk_embs=embs)

        ds = TokenMelDataset(tmp_path / "tm", cfg)
        batch = next(ds.batches(8, shuffle=False, epochs=1))
        assert batch[3].shape == (8, 12)      # float embeddings, not ids
        assert batch[3].dtype == np.float32

        trainer = build_trainer(cfg)
        trainer.init_state(batch)
        losses = []
        for b in ds.batches(8, shuffle=True, seed=0, epochs=40):
            losses.append(float(trainer.train_step(b)["Total"]))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

        # unseen-speaker inference from a NEW embedding vector
        model = trainer.model
        v = {"params": jax.device_get(trainer.state.params)}
        new_emb = rng.normal(size=(1, 12)).astype(np.float32)
        toks = jnp.asarray(np.pad(np.arange(5, dtype=np.int32), (0, 5))[None])
        mel, lens = model.apply(v, toks, jnp.asarray(new_emb),
                                jnp.asarray([5], jnp.int32), method="infer")
        assert np.all(np.isfinite(np.asarray(mel)))
        assert int(lens[0]) > 0

    def test_decode_tts_cli_with_embeddings(self, tmp_path, monkeypatch,
                                            capsys):
        import sys
        import yaml

        from vae_npvc_tpu.bin.decode_tts import main as decode_main
        from vae_npvc_tpu.bin.train_tts import train as train_cli
        from vae_npvc_tpu.data import kaldi_io

        cfg = {**CFG, "use_spk_embed": True, "spk_embed_dim": 12,
               "max_iter": 6, "iters_per_checkpoint": 6, "iters_per_log": 3,
               "batch_size": 4}
        embs, spk_emb = self._embs()
        rng = np.random.default_rng(0)
        token_mel = rng.normal(size=(8, 6)).astype(np.float32)
        items = []
        for i in range(24):
            L = int(rng.integers(3, 9))
            toks = rng.integers(0, 8, L)
            durs = rng.integers(2, 5, L)
            items.append((f"u{i:02d}", toks, durs,
                          np.repeat(token_mel[toks], durs, axis=0), i % 3))
        d = tmp_path / "tm"
        write_token_mel_dir(d, items, spk_embs=embs)
        conf = tmp_path / "c.yaml"
        conf.write_text(yaml.safe_dump(cfg))
        out = tmp_path / "exp"
        train_cli(argparse.Namespace(config=str(conf), output_dir=str(out),
                                     checkpoint=None, train_dir=str(d),
                                     valid_dir=str(d)))
        ckpt = out / "model.loss.best"
        assert ckpt.exists()

        dec = tmp_path / "dec"
        monkeypatch.setattr(sys, "argv", [
            "decode_tts", "-c", str(conf), "--checkpoint", str(ckpt),
            "--tokens", str(d / "tokens.txt"),
            "--spk_emb", str(d / "spk_emb.scp"),
            "--output-dir", str(dec)])
        decode_main()
        assert "Synthesized 24" in capsys.readouterr().out
        mats = dict(kaldi_io.read_ark(f"scp:{dec}/feats.scp"))
        assert len(mats) == 24
        assert all(np.all(np.isfinite(m)) for m in mats.values())

    def test_decode_tts_vc_trials(self, tmp_path, monkeypatch, capsys):
        """Trials mode: source tokens synthesized with TARGET speaker
        embeddings (the reference pipeline's actual VC use)."""
        import sys
        import yaml

        from vae_npvc_tpu.bin.decode_tts import main as decode_main
        from vae_npvc_tpu.bin.train_tts import train as train_cli
        from vae_npvc_tpu.data import kaldi_io

        cfg = {**CFG, "use_spk_embed": True, "spk_embed_dim": 12,
               "max_iter": 6, "iters_per_checkpoint": 6, "iters_per_log": 3,
               "batch_size": 4}
        embs, spk_emb = self._embs()
        rng = np.random.default_rng(0)
        token_mel = rng.normal(size=(8, 6)).astype(np.float32)
        items = []
        for i in range(12):
            L = int(rng.integers(3, 9))
            toks = rng.integers(0, 8, L)
            durs = rng.integers(2, 5, L)
            items.append((f"u{i:02d}", toks, durs,
                          np.repeat(token_mel[toks], durs, axis=0), i % 3))
        d = tmp_path / "tm"
        write_token_mel_dir(d, items, spk_embs={u: embs[u] for u, *_ in
                                                items})
        # per-SPEAKER mean embeddings keyed by speaker id
        with kaldi_io.ArkWriter(d / "mean.ark", d / "spk_emb_mean.scp") as w:
            for s in range(3):
                w.write(str(s), spk_emb[s][None, :])
        (d / "trials_vc").write_text("u00 1\nu01 2\nu02 0\n")

        conf = tmp_path / "c.yaml"
        conf.write_text(yaml.safe_dump(cfg))
        out = tmp_path / "exp"
        train_cli(argparse.Namespace(config=str(conf), output_dir=str(out),
                                     checkpoint=None, train_dir=str(d),
                                     valid_dir=None))
        dec = tmp_path / "vc"
        monkeypatch.setattr(sys, "argv", [
            "decode_tts", "-c", str(conf),
            "--checkpoint", str(out / "model.loss.best"),
            "--tokens", str(d / "tokens.txt"),
            "--trials", str(d / "trials_vc"),
            "--spk_emb", str(d / "spk_emb_mean.scp"),
            "--output-dir", str(dec)])
        decode_main()
        assert "Synthesized 3" in capsys.readouterr().out
        mats = dict(kaldi_io.read_ark(f"scp:{dec}/feats.scp"))
        assert sorted(mats) == ["u00", "u01", "u02"]


def test_conv_backbone_padded_equals_unpadded():
    """The default conv backbone must honor the padded==unpadded contract
    too: ConvResStack masks only its stats/output, so the model masks the
    conv INPUTS — a regression here pulled nonzero padding biases into
    valid frames through the dilated convs (round-3 review finding,
    verified at max-abs-diff 0.37 before the fix)."""
    import jax.numpy as jnp

    from vae_npvc_tpu.models import build_model

    model = build_model(CFG)   # block_type: conv (default)
    rng = np.random.default_rng(0)
    L, Lpad = 5, 10
    toks = rng.integers(0, 8, (1, L)).astype(np.int32)
    durs = rng.integers(2, 4, (1, L)).astype(np.int32)
    T = int(durs.sum())
    mel = rng.normal(size=(1, T, 6)).astype(np.float32)
    y = np.array([1], np.int32)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(toks), jnp.asarray(durs),
        jnp.asarray(mel), jnp.asarray(y),
        jnp.asarray([L], jnp.int32), jnp.asarray([T], jnp.int32),
        train=True)
    out_unpad, _, _ = model.apply(
        variables, jnp.asarray(toks), jnp.asarray(durs),
        jnp.asarray(mel), jnp.asarray(y),
        jnp.asarray([L], jnp.int32), jnp.asarray([T], jnp.int32),
        train=False)

    toks_p = np.zeros((1, Lpad), np.int32); toks_p[:, :L] = toks
    durs_p = np.zeros((1, Lpad), np.int32); durs_p[:, :L] = durs
    mel_p = np.zeros((1, T + 16, 6), np.float32); mel_p[:, :T] = mel
    out_pad, _, _ = model.apply(
        variables, jnp.asarray(toks_p), jnp.asarray(durs_p),
        jnp.asarray(mel_p), jnp.asarray(y),
        jnp.asarray([L], jnp.int32), jnp.asarray([T], jnp.int32),
        train=False)
    np.testing.assert_allclose(np.asarray(out_pad)[:, :T],
                               np.asarray(out_unpad)[:, :T],
                               rtol=1e-5, atol=1e-5)

    # mel axis padded but token axis exactly at bucket length: beyond
    # sum(durs), length_regulate repeats the LAST (valid, nonzero) token
    # encoding — frames must be masked before the variance predictors, or
    # their kernel-3 convs leak the repeated tail into the last valid frames
    mel_p2 = np.zeros((1, T + 16, 6), np.float32); mel_p2[:, :T] = mel
    out_pad2, _, _ = model.apply(
        variables, jnp.asarray(toks), jnp.asarray(durs),
        jnp.asarray(mel_p2), jnp.asarray(y),
        jnp.asarray([L], jnp.int32), jnp.asarray([T], jnp.int32),
        train=False)
    np.testing.assert_allclose(np.asarray(out_pad2)[:, :T],
                               np.asarray(out_unpad)[:, :T],
                               rtol=1e-5, atol=1e-5)
