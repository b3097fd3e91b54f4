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
