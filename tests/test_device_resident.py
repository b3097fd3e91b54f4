"""Device-resident training corpus (Trainer.stage_dataset / train_steps_device).

The HBM-staged path samples iid utterance+crop windows inside the jitted
K-step scan; per-item crop semantics (random start in [0, len-crop], zero-pad
short utterances) must match the host loader's (reference
utt2mel_spk.py:54-70). Mirrors the vocoder trainer's device-resident coverage.
"""

import numpy as np
import yaml

from tests.toy_config import toy_config
from vae_npvc_tpu.data.dataset import UttMelSpkDataset
from vae_npvc_tpu.data.kaldi_io import ArkWriter
from vae_npvc_tpu.train.trainer import Trainer


def _toy_dir(tmp_path, lengths=(24, 30, 8, 40, 16, 24), d=10):
    """Utterance i is filled with constant value i+1 (crop provenance)."""
    data = tmp_path / "data"
    data.mkdir(exist_ok=True)
    with ArkWriter(str(data / "feats.ark"), str(data / "feats.scp")) as w:
        for i, t in enumerate(lengths):
            w.write(f"u{i}", np.full((t, d), i + 1.0, np.float32))
    with open(data / "utt2num_frames", "w") as f:
        for i, t in enumerate(lengths):
            f.write(f"u{i} {t}\n")
    with open(data / "utt2spk_id", "w") as f:
        for i in range(len(lengths)):
            f.write(f"u{i} {i % 3}\n")
    return data


class TestPaddedArrays:
    def test_contents_and_padding(self, tmp_path):
        data = _toy_dir(tmp_path)
        ds = UttMelSpkDataset(data, dict(toy_config(), crop_length=16,
                                         use_native_loader=False))
        feats, n_frames, spk_ids = ds.padded_arrays(num_workers=2)
        assert feats.shape == (6, 40, 10)   # M = longest utterance
        np.testing.assert_array_equal(n_frames, [24, 30, 8, 40, 16, 24])
        np.testing.assert_array_equal(spk_ids, [0, 1, 2, 0, 1, 2])
        for i, t in enumerate([24, 30, 8, 40, 16, 24]):
            assert np.all(feats[i, :t] == i + 1.0)
            assert np.all(feats[i, t:] == 0.0)      # zero padding
        assert ds.padded_nbytes() == feats.nbytes

    def test_pads_up_to_crop_length(self, tmp_path):
        data = _toy_dir(tmp_path, lengths=(8, 12))
        ds = UttMelSpkDataset(data, dict(toy_config(), crop_length=16,
                                         use_native_loader=False))
        feats, _, _ = ds.padded_arrays(num_workers=0)
        assert feats.shape[1] == 16   # M >= crop_length


class TestTrainStepsDevice:
    def test_trains_and_is_deterministic(self, tmp_path):
        data = _toy_dir(tmp_path)
        cfg = dict(toy_config(), crop_length=16, use_native_loader=False)
        ds = UttMelSpkDataset(data, cfg)

        def run():
            tr = Trainer(cfg)
            tr.init_state((np.zeros((4, 16, 10), np.float32),
                           np.zeros((4,), np.int32)))
            tr._dev_batch = None
            nbytes = tr.stage_dataset(ds, batch_size=4)
            assert nbytes == 6 * 40 * 10 * 4
            d1 = tr.train_steps_device(3)
            d2 = tr.train_steps_device(2)
            assert tr.iteration == 5
            assert int(tr.state.step) == 5
            return (np.asarray(d1["Total"]), np.asarray(d2["Total"]))

        a1, a2 = run()
        b1, b2 = run()
        assert np.isfinite(a1).all() and np.isfinite(a2).all()
        # same seed + same iteration offsets => identical sampled trajectory
        np.testing.assert_array_equal(a1, b1)
        np.testing.assert_array_equal(a2, b2)
        # distinct offsets => distinct batches (losses differ step to step)
        assert len(set(np.round(np.concatenate([a1, a2]), 6))) > 1

    def test_short_corpus_finite(self, tmp_path):
        """Every utterance shorter than the crop: zero-padded windows."""
        data = _toy_dir(tmp_path, lengths=(8, 6, 4))
        cfg = dict(toy_config(), crop_length=16, use_native_loader=False)
        ds = UttMelSpkDataset(data, cfg)
        tr = Trainer(cfg)
        tr.init_state((np.zeros((2, 16, 10), np.float32),
                       np.zeros((2,), np.int32)))
        tr.stage_dataset(ds, batch_size=2)
        d = tr.train_steps_device(2)
        assert np.isfinite(np.asarray(d["Total"])).all()

    def test_indexed_matches_host_loader_trajectory(self, tmp_path):
        """Epoch mode: train_steps_indices on the staged corpus follows the
        host loader's EXACT data order (index_iterator is the shared
        source), so the training trajectory matches the sequential host
        path batch for batch."""
        from vae_npvc_tpu.data.dataset import batch_iterator, index_iterator

        data = _toy_dir(tmp_path)
        cfg = dict(toy_config(), crop_length=16, use_native_loader=False)
        ds = UttMelSpkDataset(data, cfg)
        init = (np.zeros((4, 16, 10), np.float32), np.zeros((4,), np.int32))

        host = Trainer(cfg)
        host.init_state(init)
        host_losses = []
        it = batch_iterator(ds, 4, shuffle=True, drop_last=True, seed=5,
                            num_workers=0, epochs=None)
        for _, batch in zip(range(5), it):
            host_losses.append(float(host.train_step(batch)["Total"]))

        dev = Trainer(cfg)
        dev.init_state(init)
        dev.stage_dataset(ds, batch_size=4)
        pairs = []
        for _, p in zip(range(5), index_iterator(ds, 4, shuffle=True,
                                                 drop_last=True, seed=5)):
            pairs.append(p)
        d1 = dev.train_steps_indices(np.stack([p[0] for p in pairs[:3]]),
                                     np.stack([p[1] for p in pairs[:3]]))
        d2 = dev.train_steps_indices(np.stack([p[0] for p in pairs[3:]]),
                                     np.stack([p[1] for p in pairs[3:]]))
        dev_losses = list(np.asarray(d1["Total"])) + \
            list(np.asarray(d2["Total"]))
        np.testing.assert_allclose(dev_losses, host_losses,
                                   rtol=1e-5, atol=1e-6)
        assert dev.iteration == host.iteration == 5

    def test_sharded_gather_on_virtual_mesh(self, tmp_path):
        """Batch divisible by the 8-device mesh: the in-scan gather carries
        the data-axis sharding constraint (both iid and indexed paths)."""
        import jax

        if len(jax.devices()) < 8:
            import pytest
            pytest.skip("needs 8 virtual devices")
        data = _toy_dir(tmp_path)
        cfg = dict(toy_config(), crop_length=16, use_native_loader=False)
        ds = UttMelSpkDataset(data, cfg)
        tr = Trainer(cfg)
        tr.init_state((np.zeros((16, 16, 10), np.float32),
                       np.zeros((16,), np.int32)))
        tr.stage_dataset(ds, batch_size=16)
        d = tr.train_steps_device(2)
        assert np.isfinite(np.asarray(d["Total"])).all()
        idx = np.tile(np.arange(6, dtype=np.int32), 3)[:16][None].repeat(2, 0)
        starts = np.zeros((2, 16), np.int32)
        d2 = tr.train_steps_indices(idx, starts)
        assert np.isfinite(np.asarray(d2["Total"])).all()
        assert tr.iteration == 4

    def test_requires_staging(self):
        tr = Trainer(toy_config())
        tr.init_state((np.zeros((2, 16, 10), np.float32),
                       np.zeros((2,), np.int32)))
        try:
            tr.train_steps_device(1)
            assert False, "expected ValueError"
        except ValueError as e:
            assert "stage_dataset" in str(e)


class TestTrainCliDeviceResident:
    def test_cli_device_resident(self, tmp_path):
        from vae_npvc_tpu.bin.train import train

        data = _toy_dir(tmp_path)
        cfg = dict(toy_config(), batch_size=4, crop_length=16,
                   max_iter=12, iters_per_checkpoint=6, iters_per_log=6,
                   steps_per_call=4, device_resident=True, num_jobs=0)
        cfg_path = tmp_path / "conf.yaml"
        yaml.safe_dump(cfg, open(cfg_path, "w"))

        class Args:
            config = str(cfg_path)
            output_dir = str(tmp_path / "exp")
            checkpoint = None
            train_dir = str(data)
            valid_dir = None
            profile_dir = None

        train(Args())
        out = tmp_path / "exp"
        assert (out / "iter.6").exists() and (out / "iter.12").exists()
        log = (out / "train.log").read_text()
        assert "Device-resident corpus" in log
        assert "epoch sampling" in log          # the default mode
        assert "Iter 6:" in log and "Iter 12:" in log

    def test_cli_device_resident_iid(self, tmp_path):
        from vae_npvc_tpu.bin.train import train

        data = _toy_dir(tmp_path)
        cfg = dict(toy_config(), batch_size=4, crop_length=16,
                   max_iter=8, iters_per_checkpoint=8, iters_per_log=4,
                   steps_per_call=4, device_resident=True,
                   device_resident_sampling="iid", num_jobs=0)
        cfg_path = tmp_path / "conf.yaml"
        yaml.safe_dump(cfg, open(cfg_path, "w"))

        class Args:
            config = str(cfg_path)
            output_dir = str(tmp_path / "exp_iid")
            checkpoint = None
            train_dir = str(data)
            valid_dir = None
            profile_dir = None

        train(Args())
        log = (tmp_path / "exp_iid" / "train.log").read_text()
        assert "iid sampling" in log
        assert "Iter 8:" in log

    def test_cli_falls_back_over_limit(self, tmp_path):
        from vae_npvc_tpu.bin.train import train

        data = _toy_dir(tmp_path)
        cfg = dict(toy_config(), batch_size=4, crop_length=16,
                   max_iter=4, iters_per_checkpoint=4, iters_per_log=4,
                   device_resident=True, device_resident_limit_bytes=64,
                   num_jobs=0)
        cfg_path = tmp_path / "conf.yaml"
        yaml.safe_dump(cfg, open(cfg_path, "w"))

        class Args:
            config = str(cfg_path)
            output_dir = str(tmp_path / "exp")
            checkpoint = None
            train_dir = str(data)
            valid_dir = None
            profile_dir = None

        train(Args())
        log = (tmp_path / "exp" / "train.log").read_text()
        assert "using the host loader" in log
        assert "Iter 4:" in log
