"""Native C++ ark loader: correctness vs the Python read path + pipeline use."""

import numpy as np
import pytest

from vae_npvc_tpu.data import kaldi_io
from vae_npvc_tpu.data.dataset import UttMelSpkDataset, batch_iterator
from vae_npvc_tpu.data.native_loader import NativeArkLoader


@pytest.fixture(scope="module")
def toy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    rng = np.random.default_rng(0)
    mats = {}
    with kaldi_io.ArkWriter(d / "f.ark", d / "feats.scp") as w, \
            open(d / "utt2num_frames", "w") as unf, \
            open(d / "utt2spk_id", "w") as u2s:
        for i in range(10):
            T = int(rng.integers(5, 40))
            m = rng.normal(size=(T, 6)).astype(np.float32)
            mats[f"u{i}"] = m
            w.write(f"u{i}", m)
            unf.write(f"u{i} {T}\n")
            u2s.write(f"u{i} {i % 3}\n")
    return d, mats


class TestNativeArkLoader:
    def test_open_and_metadata(self, toy_dir):
        d, mats = toy_dir
        ld = NativeArkLoader.open(d / "feats.scp")
        assert ld is not None, "native loader failed to build/open"
        assert ld.num_utts == 10
        assert ld.feat_dim == 6
        assert ld.num_frames(3) == mats["u3"].shape[0]

    def test_batch_matches_python_reads(self, toy_dir):
        d, mats = toy_dir
        ld = NativeArkLoader.open(d / "feats.scp")
        crop = 16
        indices = np.array([0, 3, 7, 9])
        starts = np.array([0, 2, 0, 5])
        out = ld.load_batch(indices, starts, crop, nthreads=4)
        for b, (i, s) in enumerate(zip(indices, starts)):
            m = mats[f"u{i}"]
            take = min(crop, m.shape[0] - s)
            np.testing.assert_array_equal(out[b, :take], m[s:s + take])
            assert np.all(out[b, take:] == 0.0)

    def test_pipeline_uses_native_and_matches_fallback(self, toy_dir):
        d, _ = toy_dir
        cfg = {"crop_length": 12}
        ds_native = UttMelSpkDataset(d, cfg, valid=True)
        assert ds_native.native is not None
        ds_py = UttMelSpkDataset(d, dict(cfg, use_native_loader=False),
                                 valid=True)
        assert ds_py.native is None
        b_n = next(batch_iterator(ds_native, 10, shuffle=False,
                                  drop_last=False, epochs=1, num_workers=2))
        b_p = next(batch_iterator(ds_py, 10, shuffle=False, drop_last=False,
                                  epochs=1, num_workers=2))
        np.testing.assert_array_equal(b_n[0], b_p[0])
        np.testing.assert_array_equal(b_n[1], b_p[1])

    @pytest.mark.parametrize("method", [1, 2])
    def test_compressed_bitexact_vs_python(self, tmp_path, method):
        """CM (per-column piecewise uint8) and CM2 (global uint16) windows
        decode bit-identically to the kaldi_io Python codec."""
        rng = np.random.default_rng(1 + method)
        mats = {}
        with kaldi_io.ArkWriter(tmp_path / "c.ark", tmp_path / "feats.scp",
                                compression_method=method) as w:
            for i in range(6):
                T = int(rng.integers(9, 50))
                m = (rng.normal(size=(T, 5)) * 10 - 3).astype(np.float32)
                mats[f"u{i}"] = m
                w.write(f"u{i}", m)
        ld = NativeArkLoader.open(tmp_path / "feats.scp")
        assert ld is not None
        oracle = {u: kaldi_io.load_mat(rx) for u, rx in kaldi_io.read_scp(tmp_path / "feats.scp").items()}
        crop = 16
        indices = np.array([0, 2, 5, 3])
        starts = np.array([0, 3, 1, 40])
        out = ld.load_batch(indices, starts, crop, nthreads=4)
        for b, (i, s) in enumerate(zip(indices, starts)):
            m = oracle[f"u{i}"]
            take = max(min(crop, m.shape[0] - s), 0)
            np.testing.assert_array_equal(out[b, :take], m[s:s + take])
            assert np.all(out[b, take:] == 0.0)

    def test_cm3_bitexact(self, tmp_path):
        """CM3 (global uint8) — not emitted by our writer, but readable from
        Kaldi-produced arks; bytes forged to the Kaldi layout."""
        import struct
        rng = np.random.default_rng(9)
        T, D = 20, 4
        raw = rng.integers(0, 256, size=(T, D)).astype(np.uint8)
        with open(tmp_path / "c.ark", "wb") as f, \
                open(tmp_path / "feats.scp", "w") as scp:
            f.write(b"u0 ")
            scp.write(f"u0 {tmp_path / 'c.ark'}:{f.tell()}\n")
            f.write(b"\x00BCM3 ")
            f.write(struct.pack("<ffii", -2.5, 7.25, T, D))
            f.write(raw.tobytes())
        ld = NativeArkLoader.open(tmp_path / "feats.scp")
        assert ld is not None
        oracle = {u: kaldi_io.load_mat(rx) for u, rx in kaldi_io.read_scp(tmp_path / "feats.scp").items()}["u0"]
        out = ld.load_batch(np.array([0]), np.array([2]), 8)
        np.testing.assert_array_equal(out[0], oracle[2:10])

    def test_compressed_pipeline_matches_fallback(self, tmp_path):
        """The dataset fast path engages on a compression_method=1 dir (the
        Kaldi make_fbank default) and matches the Python loader exactly."""
        rng = np.random.default_rng(3)
        with kaldi_io.ArkWriter(tmp_path / "c.ark", tmp_path / "feats.scp",
                                compression_method=1) as w, \
                open(tmp_path / "utt2num_frames", "w") as unf, \
                open(tmp_path / "utt2spk_id", "w") as u2s:
            for i in range(8):
                T = int(rng.integers(12, 40))
                w.write(f"u{i}", rng.normal(size=(T, 6)).astype(np.float32))
                unf.write(f"u{i} {T}\n")
                u2s.write(f"u{i} {i % 3}\n")
        cfg = {"crop_length": 12}
        ds_native = UttMelSpkDataset(tmp_path, cfg, valid=True)
        assert ds_native.native is not None
        ds_py = UttMelSpkDataset(tmp_path, dict(cfg, use_native_loader=False),
                                 valid=True)
        b_n = next(batch_iterator(ds_native, 8, shuffle=False,
                                  drop_last=False, epochs=1, num_workers=2))
        b_p = next(batch_iterator(ds_py, 8, shuffle=False, drop_last=False,
                                  epochs=1, num_workers=2))
        np.testing.assert_array_equal(b_n[0], b_p[0])
        np.testing.assert_array_equal(b_n[1], b_p[1])

    def test_double_ark_falls_back(self, tmp_path):
        with kaldi_io.ArkWriter(tmp_path / "d.ark", tmp_path / "feats.scp") as w:
            w.write("u0", np.random.default_rng(0).normal(size=(10, 4)))
        assert NativeArkLoader.open(tmp_path / "feats.scp") is None
