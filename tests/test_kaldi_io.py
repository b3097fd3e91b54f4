"""Unit tests for the from-scratch Kaldi ark/scp I/O layer."""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke  # fast tier: pytest -m smoke

from vae_npvc_tpu.data import kaldi_io as kio


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_roundtrip_uncompressed(tmp_path, rng):
    mats = {f"utt{i}": rng.normal(size=(50 + i, 80)).astype(np.float32)
            for i in range(5)}
    ark, scp = tmp_path / "a.ark", tmp_path / "a.scp"
    with kio.ArkWriter(ark, scp) as w:
        for utt, mat in mats.items():
            w[utt] = mat
    scp_map = kio.read_scp(scp)
    assert list(scp_map) == list(mats)
    for utt, mat in mats.items():
        got = kio.load_mat(scp_map[utt])
        np.testing.assert_array_equal(got, mat)
        assert kio.matrix_header(scp_map[utt]) == mat.shape


def test_range_read_matches_slice(tmp_path, rng):
    mat = rng.normal(size=(300, 80)).astype(np.float32)
    ark, scp = tmp_path / "a.ark", tmp_path / "a.scp"
    with kio.ArkWriter(ark, scp) as w:
        w["u"] = mat
    rx = kio.read_scp(scp)["u"]
    # kaldi ranges are inclusive: [10:19] -> rows 10..19
    got = kio.load_mat(rx + "[10:19]")
    np.testing.assert_array_equal(got, mat[10:20])
    got = kio.load_mat(rx + "[0:0]")
    np.testing.assert_array_equal(got, mat[0:1])
    got = kio.load_mat(rx + "[290:299]")
    np.testing.assert_array_equal(got, mat[290:300])


def test_matrix_header_honors_range(tmp_path, rng):
    """matrix_header must report the dims load_mat would return for a
    ranged rxspecifier — the conversion path buckets/pads by these."""
    mat = rng.normal(size=(120, 40)).astype(np.float32)
    ark, scp = tmp_path / "a.ark", tmp_path / "a.scp"
    with kio.ArkWriter(ark, scp) as w:
        w["u"] = mat
    rx = kio.read_scp(scp)["u"]
    assert kio.matrix_header(rx) == (120, 40)
    assert kio.matrix_header(rx + "[10:19]") == (10, 40)
    assert kio.matrix_header(rx + "[10:19,0:7]") == (10, 8)
    assert kio.load_mat(rx + "[10:19,0:7]").shape == (10, 8)


def test_vector_range_read(tmp_path, rng):
    vec = rng.normal(size=(50,)).astype(np.float32)
    ark = tmp_path / "v.ark"
    # hand-rolled FV record (the writer emits matrices only)
    with open(ark, "wb") as f:
        f.write(b"u ")
        offset = f.tell()
        f.write(b"\0BFV \x04" + np.int32(50).tobytes() + vec.tobytes())
    rx = f"{ark}:{offset}"
    np.testing.assert_array_equal(kio.load_mat(rx), vec)
    got = kio.load_mat(rx + "[5:14]")
    np.testing.assert_array_equal(got, vec[5:15])


def test_compressed_roundtrip_format1(tmp_path, rng):
    mat = (rng.normal(size=(200, 40)) * 3.0).astype(np.float32)
    ark = tmp_path / "c.ark"
    with kio.ArkWriter(ark, tmp_path / "c.scp", compression_method=1) as w:
        w["u"] = mat
    got = kio.load_mat(kio.read_scp(tmp_path / "c.scp")["u"])
    assert got.shape == mat.shape
    # format-1 is 8-bit per element with per-column pieces: tolerance ~ range/64
    tol = (mat.max() - mat.min()) / 50
    assert np.abs(got - mat).max() < tol


def test_compressed_roundtrip_format2_small_rows(tmp_path, rng):
    # method 1 with <= 8 rows falls back to the uint16 format
    mat = rng.normal(size=(5, 40)).astype(np.float32)
    ark = tmp_path / "c.ark"
    with kio.ArkWriter(ark, tmp_path / "c.scp", compression_method=1) as w:
        w["u"] = mat
    got = kio.load_mat(kio.read_scp(tmp_path / "c.scp")["u"])
    tol = (mat.max() - mat.min()) / 60000
    assert np.abs(got - mat).max() < tol


def test_compressed_range_read(tmp_path, rng):
    mat = rng.normal(size=(100, 16)).astype(np.float32)
    with kio.ArkWriter(tmp_path / "c.ark", tmp_path / "c.scp",
                       compression_method=1) as w:
        w["u"] = mat
    rx = kio.read_scp(tmp_path / "c.scp")["u"]
    full = kio.load_mat(rx)
    part = kio.load_mat(rx + "[30:59]")
    np.testing.assert_array_equal(part, full[30:60])


def test_streaming_ark_reader(tmp_path, rng):
    mats = {f"u{i}": rng.normal(size=(20, 10)).astype(np.float32)
            for i in range(4)}
    ark = tmp_path / "a.ark"
    with kio.ArkWriter(ark) as w:
        for utt, mat in mats.items():
            w[utt] = mat
    got = dict(kio.read_ark(f"ark:{ark}"))
    assert list(got) == list(mats)
    for utt in mats:
        np.testing.assert_array_equal(got[utt], mats[utt])


def test_write_helper_specifier(tmp_path, rng):
    mat = rng.normal(size=(10, 5)).astype(np.float32)
    w = kio.write_helper(f"ark,scp:{tmp_path}/x.ark,{tmp_path}/x.scp")
    w["a"] = mat
    w.close()
    np.testing.assert_array_equal(
        kio.load_mat(kio.read_scp(tmp_path / "x.scp")["a"]), mat)


def test_dict_and_list_data(tmp_path):
    p = tmp_path / "utt2spk"
    p.write_text("u1 spkA\nu2 spkB\n")
    assert kio.load_dict_data(p) == {"u1": "spkA", "u2": "spkB"}
    assert kio.load_list_data(p) == [["u1", "spkA"], ["u2", "spkB"]]


def test_interop_with_external_decoder(tmp_path, rng):
    """Our writer's output decodes with an EXTERNAL implementation: kaldiio
    when installed, else the spec-based decoder restated from the Kaldi C++
    sources (tests/test_golden_fixtures.py) — unconditional either way."""
    mat = rng.normal(size=(37, 13)).astype(np.float32)
    with kio.ArkWriter(tmp_path / "a.ark", tmp_path / "a.scp") as w:
        w["u"] = mat
    try:
        import kaldiio
        got = kaldiio.load_mat(str(kio.read_scp(tmp_path / "a.scp")["u"]))
    except ImportError:
        from test_golden_fixtures import spec_decode
        got = spec_decode((tmp_path / "a.ark").read_bytes()[len(b"u "):])
    np.testing.assert_array_equal(got, mat)
