"""Combined-corpus data-dir tool (egs/pretrain/local/combine_data.py).

BASELINE config 5 concatenates independently-dumped corpora; speaker ids
must land in disjoint global ranges and incompatible feature dims must be
rejected (the AISHELL-3 and VCC2020 native front-ends differ). No reference
counterpart (the reference has no combined-corpus recipe).
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

from vae_npvc_tpu.data.kaldi_io import ArkWriter

_spec = importlib.util.spec_from_file_location(
    "combine_data",
    Path(__file__).resolve().parents[1]
    / "egs/pretrain/local/combine_data.py")
combine_data = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(combine_data)


def _make_dump(root, utts, spk_ids, dim=8):
    """utts: {utt: spk}; spk_ids: {spk: local_id}."""
    root = Path(root)
    root.mkdir(parents=True)
    with ArkWriter(root / "feats.ark", root / "feats.scp") as w:
        for u in utts:
            w.write(u, np.zeros((5, dim), np.float32))
    (root / "utt2num_frames").write_text(
        "".join(f"{u} 5\n" for u in utts))
    (root / "utt2spk_id").write_text(
        "".join(f"{u} {spk_ids[s]}\n" for u, s in utts.items()))
    (root / "utt2spk").write_text(
        "".join(f"{u} {s}\n" for u, s in utts.items()))
    (root / "spk2spk_id").write_text(
        "".join(f"{s} {i}\n" for s, i in spk_ids.items()))


def test_disjoint_remap(tmp_path):
    _make_dump(tmp_path / "a", {"a1": "spkA", "a2": "spkB"},
               {"spkA": 0, "spkB": 1})
    _make_dump(tmp_path / "b", {"b1": "spkC", "b2": "spkD", "b3": "spkC"},
               {"spkC": 0, "spkD": 2})  # gap: local max 2 -> range width 3
    n = combine_data.combine(tmp_path / "out",
                             [tmp_path / "a", tmp_path / "b"])
    out = tmp_path / "out"
    sid = dict(line.split() for line in
               (out / "utt2spk_id").read_text().splitlines())
    assert sid == {"a1": "0", "a2": "1", "b1": "2", "b2": "4", "b3": "2"}
    spk = dict(line.split() for line in
               (out / "spk2spk_id").read_text().splitlines())
    assert spk == {"spkA": "0", "spkB": "1", "spkC": "2", "spkD": "4"}
    assert n == 5  # next free id (dir2 offset 2 + local range 3)
    feats = [line.split()[0] for line in
             (out / "feats.scp").read_text().splitlines()]
    assert feats == ["a1", "a2", "b1", "b2", "b3"]


def test_name_collision_needs_prefixes(tmp_path):
    _make_dump(tmp_path / "a", {"u1": "spkA"}, {"spkA": 0})
    _make_dump(tmp_path / "b", {"u2": "spkA"}, {"spkA": 0})
    with pytest.raises(SystemExit, match="prefixes"):
        combine_data.combine(tmp_path / "out",
                             [tmp_path / "a", tmp_path / "b"])
    combine_data.combine(tmp_path / "out2",
                         [tmp_path / "a", tmp_path / "b"],
                         prefixes=["x_", "y_"])
    spk = dict(line.split() for line in
               (tmp_path / "out2" / "spk2spk_id").read_text().splitlines())
    assert spk == {"x_spkA": "0", "y_spkA": "1"}


def test_dim_mismatch_rejected(tmp_path):
    _make_dump(tmp_path / "a", {"a1": "spkA"}, {"spkA": 0}, dim=8)
    _make_dump(tmp_path / "b", {"b1": "spkB"}, {"spkB": 0}, dim=16)
    with pytest.raises(SystemExit, match="dims differ"):
        combine_data.combine(tmp_path / "out",
                             [tmp_path / "a", tmp_path / "b"])
