"""Flagship-SHAPE sharding coverage (marker: heavy — opt-in, minutes of
XLA CPU compile).

``__graft_entry__.dryrun_multichip`` self-budgets: on a slow host it runs
only the tiny mode-coverage legs and skips the flagship-SHAPE legs
(full-width flat, vqvae2-from-YAML, pretrain batch-512).  This test is where
the full-shape coverage lives without an external timeout: it forces every
leg (VAE_NPVC_DRYRUN_FULL=1) on the 8-virtual-device CPU mesh.

Run with:  pytest -m heavy tests/test_flagship_shapes.py
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

pytestmark = pytest.mark.heavy


def test_dryrun_all_legs_full_shapes(monkeypatch, capsys):
    import __graft_entry__ as g

    monkeypatch.setenv("VAE_NPVC_DRYRUN_FULL", "1")
    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "flat Total=" in out
    assert "vqvae2 Total=" in out
    assert "pretrain_dp512 Total=" in out
    assert "skipped" not in out
