"""Shared gating/layout helpers for the Pallas TPU kernels
(ops/vq_pallas.py, ops/attention_pallas.py)."""

from __future__ import annotations

import jax


def round_up(x, m):
    return -(-x // m) * m


def available():
    """True when compiled Pallas kernels can run (TPU backend present)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
