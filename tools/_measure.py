"""Shared timed-step measurement — the single source of the fence idiom.

On the tunneled axon backend ``block_until_ready`` can return before device
execution completes (CLAUDE.md), so the only trustworthy fence is a
device→host transfer. Every perf tool times through this helper so the
protocol (warmup count, fence placement) cannot drift between copies.
"""

from __future__ import annotations

import time


def time_steps(step_fn, fence, steps, warmup=3):
    """Time ``steps`` calls of ``step_fn`` after ``warmup`` untimed calls.

    ``step_fn``: () -> out — dispatches one unit of device work; successive
        calls must chain device state internally (donation) so forcing the
        last output forces the whole sequence.
    ``fence``: (out) -> None — MUST read device memory back to host
        (e.g. ``lambda d: float(d["Total"])``).

    Returns (seconds_per_step, last_out).
    """
    out = None
    for _ in range(warmup):
        out = step_fn()
    if warmup:
        fence(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = step_fn()
    fence(out)
    return (time.perf_counter() - t0) / steps, out
