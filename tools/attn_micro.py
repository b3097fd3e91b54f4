"""Isolated fused-attention kernel micro-bench (VERDICT r3 item 2 follow-up).

The step-level A/B moved <2% after the round-4 bf16-operand change — this
measures the kernel ALONE at the transformer family's shape to say whether
(a) the kernel got faster but is a small share of the 20.5 ms step, or
(b) the bf16 passes didn't engage. Rows: fwd and fwd+bwd wall at
(B=32, H=4, T=768, d=96), bf16 operands (the new path) vs fp32 operands
(equivalent to the pre-round-4 in-kernel casts), plus the stock XLA
reference path for the same shapes.

Usage (TPU): python tools/attn_micro.py [--repeats 50]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def bench(fn, args, repeats):
    import jax

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / repeats * 1e3


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=50)
    ap.add_argument("--shape", default="32,4,768,96")
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode (CPU smoke of the harness)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    B, H, T, d = map(int, args.shape.split(","))

    import jax
    import jax.numpy as jnp

    from vae_npvc_tpu.ops.attention_pallas import (fused_attention,
                                                   reference_attention)

    rng = np.random.default_rng(0)
    qf = jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32))
    lens = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)), jnp.int32)

    interp = bool(args.interpret)
    rows = []
    for dtype_name, q in (("bf16", qf.astype(jnp.bfloat16)), ("fp32", qf)):
        fwd = jax.jit(lambda a: fused_attention(a, a, a, lens,
                                                interpret=interp))
        bwd = jax.jit(jax.grad(lambda a: jnp.sum(
            fused_attention(a, a, a, lens, interpret=interp)
            .astype(jnp.float32))))
        sfwd = jax.jit(lambda a: reference_attention(a, a, a, lens))
        sbwd = jax.jit(jax.grad(lambda a: jnp.sum(
            reference_attention(a, a, a, lens).astype(jnp.float32))))
        row = {"operands": dtype_name,
               "fused_fwd_ms": round(bench(fwd, (q,), args.repeats), 3),
               "fused_grad_ms": round(bench(bwd, (q,), args.repeats), 3),
               "stock_fwd_ms": round(bench(sfwd, (q,), args.repeats), 3),
               "stock_grad_ms": round(bench(sbwd, (q,), args.repeats), 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        Path(args.out).write_text(json.dumps(
            {"shape": [B, H, T, d], "rows": rows}, indent=1))


if __name__ == "__main__":
    main()
