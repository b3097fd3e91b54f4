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


def bench(fn, q, repeats):
    """Time ``repeats`` applications of fn chained inside ONE jit.

    fn maps (B,H,T,d)→(B,H,T,d), so the output feeds the next call's input
    directly — a serial dependency XLA cannot hoist. Per-call tunnel
    dispatch latency (~20 ms on the dev setup) otherwise dominates: a
    per-call loop measured "22 ms" for a kernel the whole 6-layer train
    step runs in 20.5 ms.
    """
    import jax

    def many(a):
        out = jax.lax.fori_loop(0, repeats, lambda i, acc: fn(acc), a)
        # device-side scalar fence: fetching the full tensor through the
        # dev tunnel costs ~seconds and swamps the measurement
        return out.reshape(-1)[0]

    f = jax.jit(many)
    np.asarray(f(q))                     # compile + run fence
    t0 = time.perf_counter()
    np.asarray(f(q))
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
        k = q * 0.5
        v = q * 0.25
        fwd = lambda a: fused_attention(a, k, v, lens,  # noqa: E731
                                        interpret=interp)
        bwd = jax.grad(lambda a: jnp.sum(
            fused_attention(a, k, v, lens, interpret=interp)
            .astype(jnp.float32)))
        # grads have q's shape+dtype, so they chain too
        bwd_c = lambda a: bwd(a).astype(q.dtype)  # noqa: E731
        sfwd = lambda a: reference_attention(a, k, v,  # noqa: E731
                                             lens).astype(q.dtype)
        sbwd = jax.grad(lambda a: jnp.sum(
            reference_attention(a, k, v, lens).astype(jnp.float32)))
        sbwd_c = lambda a: sbwd(a).astype(q.dtype)  # noqa: E731
        row = {"operands": dtype_name,
               "fused_fwd_ms": round(bench(fwd, q, args.repeats), 3),
               "fused_grad_ms": round(bench(bwd_c, q, args.repeats), 3),
               "stock_fwd_ms": round(bench(sfwd, q, args.repeats), 3),
               "stock_grad_ms": round(bench(sbwd_c, q, args.repeats), 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        Path(args.out).write_text(json.dumps(
            {"shape": [B, H, T, d], "rows": rows}, indent=1))


if __name__ == "__main__":
    main()
