"""int8 quantized-training feasibility probe (VERDICT r3 item 8, stretch).

The v5e's 394 TOPS int8 peak is the one unexploited throughput lever
(PROFILE.md). Two measurements decide whether a quantized-training scheme
could realistically ~2x the flagship step:

A. **Throughput**: wall-time the flagship conv-equivalent contractions
   (im2col shapes of the encoder/decoder GLU convs) as bf16·bf16→f32 vs
   int8·int8→int32 dots. If the int8 form does not approach 2x, the MXU
   int8 path is not exposed for these shapes and the question closes.

B. **Quality drift**: 300 flagship steps with per-output-channel symmetric
   int8 fake-quantized conv weights (straight-through estimator) vs the
   stock bf16 run, same seed/data — the short-horizon drift of `X like`
   bounds the scheme's optimization cost. Patches
   ``jax.lax.conv_general_dilated`` process-wide (dedicated probe process).

Out of parity scope — a feasibility note, not a shipped mode.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/int8_probe.py \
      [--steps 300] [--skip_drift] [--out /tmp/onchip/int8_probe.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def throughput_rows(repeats=20):
    import jax
    import jax.numpy as jnp

    rows = []
    # im2col-equivalent shapes of the flagship hot convs at batch 128xT256:
    # (B*T, K*Cin) x (K*Cin, Cout)
    shapes = [
        ("enc conv 512->512 k3", 32768, 1536, 512),
        ("dec GLU 512->1024 k3", 32768, 1536, 1024),
        ("1x1 res/skip 512->640", 32768, 512, 640),
    ]
    rng = np.random.default_rng(0)
    for name, M, K, N in shapes:
        a = rng.normal(size=(M, K)).astype(np.float32)
        b = rng.normal(size=(K, N)).astype(np.float32)
        flops = 2 * M * K * N

        def bench(xa, xb, pet, acc_dtype):
            # `repeats` dots chained inside ONE jit via a serial data
            # dependency — per-call tunnel dispatch latency otherwise
            # dominates (a first cut measured "0.6 TFLOP/s" for a matmul
            # this chip runs at ~190: pure latency). Same idiom as the r3
            # chained-conv micro-bench.
            def many(x, y):
                # the carried scalar is a REAL value from the previous dot
                # (not a provable zero — a 0-multiplier would let XLA hoist
                # the loop-invariant dot out of the loop)
                if jnp.issubdtype(acc_dtype, jnp.integer):
                    tiny = lambda s: (s % 2).astype(x.dtype)  # noqa: E731
                else:
                    tiny = lambda s: (s * 1e-30).astype(x.dtype)  # noqa: E731

                def body(i, carry):
                    s, _ = carry
                    x2 = x.at[0, 0].add(tiny(s))
                    o = jax.lax.dot(x2, y, preferred_element_type=pet)
                    return (o[0, 0], o)
                out = jax.lax.fori_loop(
                    0, repeats, body,
                    (jnp.zeros((), pet),
                     jnp.zeros((M, N), pet)))[1]
                # fence value is a DEVICE-side scalar: fetching the full
                # (M, N) result through the dev tunnel costs seconds and
                # was the first cut's real bottleneck
                return out[0, 0]

            f = jax.jit(many)
            np.asarray(f(xa, xb))                # fence (compile + run)
            t0 = time.perf_counter()
            np.asarray(f(xa, xb))
            return (time.perf_counter() - t0) / repeats

        t_bf16 = bench(jnp.asarray(a, jnp.bfloat16),
                       jnp.asarray(b, jnp.bfloat16), jnp.float32,
                       jnp.bfloat16)
        qa = jnp.asarray(np.clip(np.round(a * 10), -127, 127), jnp.int8)
        qb = jnp.asarray(np.clip(np.round(b * 10), -127, 127), jnp.int8)
        try:
            t_int8 = bench(qa, qb, jnp.int32, jnp.int8)
            err = None
        except Exception as e:  # noqa: BLE001 — backend may reject int8
            t_int8, err = None, f"{type(e).__name__}: {e}"
        row = {"shape": name, "M": M, "K": K, "N": N,
               "bf16_tflops": round(flops / t_bf16 / 1e12, 1)}
        if t_int8:
            row["int8_tops"] = round(flops / t_int8 / 1e12, 1)
            row["speedup"] = round(t_bf16 / t_int8, 2)
        else:
            row["int8_error"] = err
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def patch_fake_quant_convs():
    """STE per-output-channel symmetric int8 fake-quant on conv kernels."""
    import jax
    import jax.numpy as jnp

    orig = jax.lax.conv_general_dilated

    def q(w):
        w32 = w.astype(jnp.float32)
        amax = jnp.max(jnp.abs(w32), axis=(0, 1), keepdims=True)  # per-out
        scale = jnp.maximum(amax, 1e-12) / 127.0
        wq = jnp.round(w32 / scale) * scale
        return (w32 + jax.lax.stop_gradient(wq - w32)).astype(w.dtype)

    def wrapped(lhs, rhs, *args, **kwargs):
        return orig(lhs, q(rhs), *args, **kwargs)

    jax.lax.conv_general_dilated = wrapped
    return lambda: setattr(jax.lax, "conv_general_dilated", orig)


def drift_run(steps, fake_quant):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from vae_npvc_tpu.train.trainer import Trainer

    undo = patch_fake_quant_convs() if fake_quant else (lambda: None)
    try:
        config = dict(_flagship_config(), compute_dtype="bfloat16")
        trainer = Trainer(config)
        rng = np.random.default_rng(0)
        batch = (rng.normal(size=(128, 256, 80)).astype(np.float32),
                 rng.integers(0, 117, size=(128,)).astype(np.int32))
        trainer.init_state(batch)
        feats = jax.device_put(jnp.asarray(batch[0]),
                               trainer.batch_sharding)
        spks = jax.device_put(jnp.asarray(batch[1]),
                              trainer.batch_sharding)
        xs = []
        for i in range(steps):
            d = trainer.train_step((feats, spks))
            if (i + 1) % 50 == 0:
                xs.append((i + 1, round(float(d["X like"]), 4)))
        return xs
    finally:
        undo()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--repeats", type=int, default=20)
    ap.add_argument("--skip_drift", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    result = {"throughput": throughput_rows(args.repeats)}
    if not args.skip_drift:
        result["drift_bf16"] = drift_run(args.steps, fake_quant=False)
        print(json.dumps({"drift_bf16": result["drift_bf16"]}), flush=True)
        result["drift_int8w"] = drift_run(args.steps, fake_quant=True)
        print(json.dumps({"drift_int8w": result["drift_int8w"]}),
              flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
