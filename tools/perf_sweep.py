"""Measured ablation sweep of flagship train-step variants on the real TPU.

Each variant recompiles the step and reports ms/step (device→host fence —
block_until_ready is unreliable on the tunneled axon backend). Used to decide
which optimization is worth building (VERDICT r1: attack the top profile
item *with evidence*).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def measure(config_patch=None, patch_fn=None, steps=20, label=""):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from vae_npvc_tpu.train.trainer import Trainer

    config = _flagship_config()
    config["compute_dtype"] = "bfloat16"
    if config_patch:
        config.update(config_patch)
    undo = patch_fn() if patch_fn else None
    try:
        trainer = Trainer(config)
        rng = np.random.default_rng(0)
        B, T, D = 128, 256, 80
        batch = (rng.normal(size=(B, T, D)).astype(np.float32),
                 rng.integers(0, 117, size=(B,)).astype(np.int32))
        trainer.init_state(batch)
        feats = jax.device_put(jnp.asarray(batch[0]), trainer.batch_sharding)
        spks = jax.device_put(jnp.asarray(batch[1]), trainer.batch_sharding)
        from tools._measure import time_steps
        sec, _ = time_steps(lambda: trainer.train_step((feats, spks)),
                            lambda d: float(d["Total"]), steps)
        ms = sec * 1e3
        print(f"{label:40s} {ms:8.2f} ms/step "
              f"({128 * 256 / ms * 1e3:,.0f} frames/s)", flush=True)
        return ms
    finally:
        if undo:
            undo()


def patch_gn_identity():
    """Replace GroupNorm's math with scale*x+bias (stats cost ablation)."""
    import jax.numpy as jnp

    from vae_npvc_tpu.nn import blocks

    orig = blocks.group_norm

    def fake(x, scale, bias, num_groups, eps=1e-5, mask=None, seq_axis=None,
             glu=False):
        import jax

        out = (x.astype(jnp.float32) * scale + bias).astype(x.dtype)
        if glu:
            H = out.shape[-1] // 2
            out = jnp.tanh(out[..., :H]) * jax.nn.sigmoid(out[..., H:])
        return out

    blocks.group_norm = fake
    return lambda: setattr(blocks, "group_norm", orig)


def patch_gn_onepass():
    """One-pass (shifted) variance: single read of the activations."""
    import jax
    import jax.numpy as jnp

    from vae_npvc_tpu.nn import blocks

    orig = blocks.group_norm

    def onepass(x, scale, bias, num_groups, eps=1e-5, mask=None,
                seq_axis=None, glu=False):
        B, T, C = x.shape
        G = num_groups
        xf = x.reshape(B, T, G, C // G)
        if mask is not None or seq_axis is not None or glu:
            return orig(x, scale, bias, num_groups, eps, mask, seq_axis,
                        glu)
        n = T * (C // G)
        s1 = jnp.sum(xf, axis=(1, 3), keepdims=True, dtype=jnp.float32)
        s2 = jnp.sum(jnp.square(xf.astype(jnp.float32)), axis=(1, 3),
                     keepdims=True)
        mean = s1 / n
        var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
        xn = ((xf.astype(jnp.float32) - mean)
              * jax.lax.rsqrt(var + eps)).reshape(B, T, C)
        return (xn * scale + bias).astype(x.dtype)

    blocks.group_norm = onepass
    return lambda: setattr(blocks, "group_norm", orig)


def main():
    base = measure(label="baseline (bf16)")
    measure(config_patch={"skip_nonfinite_updates": False},
            label="no nonfinite guard")
    measure(patch_fn=patch_gn_identity, label="GroupNorm -> affine only")
    measure(patch_fn=patch_gn_onepass, label="GroupNorm one-pass variance")
    measure(config_patch={"use_weight_norm_off": True},
            patch_fn=None, label="(noop patch sanity)")

    # weight norm off entirely (different model, bounds WN cost)
    from __graft_entry__ import _flagship_config
    c = _flagship_config()
    c["encoder"]["use_weight_norm"] = False
    c["decoder"]["use_weight_norm"] = False
    measure(config_patch={"encoder": c["encoder"], "decoder": c["decoder"]},
            label="weight norm OFF")


if __name__ == "__main__":
    main()
