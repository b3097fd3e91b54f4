"""Fused Pallas TPU kernel for GroupNorm (+ optional GLU epilogue).

PROFILE.md attributes ~3.8 ms of the flat-family step (fwd+bwd ablation) to
GroupNorm statistics: XLA lowers the two-pass moments of nn/blocks.py
``group_norm`` into separate HBM-bound reduce fusions over the GLU
pre-activations (a (B, 256, 1024) bf16 tensor per decoder layer), so each
norm costs ~3 full HBM passes forward (stats read, normalize read+write)
plus the GLU read/write, and more backward. This kernel performs
stats → normalize → affine → (optional tanh⊙sigmoid GLU) in one VMEM
residency per batch row: 1 HBM read + 1 write forward, and an analytic
backward (recomputing stats on-chip rather than saving/re-reading
activations) at 2 reads + 1 write.

Semantics match nn/blocks.py ``group_norm`` for the unmasked, unsharded
case exactly (same fp32 two-pass moments, same cast-then-GLU order); the
masked / sequence-sharded paths — validation and sequence-parallel
inference — keep the stock XLA lowering. Reference behavior being fused:
torch ``GroupNorm`` + GLU of vae_npvc/model/layers.py:181-249
(DeConv1d_Layernorm_GLU_ResSkip) and :129-178 (Conv1d_Layernorm_LRelu_
Residual).

Callers gate on :func:`wants` (static shape/VMEM checks) and
:func:`compiled_ok` (one-time compile probe) like ops/attention_pallas.py.

**Default OFF.** The on-chip A/B (tools/perf_families.py ``*_gn_fused``
rows, v5e 2026-08-19) measured the kernel as a clear REGRESSION at the
shipped training shapes: flat 60.7 ms/step fused vs 49.0 stock, flagship
vqvae2 77.8 vs 57.6. XLA already keeps the GN stats + GLU epilogue inside
its conv fusions well enough that pulling them into a standalone Pallas
dispatch *adds* HBM round-trips at the kernel boundaries (the conv output
must be materialized for the kernel instead of flowing through a fused
epilogue) — the opposite of the ablation's prediction. The kernel is kept
for study behind ``VAE_NPVC_FUSED_GN=1`` (or :func:`set_enabled`); the
fused *attention* kernel (ops/attention_pallas.py), whose A/B is a win,
stays default-on.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .pallas_common import available

# largest (T*C) block the kernel will take on-chip: the backward holds a
# handful of fp32 (T, C) temporaries in VMEM, so 2^18 elements (1 MiB fp32
# each) keeps worst-case residency well under the ~16 MiB budget. Both
# shipped hot shapes fit: flat GLU stacks (128, 1024) = 2^17, flagship
# vqvae2 (256, 1024) = 2^18.
_MAX_BLOCK_ELEMS = 1 << 18

_FORCE = None   # tri-state override: True/False force, None = env default
_PROBE_OK = None


def set_enabled(flag):
    """Process-wide override for A/B tooling (tools/perf_families.py);
    True forces the kernel on, False off, None restores the env default.
    Takes effect at the next trace."""
    global _FORCE
    _FORCE = flag


def enabled():
    if _FORCE is not None:
        return _FORCE
    # measured slower than the stock XLA lowering on-chip (module docstring)
    # ⇒ opt-in only
    return os.environ.get("VAE_NPVC_FUSED_GN", "0").lower() in (
        "1", "on", "always", "true", "yes")


def wants(shape, num_groups: int, glu: bool) -> bool:
    """Static gate: True when (B, T, C) GroupNorm(num_groups) fits the
    kernel's layout constraints (full-lane group slices, sublane-aligned
    time axis, VMEM-bounded block)."""
    if len(shape) != 3:
        return False
    B, T, C = shape
    if num_groups <= 0 or num_groups > 8 or C % num_groups:
        return False
    if glu and num_groups != 2:
        # the GLU halves must coincide with the group slices; every shipped
        # GLU norm is GroupNorm(2, 2C) (nn/blocks.py GLUResSkip/DeConvGLU)
        return False
    if (C // num_groups) % 128 or T % 16 or T * C > _MAX_BLOCK_ELEMS:
        return False
    return B >= 1 and enabled()


def compiled_ok():
    """available() plus a one-time tiny compile probe (degrades to the
    stock XLA path on any Mosaic failure instead of aborting the caller)."""
    global _PROBE_OK
    if not enabled():
        return False
    if _PROBE_OK is None:
        if not available():
            return False   # don't latch: a later TPU backend may probe
        try:
            # B=2: block-vs-array inequality must be exercised — several
            # TPU block-shape violations only manifest once B > 1
            x = jnp.zeros((2, 16, 256), jnp.bfloat16)
            s = jnp.ones((256,), jnp.float32)
            b = jnp.zeros((256,), jnp.float32)
            out = fused_group_norm(x, s, b, 2, glu=True)
            # cover the custom-VJP backward too: a bwd-only Mosaic failure
            # would otherwise surface mid-training, after the gate passed
            gx = jax.grad(lambda a: jnp.sum(
                fused_group_norm(a, s, b, 2, glu=True)
                .astype(jnp.float32)))(x)
            jax.block_until_ready((out, gx))
            _PROBE_OK = True
        except Exception as e:  # noqa: BLE001 — any compile/runtime failure
            import logging
            logging.getLogger("vae_npvc_tpu.ops").warning(
                f"fused GroupNorm kernel failed its probe "
                f"({type(e).__name__}: {e}); using the stock XLA path")
            _PROBE_OK = False
    return _PROBE_OK


# --------------------------------------------------------------- kernels
def _group_stats(x, G, eps):
    """Per-group (mean, rstd, xn) with the stock two-pass fp32 moments
    (nn/blocks.py:81-103 semantics, unmasked). x: (T, C) fp32."""
    T, C = x.shape
    Cg = C // G
    xns, rstds = [], []
    for g in range(G):
        xs = x[:, g * Cg:(g + 1) * Cg]
        n = float(T * Cg)
        mean = jnp.sum(xs) / n
        var = jnp.maximum(jnp.sum(jnp.square(xs - mean)) / n, 0.0)
        rstd = jax.lax.rsqrt(var + eps)
        xns.append((xs - mean) * rstd)
        rstds.append(rstd)
    xn = jnp.concatenate(xns, axis=1) if G > 1 else xns[0]
    return xn, rstds


def _fwd_kernel(x_ref, s_ref, b_ref, o_ref, *, G, eps, glu):
    x = x_ref[0].astype(jnp.float32)                      # (T, C)
    xn, _ = _group_stats(x, G, eps)
    y = xn * s_ref[...] + b_ref[...]                      # (T,C)·(1,C)
    # cast before the GLU — the stock path norms in fp32, casts to the
    # compute dtype, then applies tanh⊙sigmoid in that dtype
    y = y.astype(o_ref.dtype)
    if glu:
        # transcendentals on the compute-dtype-rounded y, evaluated in fp32
        # and rounded back — matches XLA's bf16 tanh/sigmoid (upcast, eval,
        # truncate) and keeps Mosaic happy: tanh/sigmoid on a bf16 vector
        # lowers an f32 scalar constant broadcast into a bf16 vector, which
        # fails Mosaic verification on real TPUs (vector.broadcast element
        # type mismatch; seen on v5e, jax 0.8 — interpret mode hides it)
        H = y.shape[1] // 2
        ta = jnp.tanh(y[:, :H].astype(jnp.float32)).astype(o_ref.dtype)
        sb = jax.nn.sigmoid(y[:, H:].astype(jnp.float32)).astype(o_ref.dtype)
        o_ref[0] = (ta * sb).astype(o_ref.dtype)
    else:
        o_ref[0] = y


def _bwd_kernel(x_ref, s_ref, b_ref, g_ref, dx_ref, dg_ref, db_ref,
                *, G, eps, glu):
    x = x_ref[0].astype(jnp.float32)                      # (T, C)
    T, C = x.shape
    Cg = C // G
    xn, rstds = _group_stats(x, G, eps)
    if glu:
        y = xn * s_ref[...] + b_ref[...]
        H = C // 2
        ta = jnp.tanh(y[:, :H])
        sb = jax.nn.sigmoid(y[:, H:])
        go = g_ref[0].astype(jnp.float32)                 # (T, H)
        dy = jnp.concatenate(
            [go * sb * (1.0 - jnp.square(ta)),
             go * ta * sb * (1.0 - sb)], axis=1)          # (T, C)
    else:
        dy = g_ref[0].astype(jnp.float32)
    dg_ref[0] = jnp.sum(dy * xn, axis=0, keepdims=True)   # per-b partials
    db_ref[0] = jnp.sum(dy, axis=0, keepdims=True)
    dxn = dy * s_ref[...]
    parts = []
    for g in range(G):
        sl = slice(g * Cg, (g + 1) * Cg)
        dxn_g, xn_g = dxn[:, sl], xn[:, sl]
        n = float(T * Cg)
        m1 = jnp.sum(dxn_g) / n
        m2 = jnp.sum(dxn_g * xn_g) / n
        parts.append((dxn_g - m1 - xn_g * m2) * rstds[g])
    dx = jnp.concatenate(parts, axis=1) if G > 1 else parts[0]
    dx_ref[0] = dx.astype(dx_ref.dtype)


# ------------------------------------------------------------- dispatch
def _call_fwd(x, scale, bias, G, eps, glu, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, C = x.shape
    Cout = C // 2 if glu else C
    s2 = scale.astype(jnp.float32).reshape(1, C)
    b2 = bias.astype(jnp.float32).reshape(1, C)
    kernel = functools.partial(_fwd_kernel, G=G, eps=eps, glu=glu)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, Cout), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, Cout), x.dtype),
        interpret=interpret,
    )(x, s2, b2)


def _call_bwd(x, scale, bias, g, G, eps, glu, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, C = x.shape
    Cout = C // 2 if glu else C
    s2 = scale.astype(jnp.float32).reshape(1, C)
    b2 = bias.astype(jnp.float32).reshape(1, C)
    kernel = functools.partial(_bwd_kernel, G=G, eps=eps, glu=glu)
    dx, dgp, dbp = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Cout), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # (B, 1, C) not (B, C): a (1, C) block over a (B, C) array
            # violates the TPU block-shape rule (second-to-last block dim
            # must be sublane-aligned or equal the array dim) once B > 1
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), x.dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
        interpret=interpret,
    )(x, s2, b2, g)
    # param grads are fp32 (B, 1, C) per-row partials; the (tiny)
    # cross-batch sum runs as a stock XLA reduce
    return dx, jnp.sum(dgp, axis=(0, 1)), jnp.sum(dbp, axis=(0, 1))


# ------------------------------------------------------------------ API
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn(x, scale, bias, G, eps, glu, interpret):
    return _call_fwd(x, scale, bias, G, eps, glu, interpret)


def _gn_fwd(x, scale, bias, G, eps, glu, interpret):
    return _call_fwd(x, scale, bias, G, eps, glu, interpret), (x, scale, bias)


def _gn_bwd(G, eps, glu, interpret, res, g):
    x, scale, bias = res
    return _call_bwd(x, scale, bias, g, G, eps, glu, interpret)


_gn.defvjp(_gn_fwd, _gn_bwd)


def fused_group_norm(x, scale, bias, num_groups, eps=1e-5, *, glu=False,
                     interpret=False):
    """Fused GroupNorm (+ optional GLU) for unmasked (B, T, C) inputs.

    Matches nn/blocks.py ``group_norm(x, scale, bias, num_groups, eps)``
    (followed by ``tanh(y[..:C/2])·sigmoid(y[..C/2:])`` when ``glu``) —
    tests/test_groupnorm_pallas.py pins value and gradient parity.
    Differentiable in x/scale/bias via the analytic GN backward.
    """
    B, T, C = x.shape
    assert scale.shape == (C,) and bias.shape == (C,), (scale.shape, C)
    assert wants((B, T, C), num_groups, glu) or interpret, (x.shape,
                                                            num_groups)
    return _gn(x, scale, bias, int(num_groups), float(eps), bool(glu),
               bool(interpret))
