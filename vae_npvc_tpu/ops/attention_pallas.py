"""Fused Pallas TPU kernel for masked multi-head self-attention.

The transformer token-TTS backbone runs attention as separate XLA ops
(QK^T matmul → fp32 masked softmax → AV matmul), materializing the
(B, H, T, T) score tensor in HBM twice per layer per direction — measured
at 38% MFU for the family (PROFILE.md), the worst non-AR row, with the
fp32 softmax round-trips called out as a main contributor. This kernel
computes scores → stable softmax → weighted sum in one VMEM-resident pass
per (batch·head, query-tile): HBM traffic drops from O(B·H·T²) to
O(B·H·T·d), and the softmax is fp32 with explicit max-subtraction (the
same hazard class as the GST fusion NaN, nn/gst.py — here structurally
impossible because the kernel owns the schedule).

Dtype policy (round 4): matmul operands stay in the INPUT dtype — on TPU a
bf16 caller gets native MXU bf16 passes (the previous fp32 casts forced the
~4×-slower fp32 MXU mode) — while every accumulation, the masking, the
max-subtraction, and the LSE are fp32. For bf16 operands the QKᵀ products
are bit-identical to the cast-then-fp32-matmul ones (bf16 is exactly
representable in fp32); only the AV/dv/dq/dk passes carry bf16-rounded
probabilities/ds, the standard flash-attention trade
(tests/test_attention_pallas.py pins both fp32-exact and bf16 parity).

Semantics match the stock path exactly (tests/test_attention_pallas.py):
``softmax((q k^T)·scale + key-padding mask) v`` with keys at positions
``>= length`` excluded per batch row. Training works: a custom VJP
implements the standard flash-attention backward (recompute p from the
saved per-row logsumexp; dv = pᵀ dO, ds = p(dP − D), dq = ds K,
dk = dsᵀ q) with dk/dv accumulated in VMEM scratch across query tiles.

Falls back to interpret mode off-TPU (tests) — callers gate on
:func:`available` like ops/vq_pallas.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


from .pallas_common import available, round_up as _round_up  # noqa: F401

_PROBE_OK = None


def compiled_ok():
    """available() plus a one-time tiny compile probe of the kernel.

    'auto' callers gate on this instead of available() so a Mosaic compile
    failure on some backend degrades gracefully to the stock XLA path
    instead of aborting the caller's whole jit."""
    global _PROBE_OK
    if _PROBE_OK is None:
        if not available():
            return False   # don't latch: a later TPU backend may probe
        try:
            # B>1 + lengths + nq>1 query tiles + the custom-VJP backward:
            # Mosaic failures can be shape- or pass-specific (the original
            # (1,1) SMEM block spec compiled at B=1 but violated the TPU
            # block-shape rule at B=4), so the probe must cover the real
            # call pattern, not just the cheapest one
            # probe at the PRODUCTION default tile_q (256): a tile-size-
            # specific Mosaic failure at a non-default tile would otherwise
            # pass the probe and abort the caller's real jit. T=512 keeps
            # nq>1 query tiles covered.
            q = jnp.zeros((4, 2, 512, 64), jnp.bfloat16)
            lens = jnp.array([512, 100, 17, 1], jnp.int32)
            out = fused_attention(q, q, q, lens)
            gq = jax.grad(lambda a: jnp.sum(
                fused_attention(a, a, a, lens)
                .astype(jnp.float32)))(q)
            jax.block_until_ready((out, gq))
            _PROBE_OK = True
        except Exception as e:  # noqa: BLE001 — any compile/runtime failure
            import logging
            logging.getLogger("vae_npvc_tpu.ops").warning(
                f"fused attention kernel failed its probe "
                f"({type(e).__name__}: {e}); using the stock XLA path")
            _PROBE_OK = False
    return _PROBE_OK


# --------------------------------------------------------------- forward
def _fwd_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, l_ref, *, scale,
                tile_q):
    import jax.experimental.pallas as pl

    # matmuls run in the INPUT dtype with fp32 accumulation: bf16 operands
    # are exactly representable in fp32, so the products equal the
    # cast-then-fp32-matmul ones while the MXU runs its native (≈4×
    # faster) bf16 pass. Softmax/max-subtraction/LSE stay fp32 — the
    # stability contract is unchanged.
    q = q_ref[0]                                         # (TQ, dp)
    k = k_ref[0]                                         # (Tp, dp)
    v = v_ref[0]                                         # (Tp, dp)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    kid = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    # len_ref holds the FULL (BH, 1) array (a (1,1) SMEM block fails the
    # TPU block-shape rule once BH > 1); index this grid step's row
    s = jnp.where(kid < len_ref[pl.program_id(0), 0], s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)               # (TQ, 1)
    m = jnp.maximum(m, NEG_INF / 2)                      # all-masked guard
    p = jnp.exp(s - m)                                   # (TQ, Tp), fp32
    denom = jnp.sum(p, axis=-1, keepdims=True)
    # AV in the input dtype too (flash-standard): bf16 probabilities cost
    # ~3 decimal digits on an already-bf16 output, and halve the pass
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.maximum(denom, 1e-30)).astype(o_ref.dtype)
    lse = m + jnp.log(jnp.maximum(denom, 1e-30))         # (TQ, 1)
    l_ref[0] = lse.reshape(1, tile_q)


def _fwd(q, k, v, lengths, scale, tile_q, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, T, d = q.shape
    dp = _round_up(d, 128)
    Tp = _round_up(T, max(tile_q, 128))
    BH = B * H

    def prep(x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T), (0, dp - d)))
        return x.reshape(BH, Tp, dp)

    qp, kp, vp = prep(q), prep(k), prep(v)
    if lengths is None:
        lens = jnp.full((B,), T, jnp.int32)
    else:
        lens = jnp.maximum(jnp.asarray(lengths, jnp.int32), 1)
    lens_bh = jnp.repeat(lens, H).reshape(BH, 1)         # (BH, 1), 2-D SMEM

    nq = Tp // tile_q
    kernel = functools.partial(_fwd_kernel, scale=scale, tile_q=tile_q)
    o, lse = pl.pallas_call(
        kernel,
        grid=(BH, nq),
        in_specs=[
            pl.BlockSpec((BH, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_q, dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, dp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            # lse is (BH, 1, Tp) not (BH, Tp): a (1, tile_q) block over a
            # (BH, Tp) array violates the TPU block-shape rule (second-to-
            # last block dim must be sublane-aligned or equal the array
            # dim) once BH > 1
            pl.BlockSpec((1, 1, tile_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tp, dp), q.dtype),
            jax.ShapeDtypeStruct((BH, 1, Tp), jnp.float32),
        ],
        interpret=interpret,
    )(lens_bh, qp, kp, vp)
    out = o.reshape(B, H, Tp, dp)[:, :, :T, :d]
    return out, (qp, kp, vp, o, lse, lens_bh)


# -------------------------------------------------------------- backward
def _bwd_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, do_ref, l_ref,
                dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, scale):
    import jax.experimental.pallas as pl

    iq = pl.program_id(1)
    nq = pl.num_programs(1)

    @pl.when(iq == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    # same dtype policy as the forward: operands stay in the input dtype
    # (native MXU bf16 pass), every accumulation and the p/ds math is fp32
    q = q_ref[0]                                         # (TQ, dp)
    k = k_ref[0]                                         # (Tp, dp)
    v = v_ref[0]
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0]
    lse = l_ref[0, 0]                                    # (TQ,)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    kid = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kid < len_ref[pl.program_id(0), 0], s, NEG_INF)
    p = jnp.exp(s - lse[:, None])                        # normalized, fp32

    dv_acc[:] += jax.lax.dot_general(p.astype(do.dtype), do,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    D = jnp.sum(do.astype(jnp.float32) * o, axis=-1,
                keepdims=True)                           # (TQ, 1)
    ds = p * (dp - D) * scale                            # (TQ, Tp), fp32
    dsc = ds.astype(q.dtype)
    dq_ref[0] = jax.lax.dot_general(
        dsc, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_acc[:] += jax.lax.dot_general(dsc, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(iq == nq - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd(scale, tile_q, interpret, shapes, res, g):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, T, d = shapes
    qp, kp, vp, o, lse, lens_bh = res
    BH, Tp, dp = qp.shape
    nq = Tp // tile_q

    gp = jnp.pad(g.astype(qp.dtype),
                 ((0, 0), (0, 0), (0, Tp - T), (0, dp - d)))
    gp = gp.reshape(BH, Tp, dp)

    kernel = functools.partial(_bwd_kernel, scale=scale)
    blk_q = pl.BlockSpec((1, tile_q, dp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    blk_kv = pl.BlockSpec((1, Tp, dp), lambda b, i: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(BH, nq),
        in_specs=[
            pl.BlockSpec((BH, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.SMEM),
            blk_q, blk_kv, blk_kv, blk_q, blk_q,
            pl.BlockSpec((1, 1, tile_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[blk_q, blk_kv, blk_kv],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tp, dp), qp.dtype),
            jax.ShapeDtypeStruct((BH, Tp, dp), qp.dtype),
            jax.ShapeDtypeStruct((BH, Tp, dp), qp.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((Tp, dp), jnp.float32),
            pltpu.VMEM((Tp, dp), jnp.float32),
        ],
        interpret=interpret,
    )(lens_bh, qp, kp, vp, o, gp, lse)

    def unprep(x):
        return x.reshape(B, H, Tp, dp)[:, :, :T, :d]

    return unprep(dq), unprep(dk), unprep(dv), None


# ------------------------------------------------------------------ API
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attention(q, k, v, lengths, scale, tile_q, interpret):
    out, _ = _fwd(q, k, v, lengths, scale, tile_q, interpret)
    return out


def _attention_fwd(q, k, v, lengths, scale, tile_q, interpret):
    out, res = _fwd(q, k, v, lengths, scale, tile_q, interpret)
    return out, (q.shape, res)


def _attention_bwd(scale, tile_q, interpret, saved, g):
    shapes, res = saved
    return _bwd(scale, tile_q, interpret, shapes, res, g)


_attention.defvjp(_attention_fwd, _attention_bwd)


def fused_attention(q, k, v, lengths=None, *, scale=None, tile_q=256,
                    interpret=False):
    """``softmax((q kᵀ)·scale + mask) v`` fused on-chip.

    q, k, v: (B, H, T, d) with a shared sequence length (self-attention);
    ``lengths`` (B,) marks valid *key* positions per batch row (queries are
    not masked — padded query rows produce finite garbage the caller masks,
    the framework-wide contract). Differentiable (custom flash backward).
    """
    B, H, T, d = q.shape
    assert k.shape == q.shape and v.shape == q.shape, (q.shape, k.shape)
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    tile_q = min(tile_q, _round_up(T, 128))
    return _attention(q, k, v, lengths, float(scale), int(tile_q),
                      bool(interpret))


def reference_attention(q, k, v, lengths=None, *, scale=None):
    """The stock XLA path (nn/gst.py math) — the kernel's parity oracle."""
    B, H, T, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if lengths is not None:
        kid = jnp.arange(T)[None, None, None, :]
        s = jnp.where(kid < jnp.asarray(lengths)[:, None, None, None],
                      s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)
