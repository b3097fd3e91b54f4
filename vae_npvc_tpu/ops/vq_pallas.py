"""Fused Pallas TPU kernel for the VQ bottleneck.

One pass over the latents computes, per tile of N = B*T flattened frames:
  distances (MXU matmul) → argmin code ids → gathered codebook rows (as a
  one-hot MXU matmul, not a dynamic gather) → accumulated EMA cluster
  statistics (one-hot^T @ z, also MXU).

The reference materializes the full (N, K) distance matrix, a separate argmin,
an index_select, AND a second (K, N) one-hot matmul as distinct ops with HBM
round-trips between them (reference: vae_npvc/model/layers_vq.py:103-113,
203-211). Here everything after the tile load lives in VMEM/registers; HBM
traffic is one read of z and one write of (ids, z_q) plus the (K, D) stats.

All outputs are non-differentiable pieces of the EMA-VQ forward (ids, detached
codes, cluster stats); gradient wiring (straight-through, commitment loss)
stays in ops/vq.py. Falls back to the jnp path off-TPU.

Kernel layout notes (pallas_guide.md):
  - grid over N tiles; codebook (K, D) stays resident in VMEM across steps;
  - stats accumulate in VMEM scratch, written out on the last grid step;
  - argmin is computed on fp32 scores; ties break to the lowest index to match
    jnp.argmin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


from .pallas_common import available, round_up as _round_up  # noqa: F401


def _vq_kernel(z_ref, emb_ref, embt_ref, idx_ref, zq_ref, sum_ref, cnt_ref,
               acc_sum, acc_cnt, *, n_valid, tile_n):
    """One grid step: process tile of z rows against the full codebook.

    All matmuls are kept in plain NN form ((M,C) @ (C,N), contracting the
    lhs's last dim with the rhs's first) — Mosaic lowers transposed
    contractions as (M, K, D) broadcast-multiply-reduce on the stack, which
    blows the scoped-VMEM limit at these sizes. That's why the transposed
    codebook arrives as a second input and the scatter one-hot is built
    directly in (K, TILE_N) orientation.
    """
    import jax.experimental.pallas as pl

    step = pl.program_id(0)
    z = z_ref[:]                     # (TILE_N, D)
    emb = emb_ref[:]                 # (K, D)
    embt = embt_ref[:]               # (D, K)
    K = emb.shape[0]

    # ||e||^2 - 2 z.e  (row-constant ||z||^2 omitted; argmin-invariant)
    dots = jax.lax.dot_general(
        z, embt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TILE_N, K)
    e2 = jnp.sum(embt.astype(jnp.float32) ** 2, axis=0)  # (K,)
    dist = e2[None, :] - 2.0 * dots
    idx = jnp.argmin(dist, axis=1).astype(jnp.int32)     # (TILE_N,)

    one_hot = (jax.lax.broadcasted_iota(jnp.int32, (z.shape[0], K), 1)
               == idx[:, None]).astype(jnp.float32)      # (TILE_N, K)
    zq = jax.lax.dot_general(
        one_hot, emb.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TILE_N, D)

    idx_ref[:] = idx[:, None]
    zq_ref[:] = zq.astype(zq_ref.dtype)

    # mask padded rows out of the statistics; build the scatter one-hot
    # directly transposed (K, TILE_N) to keep the stats matmul in NN form
    row = step * tile_n + jax.lax.broadcasted_iota(
        jnp.int32, (1, z.shape[0]), 1)                   # (1, TILE_N)
    valid = (row < n_valid).astype(jnp.float32)          # (1, TILE_N)
    oh_t = (jax.lax.broadcasted_iota(jnp.int32, (K, z.shape[0]), 0)
            == idx[None, :]).astype(jnp.float32) * valid  # (K, TILE_N)

    tile_sum = jax.lax.dot_general(                      # (K, D)
        oh_t, z.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    tile_cnt = jnp.sum(oh_t, axis=1)                     # (K,)

    # accumulate in scratch; init on first step, flush on last
    @pl.when(step == 0)
    def _init():
        acc_sum[:] = tile_sum
        acc_cnt[:] = tile_cnt[:, None]

    @pl.when(step != 0)
    def _acc():
        acc_sum[:] = acc_sum[:] + tile_sum
        acc_cnt[:] = acc_cnt[:] + tile_cnt[:, None]

    @pl.when(step == pl.num_programs(0) - 1)
    def _flush():
        sum_ref[:] = acc_sum[:]
        cnt_ref[:] = acc_cnt[:]


def vq_fused(z_flat, emb, *, tile_n=256, interpret=False):
    """Fused VQ forward pieces.

    ``z_flat`` (N, D) latents, ``emb`` (K, D) codebook →
    ``(idx (N,) int32, z_q (N, D), batch_sum (K, D), batch_elem (K,))``
    with statistics over the true N rows (padding masked).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, D = z_flat.shape
    K = emb.shape[0]
    N_pad = _round_up(max(N, tile_n), tile_n)
    if N_pad != N:
        z_flat = jnp.pad(z_flat, ((0, N_pad - N), (0, 0)))
    grid = N_pad // tile_n

    kernel = functools.partial(_vq_kernel, n_valid=N, tile_n=tile_n)
    idx, zq, bsum, bcnt = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_n, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((N_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((K, D), jnp.float32),
            jax.ShapeDtypeStruct((K, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, D), jnp.float32),
            pltpu.VMEM((K, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N_pad * K * (2 * D),          # dist + stats matmuls
            bytes_accessed=4 * (N_pad * D * 2 + K * D * 3),
            transcendentals=0),
        interpret=interpret,
    )(z_flat, emb, emb.T)
    return idx[:N, 0], zq[:N], bsum, bcnt[:, 0]

