"""Vector-quantization core: plain (gradient-codebook) VQ and EMA-codebook VQ.

Functional re-design of the reference quantizers
(reference: vae_npvc/model/layers_vq.py — VectorQuantizer / EMAVectorQuantizer)
for XLA/TPU:

- layout is channels-last ``(B, T, D)``; the distance computation flattens to a
  single ``(B*T, K)`` matmul that lowers onto the MXU (the hottest op in training).
- the EMA codebook is explicit functional state (:class:`EmaVqState`) threaded
  through the train step — no buffer mutation. The cluster statistics are global
  reductions, so under data-parallel ``jit`` over a mesh GSPMD turns them into
  cross-chip ``psum`` automatically; semantics match the single-device reference.
- the reference's lazy init-from-first-batch (layers_vq.py:192-201) and dead-code
  random restarts (layers_vq.py:203-221) are ``lax.cond``-gated pure functions with
  explicit RNG.

Known-bug policy (SURVEY.md §7): the reference only applies the straight-through
estimator in the ``reduction == 'none'`` branch of the EMA path (layers_vq.py:310-315),
so its shipped ``frame_mean`` configs feed the *detached* codebook vector to the
decoder. We fix this by default; pass ``legacy_no_ste=True`` to reproduce the
reference behavior for bit-parity studies.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def l2_normalize(x, axis=-1, target_norm=1.0, eps=1e-12):
    """Scale rows to ``target_norm``.

    The reference divides by the exact norm (layers_vq.py:26-33), which NaNs on
    an exactly-zero row (reachable at init when a ReLU chain zeroes a frame);
    the eps floor only changes that degenerate case.
    """
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return target_norm * x / n


def nearest_code(z_flat, emb):
    """Index of the nearest codebook row for each row of ``z_flat``.

    ``z_flat`` (N, D), ``emb`` (K, D) -> (N,) int32. The ||z||^2 term is constant
    per row and does not change the argmin, so only the MXU matmul and the code
    norms are computed (reference materializes the full distance matrix,
    layers_vq.py:103-105).
    """
    dots = jax.lax.dot_general(
        z_flat, emb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, K)
    dist = jnp.sum(emb * emb, axis=1)[None, :] - 2.0 * dots
    return jnp.argmin(dist, axis=1).astype(jnp.int32)


def _reduce(loss_elem, reduction, B, T):
    """Reference reduction modes (layers_vq.py:123-140). ``loss_elem`` is (B*T, D)."""
    if reduction == "sum":
        return jnp.sum(loss_elem)
    if reduction == "mean":
        return jnp.mean(loss_elem)
    if reduction == "batch_mean":
        return jnp.sum(loss_elem) / B
    if reduction == "frame_mean":
        return jnp.sum(loss_elem) / (B * T)
    if reduction == "none":
        return loss_elem.reshape(B, T, -1)
    raise ValueError(f"unknown reduction {reduction!r}")


def codebook_perplexity(idx, num_codes):
    """exp(entropy) of the empirical code distribution (layers_vq.py:112-117)."""
    counts = jnp.zeros((num_codes,), jnp.float32).at[idx].add(1.0)
    probs = counts / idx.size
    return jnp.exp(-jnp.sum(probs * jnp.log(probs + 1e-10)))


# ---------------------------------------------------------------------------
# plain (gradient-codebook) vector quantizer
# ---------------------------------------------------------------------------

def vq_encode(emb, z, *, normalize=False):
    """(B, T, D) -> (B, T) int32 code indices (reference encode, layers_vq.py:35-58)."""
    B, T, D = z.shape
    z_flat = z.reshape(B * T, D)
    if normalize:
        z_flat = l2_normalize(z_flat)
        emb = l2_normalize(emb)
    return nearest_code(z_flat, emb).reshape(B, T)


def vq_decode(emb, idx, *, normalize=False):
    """(B, T) indices -> (B, T, D) codebook vectors (layers_vq.py:61-76)."""
    if normalize:
        emb = l2_normalize(emb)
    return jnp.take(emb, idx, axis=0)


def sparsity_loss(emb):
    """Diagonal cross-entropy codebook-sparsity regularizer: the Gram matrix
    E·Eᵀ as logits, targets = identity (reference layers_vq.py:153-157; the
    same regularizer exists on the condition embedding, layers.py:56-60)."""
    logits = emb @ emb.T
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.diagonal(logp))


def vq_forward(emb, z, *, normalize=False, reduction="frame_mean",
               quantize=True):
    """Training-time quantization with straight-through gradients.

    Returns ``(z_vq, z_qut_loss, z_enc_loss, detail)`` matching the reference
    contract (layers_vq.py:79-150):
      - ``z_qut_loss``: codebook loss, mse(e, sg(z_norm)) — moves codes to encodings
      - ``z_enc_loss``: commitment loss, mse(sg(e), z_norm) (+ norm loss when
        ``normalize``) — pulls the encoder toward its code
      - straight-through: ``z_vq = z_norm + sg(e - z_norm)``
      - ``detail['entropy']``: codebook perplexity
    """
    B, T, D = z.shape
    if not quantize:
        # bypass flag (reference layers_vq.py:79-81): identity pass-through
        zero = jnp.zeros((), jnp.float32)
        return z, zero, zero, {"entropy": zero}
    z_flat = z.reshape(B * T, D)
    if normalize:
        z_norm = l2_normalize(z_flat)
        emb_n = l2_normalize(emb)
    else:
        z_norm = z_flat
        emb_n = emb
    idx = nearest_code(jax.lax.stop_gradient(z_norm), jax.lax.stop_gradient(emb_n))
    z_q = jnp.take(emb_n, idx, axis=0)  # (B*T, D), grads flow to emb

    z_qut_elem = (z_q - jax.lax.stop_gradient(z_norm)) ** 2
    z_enc_elem = (jax.lax.stop_gradient(z_q) - z_norm) ** 2
    if normalize:
        z_enc_elem = z_enc_elem + (z_norm - z_flat) ** 2  # normalization loss
    z_qut_loss = _reduce(z_qut_elem, reduction, B, T)
    z_enc_loss = _reduce(z_enc_elem, reduction, B, T)

    z_vq = z_norm + jax.lax.stop_gradient(z_q - z_norm)
    detail = {"entropy": codebook_perplexity(idx, emb.shape[0])}
    return z_vq.reshape(B, T, D), z_qut_loss, z_enc_loss, detail


# ---------------------------------------------------------------------------
# EMA-codebook vector quantizer
# ---------------------------------------------------------------------------

class EmaVqState(NamedTuple):
    """Functional codebook state (reference buffers, layers_vq.py:170-173)."""
    initted: jnp.ndarray   # () bool — data-dependent init done?
    emb: jnp.ndarray       # (K, D) codebook
    emb_sum: jnp.ndarray   # (K, D) EMA of per-code vector sums
    emb_elem: jnp.ndarray  # (K,)  EMA of per-code counts


def ema_vq_init(num_codes, dim, dtype=jnp.float32):
    return EmaVqState(
        initted=jnp.zeros((), jnp.bool_),
        emb=jnp.zeros((num_codes, dim), dtype),
        emb_sum=jnp.zeros((num_codes, dim), dtype),
        emb_elem=jnp.ones((num_codes,), dtype),
    )


def _tiled_candidates(rng, z_flat, num_codes):
    """Random restart candidates: tile z with noise until >= K rows, permute,
    take K (reference _tile + randperm, layers_vq.py:183-197)."""
    N, D = z_flat.shape
    if N < num_codes:
        reps = (num_codes + N - 1) // N
        noise_rng, rng = jax.random.split(rng)
        z_flat = jnp.tile(z_flat, (reps, 1))
        z_flat = z_flat + jax.random.normal(noise_rng, z_flat.shape,
                                            z_flat.dtype) * (0.01 / math.sqrt(D))
    perm = jax.random.permutation(rng, z_flat.shape[0])
    return jnp.take(z_flat, perm[:num_codes], axis=0)


def ema_vq_encode(state, z):
    B, T, D = z.shape
    return nearest_code(z.reshape(B * T, D), state.emb).reshape(B, T)


def ema_vq_decode(state, idx):
    return jnp.take(state.emb, idx, axis=0)


def ema_vq_forward(state, z, rng, *, mu=0.9, threshold=1.0,
                   reduction="frame_mean", training=True, update=True,
                   legacy_no_ste=False, use_pallas=False, axis_name=None):
    """EMA quantizer forward + codebook update.

    Returns ``(z_vq, z_qut_loss, z_enc_loss, new_state, detail)``.

    ``z_qut_loss`` is always 0 (the EMA path has no codebook gradient,
    layers_vq.py:300). ``detail`` carries the reference's codebook health metrics
    {entropy, used_curr, usage, diff_emb} (layers_vq.py:228-233) as jnp scalars.

    All cluster statistics are computed with global ops — under a data-sharded
    ``jit`` XLA inserts the cross-replica reductions (the DP-aware piece of model
    math called out in SURVEY.md §7).
    """
    B, T, D = z.shape
    K = state.emb.shape[0]
    z_flat = z.reshape(B * T, D)
    z_sg = jax.lax.stop_gradient(z_flat)

    init_rng, restart_rng = jax.random.split(rng)

    # Lazy data-dependent init on the first training batch (layers_vq.py:192-201).
    def do_init(s):
        emb0 = _tiled_candidates(init_rng, z_sg, K)
        if axis_name is not None:
            # keep the data-dependent init identical across shards
            pool = jax.lax.all_gather(emb0, axis_name).reshape(-1, D)
            pick = jax.random.permutation(
                jax.random.fold_in(init_rng, 1), pool.shape[0])[:K]
            emb0 = jnp.take(pool, pick, axis=0)
        return EmaVqState(jnp.ones((), jnp.bool_), emb0, emb0,
                          jnp.ones((K,), z.dtype))

    if training:
        state = jax.lax.cond(state.initted, lambda s: s, do_init, state)

    if training and update and use_pallas:
        # fused Pallas path: distances+argmin+gather+stats in one VMEM pass
        from .vq_pallas import vq_fused
        idx, z_q, batch_sum, batch_elem = vq_fused(z_sg, state.emb)
        z_q = jax.lax.stop_gradient(z_q)
        batch_sum = batch_sum.astype(z.dtype)
        batch_elem = batch_elem.astype(z.dtype)
    else:
        idx = nearest_code(z_sg, state.emb)
        z_q = jax.lax.stop_gradient(jnp.take(state.emb, idx, axis=0))

    if training and update:
        if not use_pallas:
            one_hot = jax.nn.one_hot(idx, K, dtype=z.dtype)      # (N, K)
            # Cluster sums are statistics, not activations: keep them exact
            # (HIGHEST avoids the default bf16-input matmul path).
            batch_sum = jax.lax.dot_general(                      # (K, D) on MXU
                one_hot, z_sg, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST).astype(z.dtype)
            batch_elem = jnp.sum(one_hot, axis=0)                 # (K,)
        cand = _tiled_candidates(restart_rng, z_sg, K)

        if axis_name is not None:
            # explicit shard_map path: the cluster statistics are per-shard;
            # psum them over the data axis, and make the restart candidates
            # identical on every shard by all-gathering each shard's K picks
            # and re-sampling K rows from the pooled (n_shards*K, D) set with
            # the shared rng (the GSPMD path gets all this from XLA's
            # auto-inserted collectives instead).
            batch_sum = jax.lax.psum(batch_sum, axis_name)
            batch_elem = jax.lax.psum(batch_elem, axis_name)
            pool = jax.lax.all_gather(cand, axis_name).reshape(-1, D)
            pick = jax.random.permutation(
                jax.random.fold_in(restart_rng, 1), pool.shape[0])[:K]
            cand = jnp.take(pool, pick, axis=0)

        old_emb = state.emb
        emb_sum = mu * state.emb_sum + (1.0 - mu) * batch_sum
        emb_elem = mu * state.emb_elem + (1.0 - mu) * batch_elem
        usage = (emb_elem >= threshold).astype(z.dtype)[:, None]  # (K, 1)
        emb = usage * (emb_sum / emb_elem[:, None]) + (1.0 - usage) * cand

        k_prob = batch_elem / jnp.sum(batch_elem)
        detail = {
            "entropy": jnp.exp(-jnp.sum(k_prob * jnp.log(k_prob + 1e-8))),
            "used_curr": jnp.sum(batch_elem >= threshold).astype(jnp.float32),
            "usage": jnp.sum(usage),
            "diff_emb": jnp.linalg.norm(emb - old_emb)
                        / math.sqrt(K * D),
        }
        state = EmaVqState(state.initted, emb, emb_sum, emb_elem)
    else:
        detail = {}

    z_enc_elem = (z_q - z_flat) ** 2  # commitment only
    z_enc_loss = _reduce(z_enc_elem, reduction, B, T)
    z_qut_loss = jnp.zeros((), z.dtype)

    if legacy_no_ste and reduction != "none":
        # Reference bug reproduction: decoder sees the detached code vector, the
        # encoder learns only from the commitment loss (layers_vq.py:310-315).
        z_vq = z_q
    else:
        z_vq = z_flat + jax.lax.stop_gradient(z_q - z_flat)

    return (z_vq.reshape(B, T, D), z_qut_loss, z_enc_loss, state, detail)
