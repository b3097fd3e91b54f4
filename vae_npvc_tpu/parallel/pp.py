"""Pipeline parallelism: GPipe-style ring schedule over homogeneous blocks.

The reference has no model parallelism of any kind (SURVEY.md §2.4 — single
GPU, Kaldi job arrays). This module adds the TPU-native pipeline axis for
the one place the architecture is pipeline-shaped: the flagship decoder is a
stack of IDENTICAL speaker-conditioned GLU res-skip blocks
(models/vqvae.py:206-213 — ``stacks: [10]`` at width 512 in the shipped
VCC2020 YAML), so its parameters stack into one ``(L, ...)`` pytree that
shards contiguously over a ``pipe`` mesh axis (k = L/P layers per stage).

Schedule (classic GPipe, SPMD form):

- one ``shard_map`` over the ``pipe`` axis; every device runs the same
  program and owns its stage's k layers (the only sharded operand);
- ``M + P - 1`` ticks: at tick ``t`` device ``d`` processes microbatch
  ``t - d`` (stage 0 reads fresh input, others take the neighbor's
  activation that arrived via ``lax.ppermute`` on the previous tick);
- the last stage scatters finished microbatches into the output buffer;
  a final masked ``psum`` replicates the result to every device.

Everything is static-shaped and differentiable (``ppermute`` /
``dynamic_update_slice`` / ``where`` all have transpose rules), so
``jax.grad`` through :func:`pipeline_stack` yields per-stage parameter
gradients that stay sharded over the ``pipe`` axis — the training-time
layout. Bubble fraction is the usual (P-1)/(M+P-1); pick M ≥ P.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P_

AXIS = "pipe"


def stack_layer_params(params, names):
    """Stack per-layer param trees ``params[name]`` into one ``(L, ...)`` tree.

    The layers must be architecturally identical (equal leaf shapes) — true
    for the flat decoder stack when ``dilation: false`` (the shipped flagship
    config; dilated stacks differ per layer and cannot stack).
    """
    trees = [params[n] for n in names]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _tree_index(tree, i):
    return jax.tree.map(
        lambda x: lax.dynamic_index_in_dim(x, i, 0, keepdims=False), tree)


def _tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def pipeline_stack(block_apply, stacked_params, inputs, mesh, axis=AXIS):
    """Run ``L`` stacked layers over ``mesh[axis]`` as a GPipe pipeline.

    Parameters
    ----------
    block_apply : (layer_params, carry) -> carry
        One layer. Pure, pytree-shape-preserving (e.g. the GLU res-skip
        block threading ``(h, skip_sum, cond)``).
    stacked_params : pytree with ``(L, ...)`` leaves
        All layers' params; sharded ``P(axis)`` on the leading dim (device
        ``d`` holds layers ``[d*k, (d+1)*k)`` — GSPMD shards contiguously).
    inputs : pytree with ``(M, ...)`` leaves
        M microbatches (replicated on every device).
    Returns the outputs pytree with ``(M, ...)`` leaves, replicated.
    """
    from jax import shard_map

    n_stages = mesh.shape[axis]
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    M = jax.tree.leaves(inputs)[0].shape[0]
    assert L % n_stages == 0, f"layers {L} not divisible by stages {n_stages}"

    def per_device(p_local, inp):
        d = lax.axis_index(axis)
        zero_mb = jax.tree.map(lambda x: jnp.zeros_like(x[0]), inp)
        out0 = jax.tree.map(jnp.zeros_like, inp)

        def stage(carry):
            def body(c, pl):
                return block_apply(pl, c), None
            out, _ = lax.scan(body, carry, p_local)  # my k layers, in order
            return out

        def tick(state, t):
            carry_in, out_acc = state
            fresh = _tree_index(inp, jnp.clip(t, 0, M - 1))
            y = stage(_tree_where(d == 0, fresh, carry_in))
            # last stage commits microbatch t-d once it's genuinely finished
            mb = t - d
            write = (d == n_stages - 1) & (mb >= 0) & (mb < M)
            idx = jnp.clip(mb, 0, M - 1)
            out_acc = jax.tree.map(
                lambda acc, v: jnp.where(
                    write, lax.dynamic_update_index_in_dim(acc, v, idx, 0),
                    acc),
                out_acc, y)
            carry_next = jax.tree.map(
                lambda x: lax.ppermute(
                    x, axis,
                    [(i, (i + 1) % n_stages) for i in range(n_stages)]), y)
            return (carry_next, out_acc), None

        (_, out_acc), _ = lax.scan(tick, (zero_mb, out0),
                                   jnp.arange(M + n_stages - 1))
        # replicate the last stage's buffer to everyone
        return jax.tree.map(
            lambda x: lax.psum(
                jnp.where(d == n_stages - 1, x, jnp.zeros_like(x)), axis),
            out_acc)

    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(P_(axis), P_()), out_specs=P_(),
                   check_vma=False)
    return fn(stacked_params, inputs)


# ---------------------------------------------------------------------------
# model integration: the flat decoder's GLU res-skip stack
# ---------------------------------------------------------------------------

def decoder_stack_names(arch):
    """Layer names of the (single-scale, undilated) decoder stack."""
    stacks = arch.get("stacks", [3])
    assert len(stacks) == 1, "pipeline split supports single-scale decoders"
    assert not arch.get("dilation", True), (
        "dilated stacks have per-layer architectures and cannot stack; "
        "the shipped flagship config uses dilation: false")
    return [f"stack_0_{j}" for j in range(stacks[0])]


def pipeline_decoder_stack(config, decoder_params, h, cond, mesh,
                           axis=AXIS, microbatches=None):
    """Run the flat model's decoder res-skip stack pipelined over ``axis``.

    ``decoder_params``: the ``params['decoder']`` subtree of a trained state.
    ``h``: (B, T, width) activations entering the stack (after ``up_0``);
    ``cond``: (B, 1, cond_ch) speaker condition. Returns ``(h, skip_sum)``
    exactly equal to the sequential stack (tests/test_pp.py).
    """
    from ..nn.blocks import GLUResSkip

    arch = dict(config["decoder"])
    names = decoder_stack_names(arch)
    stacked = stack_layer_params(decoder_params, names)
    blk = GLUResSkip(arch["out_channels"][0], arch.get("cond_channels", 128),
                     arch.get("skip_channels", 80),
                     arch.get("stack_kernel_size", 3), dilation=1,
                     use_weight_norm=arch.get("use_weight_norm", True))

    def block_apply(p, carry):
        hh, skip, c = carry
        h2, s = blk.apply({"params": p}, hh, c)
        return (h2, skip + s, c)

    M = microbatches or mesh.shape[axis]
    B = h.shape[0]
    assert B % M == 0, f"batch {B} not divisible by {M} microbatches"
    split = lambda x: x.reshape((M, B // M) + x.shape[1:])
    inputs = (split(h), split(jnp.zeros(h.shape[:2] +
                                        (arch.get("skip_channels", 80),),
                                        h.dtype)), split(cond))
    h_out, skip, _ = pipeline_stack(block_apply, stacked, inputs, mesh, axis)
    join = lambda x: x.reshape((B,) + x.shape[2:])
    return join(h_out), join(skip)
