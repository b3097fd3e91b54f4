"""Model-axis parameter sharding (tensor / fully-sharded parallelism).

The reference has no parallelism at all (SURVEY.md §2.4); the model families
here are 10-50M params, so *required* parallelism is data-only. This module is
the scaling story for the ``model`` mesh axis anyway: parameters (and their
optimizer moments) are sharded over ``model`` and XLA's GSPMD partitioner
inserts the all-gathers/reduce-scatters — channel-sharded convolutions where
propagation keeps the compute distributed, weight-gathered (FSDP-style)
otherwise. The math is identical to the replicated run; tests pin the train
step numerics against the data-parallel-only trainer
(tests/test_parallel.py::TestTensorParallel).

Rules are shape-generic so every registered model family works unchanged:
a parameter is sharded along its largest dimension divisible by the model-axis
size (ties → the trailing-most dim, which for the flax Conv kernels
``(k, in, out)`` is the output-channel dim — the Megatron-style column split);
small or indivisible parameters stay replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"


def param_spec(shape, n_model: int, min_size: int = 1024) -> P:
    """PartitionSpec for one parameter under the shape-generic rule."""
    if n_model <= 1 or int(np.prod(shape)) < min_size:
        return P()
    best = None
    for d, extent in enumerate(shape):
        if extent % n_model == 0 and extent >= n_model:
            if best is None or extent >= shape[best]:
                best = d  # >= keeps the trailing-most maximal dim
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = MODEL_AXIS
    return P(*spec)


def param_partition_specs(params, mesh: Mesh, min_size: int = 1024):
    """Pytree of PartitionSpec matching ``params``."""
    n_model = dict(mesh.shape).get(MODEL_AXIS, 1)
    return jax.tree_util.tree_map(
        lambda p: param_spec(np.shape(p), n_model, min_size), params)


def shard_params(params, mesh: Mesh, min_size: int = 1024):
    """Place ``params`` on the mesh under the partition rule."""
    specs = param_partition_specs(params, mesh, min_size)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)


def constrain_params(params, mesh: Mesh, min_size: int = 1024):
    """`with_sharding_constraint` the rule inside a jitted step (pins the
    steady-state layout so the donated train loop doesn't oscillate between
    propagation choices)."""
    specs = param_partition_specs(params, mesh, min_size)
    return jax.tree_util.tree_map(
        lambda p, s: jax.lax.with_sharding_constraint(
            p, NamedSharding(mesh, s)), params, specs)
