"""Sequence-parallel inference: one long utterance across the whole mesh.

The reference caps training sequences at 256 frames and runs full-length
inference on a single device (SURVEY.md §5). Here a long utterance's time axis
is sharded over the mesh: every conv pulls its receptive-field halo from the
neighbor chips (ppermute over ICI) and every GroupNorm psums its statistics,
so the output equals the single-device computation exactly (tested on the
virtual mesh) while the FLOPs and memory scale 1/n per chip.

Usage:
    out = sequence_parallel_infer(config, variables, x, y_idx, mesh)

Supports stride-1 (flat) model configs; ``x`` (1, T, D) with T divisible by
the mesh's data-axis size.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

AXIS = "data"


def sequence_parallel_infer(config, variables, x, y_idx, mesh,
                            axis_name=AXIS):
    """Time-sharded ``model.infer`` over ``mesh``'s ``axis_name`` axis."""
    from jax import shard_map

    from ..models import build_model

    n = mesh.shape[axis_name]
    assert x.shape[1] % n == 0, (
        f"sequence length {x.shape[1]} must divide the {axis_name} axis "
        f"size {n} (pad the utterance)")
    model = build_model({**dict(config), "seq_axis": axis_name})

    def local_infer(x_shard, y_idx):
        return model.apply(variables, x_shard, y_idx, method="infer")

    fn = shard_map(local_infer, mesh=mesh,
                   in_specs=(P(None, axis_name, None), P()),
                   out_specs=P(None, axis_name, None),
                   check_vma=False)
    return jax.jit(fn)(x, y_idx)
