"""Device mesh construction + multi-host initialization.

The reference has no in-framework distributed layer at all (SURVEY.md §2.4 —
cluster use is Kaldi job arrays, egs/*/cmd.sh). This module is the TPU-native
replacement: a named :class:`jax.sharding.Mesh` whose ``data`` axis carries
batch-dim parallelism over ICI, with a ``model`` axis reserved for tensor
parallelism (unused by the ~10-50M param model families, but the axes exist so
shardings compose).
"""

from __future__ import annotations

import numpy as np


def make_mesh(n_data=None, n_model=1, devices=None):
    """Named mesh over the visible devices: axes ('data', 'model')."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    if n_data is None:
        if len(devices) % n_model != 0:
            raise ValueError(
                f"{len(devices)} devices not divisible by n_model={n_model}"
                " — a silent truncation would idle the remainder")
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} != {len(devices)} devices")
    devices = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def data_mesh(devices=None):
    """1-axis data-parallel mesh (the default trainer layout)."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P())


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Multi-host bring-up over DCN: ``jax.distributed.initialize`` with
    TPU-pod auto-detection when no explicit coordinates are given. Call once
    per host before any jax op; then every host builds the same global mesh
    from ``jax.devices()``."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()
