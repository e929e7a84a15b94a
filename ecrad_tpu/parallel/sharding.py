"""Column sharding over the device mesh.

The radiation problem is embarrassingly parallel over columns
(SURVEY §2.8: the reference's OpenMP block loop / MPI table broadcast).
TPU-native equivalent: one 1-D mesh axis 'columns'; every per-column
array is sharded on its leading axis, coefficient tables replicate as
jit constants. No collectives are needed in compute — only at I/O.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def column_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), axis_names=("columns",))


def shard_columns(pytrees, mesh: Optional[Mesh] = None):
    """Place every array in the pytree with its leading (column) axis
    sharded over the mesh. Scalars/0-d leaves are replicated."""
    mesh = mesh or column_mesh()
    ndev = mesh.devices.size

    def place(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        if x.shape[0] % ndev != 0:
            # pad-free fallback: replicate awkward remainders
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, NamedSharding(mesh, P("columns")))

    return jax.tree.map(place, pytrees)
