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


def shard_columns(pytrees, mesh: Optional[Mesh] = None,
                  local_columns: Optional[int] = None):
    """Place every array in the pytree with its leading (column) axis
    sharded over the mesh. Scalars/0-d leaves are replicated.

    When the mesh spans multiple processes (multi-host analogue of the
    reference's MPI ranks, ifs/easy_netcdf_read_mpi.F90), each process
    holds only its own column slice of the input; leaves whose leading
    dim equals `local_columns` are assembled into global arrays from the
    per-process shards, everything else is treated as replicated."""
    mesh = mesh or column_mesh()
    ndev = mesh.devices.size
    multiproc = len({d.process_index for d in mesh.devices.flat}) > 1

    if multiproc:
        col_sharding = NamedSharding(mesh, P("columns"))
        rep_sharding = NamedSharding(mesh, P())

        def place_mp(x):
            if not hasattr(x, "ndim") or x.ndim == 0:
                return x
            x = np.asarray(x)
            if local_columns is not None and x.shape[0] == local_columns:
                return jax.make_array_from_process_local_data(
                    col_sharding, x)
            return jax.make_array_from_process_local_data(rep_sharding, x)

        return jax.tree.map(place_mp, pytrees)

    def place(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        if x.shape[0] % ndev != 0:
            # pad-free fallback: replicate awkward remainders
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, NamedSharding(mesh, P("columns")))

    return jax.tree.map(place, pytrees)
