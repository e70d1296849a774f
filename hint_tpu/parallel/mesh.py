"""Device mesh + sharding helpers.

The reference is single-GPU (SURVEY.md §2.4: no distributed machinery of any
kind); the one meaningful distribution axis for this workload is the batch.
Models are ≤4M params, so they stay replicated and gradients all-reduce over
ICI — XLA inserts the collective when the train step is jitted with a
batch-sharded input and replicated params/outputs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def mesh_size(mesh: Mesh, axis: str = "data") -> int:
    return mesh.shape[axis]


def pad_rows(arr: jax.Array, multiple: int, value: float = 0.0):
    """Pad axis 0 up to a multiple (batch-sharded dims must divide the mesh
    axis size). Returns (padded, original_n)."""
    n = arr.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return arr, n
    import jax.numpy as jnp

    filler = jnp.full((pad,) + arr.shape[1:], value, arr.dtype)
    return jnp.concatenate([arr, filler], axis=0), n


def shard_batch(arr, mesh: Mesh, axis: str = "data"):
    """device_put with the batch sharding (axis 0 over the mesh axis)."""
    return jax.device_put(arr, batch_sharding(mesh, axis))
