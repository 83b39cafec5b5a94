"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh({n_devices}) but only {len(devices)} device(s) visible; "
                "set XLA_FLAGS=--xla_force_host_platform_device_count=N and force the "
                "cpu platform (jax.config.update('jax_platforms', 'cpu')) to emulate.")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, ndim: int = 2, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 over the mesh, replicate remaining axes."""
    spec = P(axis_name, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_rows(arr, mesh: Mesh, axis_name: str = "data"):
    """Place an (n, ...) array with axis 0 sharded over the mesh.

    ``n`` must divide evenly by the mesh size for best layout; uneven sizes
    still work (XLA pads internally).
    """
    arr = jax.numpy.asarray(arr)
    return jax.device_put(arr, data_sharding(mesh, arr.ndim, axis_name))
