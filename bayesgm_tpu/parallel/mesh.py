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


def rowwise_shard_map(fn, mesh: Mesh, n_row_args: int, axis_name: str = "data",
                      seed_arg: Optional[int] = None,
                      pad_multiple: int = 1):
    """Run a row-separable function per-shard under ``jax.shard_map``.

    ``fn(*args)``'s first ``n_row_args`` arguments carry a leading row axis
    that is sharded over ``mesh``; the remaining arguments (and any pytrees)
    are replicated.  Outputs must all carry the row axis.  Rows are padded to
    a multiple of ``mesh_size * pad_multiple`` before the call and sliced
    back after, so any row count works.

    This is how fused Pallas kernels keep running on multi-chip meshes: GSPMD
    cannot partition an opaque ``pallas_call``, but inside ``shard_map`` each
    device executes the kernel on its local rows — the targets are
    row-separable by construction, so per-shard evaluation is exact.

    ``seed_arg`` names an ``int32[2]`` argument (kernel PRNG seed); the shard
    index is mixed into its second word so every shard draws an independent
    noise stream (blocks within a shard already decorrelate via
    ``program_id``).
    """
    from jax import numpy as jnp

    n_shards = mesh.shape[axis_name]
    chunk = n_shards * max(1, pad_multiple)

    def wrapped(*args):
        row_args = args[:n_row_args]
        rest = args[n_row_args:]
        n = row_args[0].shape[0]
        n_pad = -(-n // chunk) * chunk
        if n_pad != n:
            row_args = tuple(
                jnp.pad(a, ((0, n_pad - n),) + ((0, 0),) * (a.ndim - 1))
                for a in row_args)

        def local(*largs):
            if seed_arg is not None:
                largs = list(largs)
                largs[seed_arg] = largs[seed_arg].at[1].add(
                    jax.lax.axis_index(axis_name))
                largs = tuple(largs)
            return fn(*largs)

        in_specs = tuple(P(axis_name) for _ in row_args) + tuple(
            P() for _ in rest)
        # check_vma=False: the varying-mesh-axes checker cannot see through
        # an opaque pallas_call's out_shape and rejects it.
        out = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                            out_specs=P(axis_name),
                            check_vma=False)(*row_args, *rest)
        if n_pad != n:
            out = jax.tree.map(lambda o: o[:n], out)
        return out

    return wrapped


def replicated_shard_map(fn, mesh: Mesh):
    """Run ``fn`` identically on every device under ``jax.shard_map``.

    All inputs are replicated and the (identical) per-device outputs are
    returned replicated.  Used for small fused kernels inside mesh-jitted
    programs (e.g. the per-minibatch latent update, ~32 rows): redundant
    replicated compute avoids both GSPMD's inability to partition a
    ``pallas_call`` and any cross-device traffic.  ``fn`` must be
    deterministic in its inputs (in-kernel PRNG seeded from a replicated
    seed is deterministic, so the replication invariant holds).
    """

    def wrapped(*args):
        in_specs = tuple(P() for _ in args)
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=P(), check_vma=False)(*args)

    return wrapped
