"""Device mesh and sharding layout.

The reference's distribution fabric — mpi4py gather/scatter per step
(``ppo_stage1.py:66-75``) plus ROS TCPROS for env I/O — is replaced wholesale
by a ``jax.sharding.Mesh`` with a single ``data`` axis: arenas shard over
devices (ICI within a slice, DCN across hosts via ``jax.distributed``), policy
parameters stay replicated, and XLA inserts the gradient ``psum`` and any
batch regathers automatically from the sharding annotations.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def arena_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (arena) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_arenas(tree, mesh: Mesh):
    s = arena_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(tree, mesh: Mesh):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def setup_distributed(coordinator: str | None = None, num_processes: int | None = None,
                      process_id: int | None = None):
    """Multi-host init (no-op single host).  Arenas then shard over all chips
    of the slice; gradients reduce over ICI+DCN."""
    if coordinator is not None:
        jax.distributed.initialize(coordinator, num_processes, process_id)
