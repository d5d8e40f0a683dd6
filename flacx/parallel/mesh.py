"""Mesh / sharding helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def data_mesh(n_devices: int | None = None) -> Mesh:
    """1-D device mesh over the ``frames`` (data) axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("frames",))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (frame batch) axis across the mesh."""
    return NamedSharding(mesh, PartitionSpec("frames"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
