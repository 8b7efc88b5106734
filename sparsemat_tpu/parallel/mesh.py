"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROWS_AXIS = "rows"


def make_mesh(n_devices: int | None = None, axis_name: str = ROWS_AXIS) -> Mesh:
    """1-D device mesh over the row-partition axis (the successor of
    SparseMatPar's ``n_blocks``, reference src/sparsemat_par.rs:20-28).
    Uses all visible devices by default."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def row_sharding(mesh: Mesh, axis_name: str = ROWS_AXIS) -> NamedSharding:
    """Sharding for 1-D vectors partitioned by rows."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
