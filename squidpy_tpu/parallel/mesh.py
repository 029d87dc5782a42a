"""Device mesh construction.

The reference's "distributed backend" is dask.distributed + loky process pools
(SURVEY.md §2.2); the TPU-native equivalent is a single-controller jax mesh
whose axes shard the cell axis (graph statistics) and the gene axis
(autocorrelation), with ICI collectives inside ``shard_map``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["default_mesh", "cell_mesh"]


def default_mesh(n_devices: int | None = None, axis_name: str = "cells") -> Mesh:
    """1-D mesh over all (or the first ``n_devices``) local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def cell_mesh(n_devices: int | None = None) -> Mesh:
    """Mesh with the canonical cell-sharding axis name."""
    return default_mesh(n_devices, axis_name="cells")
