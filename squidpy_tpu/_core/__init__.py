from squidpy_tpu._core.anndata import AnnData, Raw, concat
from squidpy_tpu._core.graph import SpatialGraph, graph_from_adata
from squidpy_tpu._core.io_h5ad import read_h5ad, write_h5ad
from squidpy_tpu._core.rng import permutation_batch, shuffle_group_batch, spawn_keys
from squidpy_tpu._core.spatialdata import SpatialData

__all__ = [
    "AnnData",
    "Raw",
    "concat",
    "SpatialGraph",
    "SpatialData",
    "graph_from_adata",
    "read_h5ad",
    "write_h5ad",
    "spawn_keys",
    "permutation_batch",
    "shuffle_group_batch",
]
