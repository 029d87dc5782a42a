"""The graph module (spatial neighbor graphs + graph statistics)."""

from __future__ import annotations

from squidpy_tpu.gr import neighbors
from squidpy_tpu.gr._build import (
    SpatialNeighborsResult,
    mask_graph,
    spatial_neighbors,
    spatial_neighbors_delaunay,
    spatial_neighbors_from_builder,
    spatial_neighbors_grid,
    spatial_neighbors_knn,
    spatial_neighbors_radius,
)
from squidpy_tpu.gr._nhood import (
    NhoodEnrichmentResult,
    centrality_scores,
    interaction_matrix,
    nhood_enrichment,
)
from squidpy_tpu.gr._ligrec import PermutationTest, PermutationTestABC, ligrec
from squidpy_tpu.gr._niche import calculate_niche
from squidpy_tpu.gr._ppatterns import co_occurrence, spatial_autocorr
from squidpy_tpu.gr._ripley import ripley
from squidpy_tpu.gr._sepal import sepal
from squidpy_tpu.gr.neighbors import GraphMatrixT

__all__ = [
    "GraphMatrixT",
    "SpatialNeighborsResult",
    "NhoodEnrichmentResult",
    "neighbors",
    "mask_graph",
    "spatial_neighbors",
    "spatial_neighbors_from_builder",
    "spatial_neighbors_knn",
    "spatial_neighbors_radius",
    "spatial_neighbors_delaunay",
    "spatial_neighbors_grid",
    "centrality_scores",
    "interaction_matrix",
    "nhood_enrichment",
    "co_occurrence",
    "spatial_autocorr",
    "ligrec",
    "PermutationTest",
    "PermutationTestABC",
    "ripley",
    "sepal",
    "calculate_niche",
]
