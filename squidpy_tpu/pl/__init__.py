"""The plotting module."""

from squidpy_tpu.pl._graph import (
    centrality_scores,
    co_occurrence,
    interaction_matrix,
    nhood_enrichment,
    ripley,
)
from squidpy_tpu.pl._ligrec import ligrec
from squidpy_tpu.pl._spatial import spatial_scatter, spatial_segment
from squidpy_tpu.pl._utils import extract
from squidpy_tpu.pl._var_by_distance import var_by_distance

__all__ = [
    "spatial_scatter",
    "spatial_segment",
    "nhood_enrichment",
    "centrality_scores",
    "interaction_matrix",
    "ligrec",
    "ripley",
    "co_occurrence",
    "extract",
    "var_by_distance",
]
