"""squidpy_tpu — TPU-native spatial single-cell omics analysis.

A ground-up rebuild of scverse/squidpy's capabilities on JAX/XLA/Pallas:
spatial neighbor graphs, graph statistics (permutation tests, spatial
autocorrelation, co-occurrence, Ripley curves, sepal, niches, ligrec),
microscopy image featurization, plotting, readers and datasets — with the
same AnnData-facing API and key conventions as the reference.
"""

from __future__ import annotations

from squidpy_tpu import datasets, experimental, gr, im, pl, read, tl, utils
from squidpy_tpu._core import AnnData, SpatialData, SpatialGraph, concat, read_h5ad
from squidpy_tpu.utils._warmup import warmup

__all__ = [
    "gr",
    "im",
    "pl",
    "tl",
    "read",
    "datasets",
    "experimental",
    "utils",
    "AnnData",
    "SpatialGraph",
    "SpatialData",
    "concat",
    "read_h5ad",
    "warmup",
    "__version__",
]

__version__ = "0.1.0"

# shared parameter documentation: appended to every public gr/im/tl/pl
# function at import (raises if a public parameter has no entry —
# utils/_docs.py)
from squidpy_tpu.utils._docs import inject_parameter_docs as _inject_docs

for _mod in (gr, im, tl, pl):
    _inject_docs(_mod)
del _inject_docs, _mod
