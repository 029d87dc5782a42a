"""Experimental utilities (reference:
/root/reference/src/squidpy/experimental/utils/__init__.py — exports
``derive_mpp_from_shapes``; ``iter_chunked_regionprops`` /
``resolve_labels_array`` live in ``_labels.py`` there and are re-exported
here as public conveniences, plus the array-first ``derive_mpp``)."""

from squidpy_tpu.experimental.utils._labels import (
    ChunkRegion,
    iter_chunked_regionprops,
    resolve_labels_array,
)
from squidpy_tpu.experimental.utils._mpp import derive_mpp, derive_mpp_from_shapes

__all__ = [
    "ChunkRegion",
    "derive_mpp",
    "derive_mpp_from_shapes",
    "iter_chunked_regionprops",
    "resolve_labels_array",
]
