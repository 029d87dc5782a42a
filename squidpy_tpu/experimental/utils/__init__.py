"""Experimental utilities."""

from squidpy_tpu.experimental.utils._labels import iter_chunked_regionprops
from squidpy_tpu.experimental.utils._mpp import derive_mpp, derive_mpp_from_shapes

__all__ = ["derive_mpp", "derive_mpp_from_shapes", "iter_chunked_regionprops"]
