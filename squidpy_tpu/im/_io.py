"""Image file probing and lazy loading.

Functional counterpart of /root/reference/src/squidpy/im/_io.py:28-251:
header-only shape/dtype probing, dimension inference to the canonical
``(y, x, z, channels)`` layout, and lazy whole-file loading (the reference
wraps a delayed read in a dask array; here a zero-copy callable/memmap-backed
``LazyImage`` defers the pixel read until sliced).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Union

import numpy as np

from squidpy_tpu._constants._constants import InferDimensions
from squidpy_tpu.utils import NDArrayA

__all__ = ["LazyImage", "_infer_shape_dtype", "_infer_dimensions", "_lazy_load_image"]

Pathlike_t = Union[str, Path]


def _infer_shape_dtype(path: Pathlike_t) -> tuple[tuple[int, ...], np.dtype]:
    """Probe an image file's shape and dtype from its header (no pixel read)."""
    from PIL import Image

    Image.MAX_IMAGE_PIXELS = None
    with Image.open(str(path)) as img:
        w, h = img.size
        n_frames = getattr(img, "n_frames", 1)
        bands = len(img.getbands())
        mode_dtypes = {"1": np.bool_, "L": np.uint8, "P": np.uint8, "RGB": np.uint8,
                       "RGBA": np.uint8, "I": np.int32, "I;16": np.uint16, "F": np.float32}
        dtype = np.dtype(mode_dtypes.get(img.mode, np.uint8))
    if n_frames > 1:
        return (n_frames, h, w) + ((bands,) if bands > 1 else ()), dtype
    return (h, w) + ((bands,) if bands > 1 else ()), dtype


def _infer_dimensions(
    shape: tuple[int, ...],
    infer_dimensions: str | InferDimensions = InferDimensions.DEFAULT,
) -> tuple[int, ...]:
    """Map an arbitrary 2-4D shape onto the canonical (y, x, z, channels) axes.

    Returns the permutation of input axes (with -1 marking inserted singleton
    axes), following the reference's heuristics (im/_io.py:101-180): smallest
    trailing dims are channels, `z_last`/`channels_last` force the ambiguous
    axis.
    """
    infer_dimensions = InferDimensions(infer_dimensions)
    ndim = len(shape)
    if ndim == 2:
        return (0, 1, -1, -1)  # (y, x) -> (y, x, 1, 1)
    if ndim == 3:
        # one extra axis: channels or z; smallest axis is the candidate
        extra = int(np.argmin(shape))
        spatial = [i for i in range(3) if i != extra]
        if infer_dimensions == InferDimensions.Z_LAST:
            return (spatial[0], spatial[1], extra, -1)
        return (spatial[0], spatial[1], -1, extra)
    if ndim == 4:
        order = np.argsort(shape)
        small1, small2 = int(order[0]), int(order[1])
        spatial = [i for i in range(4) if i not in (small1, small2)]
        # of the two small axes, the earlier is z and the later channels
        z, c = sorted((small1, small2))
        if infer_dimensions == InferDimensions.Z_LAST:
            z, c = c, z
        return (spatial[0], spatial[1], z, c)
    raise ValueError(f"Expected image with 2-4 dimensions, found `{ndim}`.")


class LazyImage:
    """Defers the pixel read until first access; slices read-through."""

    def __init__(self, path: Pathlike_t):
        self._path = str(path)
        self.shape, self.dtype = _infer_shape_dtype(path)
        self._data: NDArrayA | None = None

    def _load(self) -> NDArrayA:
        if self._data is None:
            from squidpy_tpu.im._container import _open_image_file

            self._data = _open_image_file(self._path)
        return self._data

    def __getitem__(self, item: Any) -> NDArrayA:
        return self._load()[item]

    def __array__(self, dtype: Any = None) -> NDArrayA:
        arr = self._load()
        return arr.astype(dtype) if dtype is not None else arr

    @property
    def ndim(self) -> int:
        return len(self.shape)


def _lazy_load_image(path: Pathlike_t, infer_dimensions: str = "default") -> LazyImage:
    """Lazily open an image file (pixel data is read on first slice)."""
    return LazyImage(path)
