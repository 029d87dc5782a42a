"""Chunked region-property iteration over large label images (reference:
/root/reference/src/squidpy/experimental/utils/_labels.py:19-)."""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import numpy as np

from squidpy_tpu.ops.features import regionprops

__all__ = ["iter_chunked_regionprops"]


def iter_chunked_regionprops(
    labels: Any,
    properties: Sequence[str] = ("label", "area", "centroid"),
    chunk_size: int = 4096,
    intensity_image: Any | None = None,
) -> Iterator[dict[str, np.ndarray]]:
    """Yield per-chunk regionprops dicts without materializing the full array.

    Cells spanning chunk borders appear in multiple chunks with partial
    statistics — use :func:`squidpy_tpu.experimental.im.compute_cell_info_tiled`
    when exact merged centroids are needed.
    """
    h, w = labels.shape[-2], labels.shape[-1]
    for y0 in range(0, h, chunk_size):
        for x0 in range(0, w, chunk_size):
            chunk = np.asarray(labels[..., y0 : y0 + chunk_size, x0 : x0 + chunk_size]).squeeze()
            if chunk.max() == 0:
                continue
            intens = (
                np.asarray(intensity_image[..., y0 : y0 + chunk_size, x0 : x0 + chunk_size]).squeeze()
                if intensity_image is not None
                else None
            )
            res = regionprops(chunk, list(properties), intensity_image=intens)
            if "centroid-0" in res:
                res["centroid-0"] = res["centroid-0"] + y0
                res["centroid-1"] = res["centroid-1"] + x0
            yield res
