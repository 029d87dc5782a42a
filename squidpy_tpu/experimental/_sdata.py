"""Duck-typed SpatialData resolution for the experimental API.

The reference's experimental functions are SpatialData-native — they take
``(sdata, image_key, *, scale=..., inplace=...)`` and read/write
``sdata.images`` / ``sdata.labels`` / ``sdata.shapes`` / ``sdata.tables``
(e.g. /root/reference/src/squidpy/experimental/im/_detect_tissue.py:208-226).
This build is array-first, but every experimental entry point also accepts a
SpatialData-LIKE object (anything exposing those four mappings — including a
real ``spatialdata.SpatialData`` when installed) through the helpers here,
so reference call sites work unchanged.

Multiscale elements are duck-typed as mappings ``{scale_name: array}`` (the
stand-in for the reference's xarray DataTree); ``scale="auto"`` picks the
smallest level, ``"full"``/``"scale0"`` the largest.
"""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = [
    "is_sdata",
    "resolve_element",
    "resolve_scale",
    "store_labels",
    "store_table",
]


def is_sdata(obj: Any) -> bool:
    """True for SpatialData-like objects (duck-typed on the element trees)."""
    return hasattr(obj, "images") and hasattr(obj, "tables") and not hasattr(obj, "shape")


def _npixels(arr: Any) -> int:
    shape = getattr(arr, "shape", None)
    if shape is None:
        return 0
    return int(np.prod([s for s in shape[:2]])) if len(shape) >= 2 else int(np.prod(shape))


def resolve_scale(node: Any, scale: str = "auto") -> Any:
    """Pick one scale level from a (possibly multiscale) element.

    ``node`` is either an array-like or a mapping ``{scale_name: array}``.
    ``scale``: a concrete level name, ``"auto"`` (smallest level — the
    reference's processing default for tissue detection), or ``"full"`` /
    ``"scale0"`` (largest level).
    """
    if not hasattr(node, "keys") or hasattr(node, "shape"):
        return node  # plain array (or array-like with .keys such as h5py is excluded by shape)
    levels = dict(node)
    if not levels:
        raise ValueError("Multiscale element has no levels.")
    if scale in levels:
        return levels[scale]
    ordered = sorted(levels.values(), key=_npixels)
    if scale == "auto":
        return ordered[0]
    if scale in ("full", "scale0"):
        return ordered[-1]
    raise KeyError(f"Scale `{scale}` not found. Available: {sorted(levels)} (or 'auto'/'full').")


def resolve_element(
    source: Any,
    key: str | None,
    *,
    tree: str = "images",
    scale: str = "full",
    what: str = "image",
) -> Any:
    """Resolve an element from a SpatialData-like ``source``, or pass an
    array through untouched."""
    if not is_sdata(source):
        if key is not None:
            # a key with a plain-array source almost always means a
            # positional argument bound into the key slot (e.g.
            # detect_tissue(img, "kmeans")) — fail loudly instead of
            # silently ignoring the key
            raise TypeError(
                f"`{what}_key`={key!r} was given, but the input is a plain array, "
                f"not a SpatialData-like object — keys select from sdata.{tree}. "
                "Pass the array alone, or pass an sdata."
            )
        return source
    mapping = getattr(source, tree, None)
    if mapping is None:
        raise ValueError(f"SpatialData-like object has no `.{tree}`.")
    if key is None:
        if len(mapping) == 1:
            key = next(iter(mapping))
        else:
            raise ValueError(
                f"Pass `{what}_key` to select from sdata.{tree} (found {sorted(mapping)})."
            )
    if key not in mapping:
        raise KeyError(f"`{key}` not found in sdata.{tree}. Available: {sorted(mapping)}.")
    return resolve_scale(mapping[key], scale)


def store_labels(sdata: Any, key: str, labels: np.ndarray) -> None:
    if hasattr(sdata, "labels"):
        sdata.labels[key] = labels


def store_table(sdata: Any, key: str, table: Any) -> None:
    if hasattr(sdata, "tables"):
        sdata.tables[key] = table
