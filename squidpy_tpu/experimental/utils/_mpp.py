"""Microns-per-pixel derivation (reference:
/root/reference/src/squidpy/experimental/utils/_derive_mpp.py:22-)."""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = ["derive_mpp_from_shapes"]


def derive_mpp_from_shapes(
    shapes: Any,
    known_diameter_um: float = 55.0,
    radius_column: str = "radius",
) -> float:
    """Derive microns-per-pixel from spot shapes of known physical diameter.

    ``shapes`` is a DataFrame-like with a radius column (pixels), or an
    ``(n,)`` array of radii; Visium spots are 55 µm across by spec.
    """
    if hasattr(shapes, "columns"):
        if radius_column not in shapes.columns:
            raise KeyError(f"Column `{radius_column}` not found in shapes.")
        radii = np.asarray(shapes[radius_column], dtype=float)
    else:
        radii = np.asarray(shapes, dtype=float)
    radii = radii[np.isfinite(radii) & (radii > 0)]
    if not len(radii):
        raise ValueError("No positive radii found to derive mpp from.")
    diameter_px = 2.0 * float(np.median(radii))
    return known_diameter_um / diameter_px
