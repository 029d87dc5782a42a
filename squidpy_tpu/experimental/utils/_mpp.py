"""Microns-per-pixel derivation (reference:
/root/reference/src/squidpy/experimental/utils/_derive_mpp.py:22-199).

Duck-typed rebuild: instead of a SpatialData shapes element the inputs are
plain arrays — ``(n, 2)`` centroids (Point geometries, with optional radii) or
a sequence of ``(k, 2)`` polygon vertex arrays — plus an optional affine to
the target pixel frame. geopandas/shapely are replaced by a shoelace area, a
convex-hull rotating-calipers minimum rectangle, and a cKDTree pitch query.
"""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = ["derive_mpp", "derive_mpp_from_shapes"]

_ANISOTROPY_TOL = 1e-3
_PITCH_MAX_SAMPLES = 5000
_SQUARENESS_SAMPLE = 10
_SQUARENESS_TOL = 0.98


def _as_affine(transform: Any) -> tuple[np.ndarray, np.ndarray]:
    """Normalize None / 2x2 / 2x3 / 3x3 into (A, t)."""
    if transform is None:
        return np.eye(2), np.zeros(2)
    m = np.asarray(transform, dtype=float)
    if m.shape == (2, 2):
        return m, np.zeros(2)
    if m.shape == (2, 3):
        return m[:, :2], m[:, 2]
    if m.shape == (3, 3):
        return m[:2, :2], m[:2, 2]
    raise ValueError(f"transform must be 2x2, 2x3 or 3x3, got shape {m.shape}.")


def _assert_similarity(A: np.ndarray, physical: float) -> float:
    """Raise on anisotropic transforms; return the uniform scale."""
    sv = np.linalg.svd(A, compute_uv=False)
    s1, s2 = float(sv[0]), float(sv[1])
    if abs(s1 - s2) / max(s1, s2, 1e-300) > _ANISOTROPY_TOL:
        raise ValueError(
            f"Transform is anisotropic (singular values {s1:.6g}, {s2:.6g}); a single scalar "
            f"microns-per-pixel is not well-defined (per-axis values would be "
            f"{physical / s1:.6g} and {physical / s2:.6g})."
        )
    return float(np.sqrt(abs(np.linalg.det(A))))


def _polygon_area(poly: np.ndarray) -> float:
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


def _min_rotated_rect_area(poly: np.ndarray) -> float:
    """Minimum-area enclosing rectangle via rotating calipers on the hull."""
    from scipy.spatial import ConvexHull

    pts = np.asarray(poly, dtype=float)
    if len(pts) < 3:
        return 0.0
    hull = pts[ConvexHull(pts).vertices]
    edges = np.diff(np.vstack([hull, hull[:1]]), axis=0)
    angles = np.unique(np.mod(np.arctan2(edges[:, 1], edges[:, 0]), np.pi / 2))
    best = np.inf
    for a in angles:
        c, s = np.cos(a), np.sin(a)
        rot = hull @ np.array([[c, -s], [s, c]])
        ext = rot.max(axis=0) - rot.min(axis=0)
        best = min(best, float(ext[0] * ext[1]))
    return best


def _is_polygon_input(shapes: Any) -> bool:
    if isinstance(shapes, np.ndarray):
        return False
    try:
        first = shapes[0]
    except (TypeError, KeyError, IndexError):
        return False
    first = np.asarray(first)
    return first.ndim == 2 and first.shape[-1] == 2


def derive_mpp(
    shapes: Any,
    *,
    um_between_centers: float | None = None,
    um_diameter: float | None = None,
    um_square_edge: float | None = None,
    radii: Any | None = None,
    transform: Any | None = None,
) -> float:
    """Derive microns-per-pixel from shapes with a known physical scale.

    ``shapes`` is either an ``(n, 2)`` array of point centroids or a sequence
    of ``(k, 2)`` polygon vertex arrays. Exactly one physical input must be
    given (reference semantics, _derive_mpp.py:22-150):

    - ``um_between_centers``: canonical center-to-center pitch (Visium v1:
      100, Visium HD: the bin size) — any geometry, median nearest-neighbor
      distance over up to 5000 sampled centroids;
    - ``um_diameter``: circular-spot diameter (Visium v1: 55) — points only,
      needs ``radii``;
    - ``um_square_edge``: square-bin edge length — polygons only; a sample is
      checked for squareness (area / min-rotated-rectangle ≥ 0.98) and
      non-rectangular polygons are rejected.

    ``transform`` (2x2, 2x3, or 3x3 affine into the target pixel frame) must
    be a similarity; anisotropic transforms raise ``ValueError``.
    """
    n_given = sum(x is not None for x in (um_between_centers, um_diameter, um_square_edge))
    if n_given != 1:
        raise ValueError("Provide exactly one of `um_between_centers`, `um_diameter`, or `um_square_edge`.")
    physical = next(x for x in (um_between_centers, um_diameter, um_square_edge) if x is not None)

    A, t = _as_affine(transform)
    scale = _assert_similarity(A, float(physical))

    polygonal = _is_polygon_input(shapes)
    if polygonal:
        polys = [np.asarray(p, dtype=float) for p in shapes]
        if not polys:
            raise ValueError("Shapes input is empty; cannot derive mpp.")
        centroids = np.stack([p.mean(axis=0) for p in polys])
    else:
        centroids = np.asarray(shapes, dtype=float)
        if centroids.ndim != 2 or centroids.shape[-1] not in (2, 3):
            raise ValueError(f"Expected (n, 2) centroids or polygon list, got shape {centroids.shape}.")
        if centroids.shape[-1] == 3:
            raise ValueError("3D shapes are not supported; only 2D shapes.")
        if not len(centroids):
            raise ValueError("Shapes input is empty; cannot derive mpp.")

    if um_between_centers is not None:
        n = len(centroids)
        if n < 2:
            raise ValueError(
                "Pitch is undefined for a single shape; pass `um_diameter` or `um_square_edge` instead."
            )
        from scipy.spatial import cKDTree

        xy = centroids @ A.T + t
        query = xy
        if n > _PITCH_MAX_SAMPLES:
            rng = np.random.default_rng(0)
            query = xy[rng.choice(n, size=_PITCH_MAX_SAMPLES, replace=False)]
        nn = cKDTree(xy).query(query, k=2)[0][:, 1]
        return um_between_centers / float(np.median(nn))

    if um_diameter is not None:
        if polygonal:
            raise ValueError(
                "`um_diameter` requires point shapes with radii; for square/rectangular "
                "polygons use `um_square_edge`."
            )
        if radii is None:
            raise ValueError("Point shapes need `radii` for diameter-based mpp.")
        r = np.asarray(radii, dtype=float)
        r = r[np.isfinite(r) & (r > 0)]
        if not len(r):
            raise ValueError("No positive radii found to derive mpp from.")
        return um_diameter / (float(np.median(2.0 * r)) * scale)

    if not polygonal:
        raise ValueError("`um_square_edge` requires polygon shapes; for circular spots use `um_diameter`.")
    rng = np.random.default_rng(0)
    sample_idx = rng.choice(len(polys), size=min(_SQUARENESS_SAMPLE, len(polys)), replace=False)
    areas = np.array([_polygon_area(p) for p in polys])
    for i in sample_idx:
        mrr = _min_rotated_rect_area(polys[i])
        if mrr <= 0 or areas[i] / mrr < _SQUARENESS_TOL:
            raise ValueError(
                "`um_square_edge` requires square/rectangular polygons; found a polygon with "
                f"area / minimum-rotated-rectangle ratio {areas[i] / max(mrr, 1e-300):.4f} < "
                f"{_SQUARENESS_TOL}. For non-rectangular geometries use `um_between_centers`."
            )
    det = abs(float(np.linalg.det(A)))
    edge_target = float(np.sqrt(np.median(areas) * det))
    return um_square_edge / edge_target


def _shapes_element_geometry(elem: Any, radius_column: str = "radius") -> tuple[Any, np.ndarray | None]:
    """Extract ``(shapes, radii)`` for :func:`derive_mpp` from a shapes
    element: a DataFrame with ``x``/``y`` (+ optional radius) columns, a
    column of polygon vertex arrays, or raw arrays."""
    if hasattr(elem, "columns"):
        cols = set(elem.columns)
        if "geometry" in cols:
            geoms = list(elem["geometry"])
            if geoms and hasattr(geoms[0], "exterior"):  # shapely-like
                polys = [np.asarray(g.exterior.coords)[:-1] for g in geoms]
            else:
                polys = [np.asarray(g, dtype=float) for g in geoms]
            return polys, None
        if {"x", "y"} <= cols:
            pts = np.column_stack([np.asarray(elem["x"], float), np.asarray(elem["y"], float)])
            radii = np.asarray(elem[radius_column], float) if radius_column in cols else None
            return pts, radii
        raise ValueError(
            f"Cannot extract geometry from shapes element with columns {sorted(cols)}; "
            "need `x`/`y` (points) or `geometry` (polygons)."
        )
    return elem, None


def _element_transform(elem: Any, coordinate_system: str) -> Any:
    """Affine of ``elem`` into ``coordinate_system``, duck-typed.

    The reference reads the spatialdata transform registry
    (_derive_mpp.py:109-122); this build's elements are expressed in their
    target frame (identity) unless the element carries an
    ``attrs['transform']`` mapping — in which case an unregistered
    ``coordinate_system`` raises, matching the reference."""
    attrs = getattr(elem, "attrs", None)
    transforms = attrs.get("transform") if isinstance(attrs, dict) else None
    if isinstance(transforms, dict):
        if coordinate_system not in transforms:
            raise ValueError(
                f"Coordinate system {coordinate_system!r} is not registered for this shapes "
                f"element. Available: {sorted(transforms)}."
            )
        return transforms[coordinate_system]
    return None


def derive_mpp_from_shapes(
    sdata: Any,
    shapes_key: Any = None,
    coordinate_system: str | None = None,
    *,
    um_between_centers: float | None = None,
    um_diameter: float | None = None,
    um_square_edge: float | None = None,
    radius_column: str = "radius",
    known_diameter_um: float | None = None,
) -> float:
    """Derive microns-per-pixel from a shapes element with a known physical
    scale (reference surface:
    /root/reference/src/squidpy/experimental/utils/_derive_mpp.py:22-150).

    ``derive_mpp_from_shapes(sdata, shapes_key, coordinate_system,
    um_between_centers=100)`` resolves ``sdata.shapes[shapes_key]`` (a
    DataFrame with ``x``/``y`` [+ ``radius``] columns for points, or a
    ``geometry`` column of polygon vertex arrays) and measures the chosen
    physical quantity in ``coordinate_system``. Exactly one of
    ``um_between_centers`` / ``um_diameter`` / ``um_square_edge`` must be
    given; geometry/physical-input mismatches and anisotropic transforms
    raise ``ValueError`` (see :func:`derive_mpp`). Elements are taken as
    expressed in their target frame unless they carry an
    ``attrs['transform']`` mapping.

    Legacy array form: ``derive_mpp_from_shapes(radii)`` (or a DataFrame
    with ``radius_column``) assumes Visium's 55 µm spot diameter;
    ``um_diameter`` overrides it.
    """
    shapes_trees = getattr(sdata, "shapes", None)
    if isinstance(shapes_trees, dict) or (
        shapes_trees is not None and hasattr(shapes_trees, "keys") and hasattr(shapes_trees, "__getitem__")
    ):
        if shapes_key is None:
            raise ValueError("Pass `shapes_key` to select a shapes element from the SpatialData object.")
        if shapes_key not in shapes_trees:
            raise KeyError(f"Shapes element {shapes_key!r} not found in sdata.shapes.")
        elem = shapes_trees[shapes_key]
        if hasattr(elem, "__len__") and len(elem) == 0:
            raise ValueError(f"Shapes element {shapes_key!r} is empty; cannot derive mpp.")
        geom, radii = _shapes_element_geometry(elem, radius_column)
        if coordinate_system is not None:
            transform = _element_transform(elem, coordinate_system)
        else:
            # the element may still carry registered transforms — silently
            # measuring in its NATIVE frame would be off by the transform's
            # scale. One registered frame resolves unambiguously; several
            # require the caller to name one.
            attrs = getattr(elem, "attrs", None)
            transforms = attrs.get("transform") if isinstance(attrs, dict) else None
            if isinstance(transforms, dict) and transforms:
                if len(transforms) > 1:
                    raise ValueError(
                        "This shapes element registers several coordinate systems "
                        f"({sorted(transforms)}); pass `coordinate_system` to pick one."
                    )
                transform = next(iter(transforms.values()))
            else:
                transform = None
        return derive_mpp(
            geom,
            um_between_centers=um_between_centers,
            um_diameter=um_diameter,
            um_square_edge=um_square_edge,
            radii=radii,
            transform=transform,
        )

    # legacy array form: (radii_or_df, known_diameter_um=55.0) — positional
    # or by the original keyword
    shapes = sdata
    if shapes_key is not None:
        try:
            known_diameter_um = float(shapes_key)
        except (TypeError, ValueError):
            raise TypeError(
                f"Second argument {shapes_key!r} is neither a known diameter (µm) "
                "for the array form nor applicable here — the first argument is "
                "not a SpatialData object, so `shapes_key` has no meaning."
            ) from None
    if known_diameter_um is None:
        known_diameter_um = um_diameter if um_diameter is not None else 55.0
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
