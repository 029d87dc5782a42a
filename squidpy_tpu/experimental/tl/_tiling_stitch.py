"""Stitch-group assignment for tile-cut cell pieces.

Counterpart of the reference's cut-edge pairing pipeline
(/root/reference/src/squidpy/experimental/tl/_tiling_stitch.py:258-919), built
grid-agnostically on pixel runs instead of sub-pixel contours: a piece cut at
a tile boundary terminates exactly at its bounding-box edge, so a dense run of
mask pixels along a bbox border row/column IS the cut chord. Facing chords
within ``max_gap`` are scored by the flat mean of five geometric features in
[0, 1] — ``iou`` (1-D chord overlap), ``endpoint_match``, ``gap_proximity``
(seam gap vs the morphological closing reach), ``merge_compactness`` and
``merge_solidity`` of the gap-closed union mask — and high-confidence pairs
are assembled into groups with size caps and corner/chain geometry
validation. Labels are never modified here; materialization is opt-in via
:func:`squidpy_tpu.experimental.im.make_stitched_labels`.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass
from typing import Any, NamedTuple

import numpy as np
import pandas as pd
from scipy import ndimage as ndi

from squidpy_tpu.experimental._params import resolve_params
from squidpy_tpu.utils import logg

__all__ = ["StitchParams", "assign_stitch_groups"]

# Features averaged into the stitch score; the two shape features are deferred
# until the cheap geometry features prove the pair could still clear the bar.
_SCORE_FEATURES = ("iou", "endpoint_match", "gap_proximity", "merge_compactness", "merge_solidity")
_SHAPE_FEATURES = ("merge_compactness", "merge_solidity")


@dataclass(frozen=True)
class StitchParams:
    """Tuning knobs for :func:`assign_stitch_groups` (reference:
    experimental/tl/_tiling_stitch.py:57-105).

    ``min_confidence``: floor on the 5-feature composite score for a stitch.
    ``max_gap``: candidate search radius — maximum perpendicular pixel gap
    between facing cut chords. ``max_group_size``: cap on group size
    (oversized groups collapse back to singletons). The remaining fields
    gate what counts as a genuine cut chord and scale the shape features.
    """

    min_confidence: float = 0.7
    max_gap: float = 3.0
    max_group_size: int = 4
    min_edge_length: float = 5.0
    """Absolute floor on cut-chord length (pixels)."""
    min_edge_length_ratio: float = 0.4
    """Minimum chord length relative to the piece's equivalent diameter."""
    min_edge_coverage: float = 0.5
    """Minimum fraction of chord positions occupied by mask pixels."""
    candidate_min_iou: float = 0.2
    """Loose 1-D IoU floor at candidate enumeration."""
    close_radius: int = 3
    """Closing disk radius for the union mask; also the ``gap_proximity``
    length scale (normalized by ``2 * close_radius``)."""

    def __post_init__(self) -> None:
        if not 0.0 <= self.min_confidence <= 1.0:
            raise ValueError(f"`min_confidence` must be in [0, 1], got {self.min_confidence}.")
        if self.max_gap < 0:
            raise ValueError(f"`max_gap` must be >= 0, got {self.max_gap}.")
        if self.max_group_size < 2:
            raise ValueError(f"`max_group_size` must be >= 2, got {self.max_group_size}.")
        for name in ("min_edge_length_ratio", "min_edge_coverage", "candidate_min_iou"):
            v = getattr(self, name)
            if not 0.0 <= v <= 1.0:
                raise ValueError(f"`{name}` must be in [0, 1], got {v}.")
        if self.min_edge_length < 0:
            raise ValueError(f"`min_edge_length` must be >= 0, got {self.min_edge_length}.")
        if self.close_radius < 0:
            raise ValueError(f"`close_radius` must be >= 0, got {self.close_radius}.")


class _CutEdge(NamedTuple):
    """A cut chord on one bbox edge of a piece, in boundary coordinates.

    ``coord`` is the half-integer position of the cut line (the pixel
    boundary), so two pieces that touch across a seam have equal coords and
    gap 0. ``normal`` is +1 when the piece lies at greater coordinate than
    the line (a top edge), -1 otherwise.
    """

    cell: int
    axis: str  # "h": horizontal cut line, chord runs along x; "v": vertical
    coord: float
    lo: float
    hi: float
    normal: int

    @property
    def length(self) -> float:
        return self.hi - self.lo


class _Pair(NamedTuple):
    a: int
    b: int
    axis: str
    confidence: float
    features: dict[str, float]
    edge_a: _CutEdge
    edge_b: _CutEdge


def _chord_on_line(line: np.ndarray, offset: float, min_coverage: float) -> tuple[float, float] | None:
    """Extent of a dense pixel run on one bbox border row/column.

    ``line`` is the boolean border row (or column) of the piece's bbox mask.
    A genuine cut chord occupies most integer positions between its ends;
    a curved cell grazes its bbox at a point and fails the density check.
    """
    on = np.nonzero(line)[0]
    if len(on) < 3:
        return None
    lo, hi = float(on[0]), float(on[-1])
    if hi <= lo:
        return None
    coverage = len(on) / (hi - lo + 1.0)
    if coverage < min_coverage:
        return None
    return lo + offset, hi + offset


def _extract_cut_edges(
    labels: np.ndarray,
    outlier_ids: list[int],
    bboxes: dict[int, tuple[int, int, int, int]],
    params: StitchParams,
) -> tuple[list[_CutEdge], dict[int, np.ndarray]]:
    """Find cardinal cut chords per outlier piece; return them plus the
    per-piece bbox masks (reused by the merge-shape scoring pass so the
    labels array is read once per piece, not once per candidate pair)."""
    edges: list[_CutEdge] = []
    crops: dict[int, np.ndarray] = {}
    for lid in outlier_ids:
        bb = bboxes.get(lid)
        if bb is None:
            continue
        r0, c0, r1, c1 = bb
        mask = labels[r0:r1, c0:c1] == lid
        if not mask.any():
            continue
        crops[lid] = mask
        eq_diameter = float(np.sqrt(4.0 * mask.sum() / np.pi))
        min_len = max(params.min_edge_length, params.min_edge_length_ratio * eq_diameter)
        # (axis, cut-line coord, border line of the mask, chord offset, normal)
        sides = (
            ("h", r0 - 0.5, mask[0, :], c0, 1),
            ("h", r1 - 0.5, mask[-1, :], c0, -1),
            ("v", c0 - 0.5, mask[:, 0], r0, 1),
            ("v", c1 - 0.5, mask[:, -1], r0, -1),
        )
        for axis, coord, line, offset, normal in sides:
            chord = _chord_on_line(line, float(offset), params.min_edge_coverage)
            if chord is None or chord[1] - chord[0] < min_len:
                continue
            edges.append(_CutEdge(lid, axis, float(coord), chord[0], chord[1], normal))
    return edges, crops


def _facing_geometry(e: _CutEdge, c: _CutEdge, params: StitchParams) -> dict[str, float] | None:
    """Cheap chord-geometry features, or None if the pair can't be a seam."""
    if e.normal == c.normal:
        return None
    # the +1-normal piece must sit at greater coordinate than its partner
    if (e.coord - c.coord) * e.normal < -1e-6:
        return None
    gap = abs(e.coord - c.coord)
    if gap > params.max_gap:
        return None
    overlap = min(e.hi, c.hi) - max(e.lo, c.lo)
    if overlap <= 0:
        return None
    union = e.length + c.length - overlap
    iou = overlap / union if union > 0 else 0.0
    if iou < params.candidate_min_iou:
        return None
    max_len = max(e.length, c.length)
    endpoint_dist = abs(e.lo - c.lo) + abs(e.hi - c.hi)
    endpoint_match = max(0.0, 1.0 - endpoint_dist / max_len) if max_len > 0 else 0.0
    # gap relative to what closing can actually bridge; neutral when touching
    # or when closing is disabled (never a silent score cliff)
    reach = 2.0 * params.close_radius
    gap_proximity = 1.0 if (gap <= 0 or reach <= 0) else max(0.0, 1.0 - gap / reach)
    return {"iou": float(iou), "endpoint_match": float(endpoint_match), "gap_proximity": float(gap_proximity)}


def _disk(radius: int) -> np.ndarray:
    yy, xx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    return (yy * yy + xx * xx) <= radius * radius


def _convex_hull_pixel_area(mask: np.ndarray) -> float:
    """Pixel-comparable convex hull area of a digital region: polygon area of
    the hull of pixel centers plus the Pick-style boundary correction, so a
    convex region's solidity lands at ~1 instead of being inflated."""
    pts = np.column_stack(np.nonzero(mask)).astype(float)
    if len(pts) < 3:
        return float(mask.sum())
    try:
        from scipy.spatial import ConvexHull

        hull = ConvexHull(pts)
        # interior lattice area + half the hull perimeter + 1 (Pick)
        return float(hull.volume + 0.5 * hull.area + 1.0)
    except Exception:  # collinear/degenerate hulls
        return float(mask.sum())


def _merge_shape(
    a: int,
    b: int,
    bboxes: dict[int, tuple[int, int, int, int]],
    crops: dict[int, np.ndarray],
    close_radius: int,
    shape: tuple[int, int],
) -> dict[str, float]:
    """Close the seam between the two pieces and measure the union's shape.

    Compactness (``4*pi*A / P^2``) and solidity collapse when unrelated cells
    are joined — the union is concave at the seam. Perimeter is the exposed
    4-neighbor face count scaled by ``pi/4`` (the mean Manhattan->Euclidean
    factor), which puts a disk's compactness at ~1 like a true perimeter.
    """
    zero = {"merge_compactness": 0.0, "merge_solidity": 0.0}
    if a not in crops or b not in crops:
        return zero
    ra, ca, ra1, ca1 = bboxes[a]
    rb, cb, rb1, cb1 = bboxes[b]
    pad = close_radius + 2
    r0 = max(min(ra, rb) - pad, 0)
    c0 = max(min(ca, cb) - pad, 0)
    r1 = min(max(ra1, rb1) + pad, shape[0])
    c1 = min(max(ca1, cb1) + pad, shape[1])
    union = np.zeros((r1 - r0, c1 - c0), dtype=bool)
    union[ra - r0 : ra1 - r0, ca - c0 : ca1 - c0] |= crops[a]
    union[rb - r0 : rb1 - r0, cb - c0 : cb1 - c0] |= crops[b]
    if close_radius > 0:
        union = ndi.binary_closing(union, structure=_disk(close_radius))
    comps, n = ndi.label(union, structure=np.ones((3, 3), dtype=int))
    if n == 0:
        return zero
    sizes = np.bincount(comps.ravel())
    sizes[0] = 0
    biggest = comps == int(sizes.argmax())
    area = float(biggest.sum())
    exposed = 4.0 * area - 2.0 * (
        float(np.logical_and(biggest[:, 1:], biggest[:, :-1]).sum())
        + float(np.logical_and(biggest[1:, :], biggest[:-1, :]).sum())
    )
    perimeter = max(exposed * (np.pi / 4.0), 1.0)
    compactness = min(4.0 * np.pi * area / (perimeter * perimeter), 1.0)
    solidity = min(area / max(_convex_hull_pixel_area(biggest), 1.0), 1.0)
    return {"merge_compactness": float(compactness), "merge_solidity": float(solidity)}


def _score(features: dict[str, float]) -> float:
    return float(sum(features[k] for k in _SCORE_FEATURES) / len(_SCORE_FEATURES))


def _score_pairs(
    edges: list[_CutEdge],
    bboxes: dict[int, tuple[int, int, int, int]],
    crops: dict[int, np.ndarray],
    params: StitchParams,
    shape: tuple[int, int],
) -> list[_Pair]:
    """Enumerate facing chord pairs per axis, score, and keep survivors."""
    by_key: dict[tuple[int, int, str], _Pair] = {}
    for axis in ("h", "v"):
        axis_edges = sorted((e for e in edges if e.axis == axis), key=lambda e: e.coord)
        coords = np.array([e.coord for e in axis_edges])
        for i, e in enumerate(axis_edges):
            hi = int(np.searchsorted(coords, e.coord + params.max_gap, side="right"))
            for j in range(i + 1, hi):
                c = axis_edges[j]
                if c.cell == e.cell:
                    continue
                geom = _facing_geometry(e, c, params)
                if geom is None:
                    continue
                # prune: even perfect shape features can't rescue this pair
                best_case = _score({**geom, **dict.fromkeys(_SHAPE_FEATURES, 1.0)})
                if best_case < params.min_confidence:
                    continue
                feats = {
                    **geom,
                    **_merge_shape(e.cell, c.cell, bboxes, crops, params.close_radius, shape),
                }
                conf = _score(feats)
                if conf < params.min_confidence:
                    continue
                a, b = sorted((e.cell, c.cell))
                key = (a, b, axis)
                if key not in by_key or by_key[key].confidence < conf:
                    ea, eb = (e, c) if e.cell == a else (c, e)
                    by_key[key] = _Pair(a, b, axis, conf, feats, ea, eb)
    return sorted(by_key.values(), key=lambda p: (-p.confidence, p.a, p.b))


def _group_geometry_ok(pairs: list[_Pair], size: int, max_gap: float) -> bool:
    """Sanity-check 3+-piece groups: same-axis chains need distinct seam
    coords; mixed-axis 4-groups need chord endpoints converging on one
    corner junction."""
    h_pairs = [p for p in pairs if p.axis == "h"]
    v_pairs = [p for p in pairs if p.axis == "v"]
    if not h_pairs or not v_pairs:
        if size < 3:
            return True
        seams = sorted((p.edge_a.coord + p.edge_b.coord) / 2.0 for p in pairs)
        return all(b - a > max_gap for a, b in zip(seams, seams[1:]))
    if size != 4:
        return True  # 3-piece L-shapes have no junction to converge on
    h_edges = [e for p in h_pairs for e in (p.edge_a, p.edge_b)]
    v_edges = [e for p in v_pairs for e in (p.edge_a, p.edge_b)]
    junction_y = float(np.mean([e.coord for e in h_edges]))
    junction_x = float(np.mean([e.coord for e in v_edges]))
    return all(
        min(abs(e.lo - junction_x), abs(e.hi - junction_x)) <= max_gap for e in h_edges
    ) and all(min(abs(e.lo - junction_y), abs(e.hi - junction_y)) <= max_gap for e in v_edges)


def _assemble(
    pairs: list[_Pair], outlier_ids: list[int], params: StitchParams
) -> tuple[dict[int, int], dict[int, float]]:
    """Union-find over surviving pairs with size cap + geometry validation.

    Returns ``cell -> group root`` and ``cell -> confidence`` (min over the
    group's pair confidences — the weakest link; 1.0 for confirmed solos)."""
    parent: dict[int, int] = {int(i): int(i) for i in outlier_ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        ra, rb = find(p.a), find(p.b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    members: dict[int, list[int]] = {}
    for cid in outlier_ids:
        members.setdefault(find(int(cid)), []).append(int(cid))
    pairs_by_root: dict[int, list[_Pair]] = {}
    for p in pairs:
        pairs_by_root.setdefault(find(p.a), []).append(p)

    groups: dict[int, int] = {}
    confidences: dict[int, float] = {}
    for root, mem in members.items():
        size = len(mem)
        group_pairs = pairs_by_root.get(root, [])
        valid = (
            size <= params.max_group_size
            and (size < 3 or _group_geometry_ok(group_pairs, size, params.max_gap))
            and size > 1
        )
        if not valid:
            for m in mem:
                groups[m] = m
                confidences[m] = 1.0
            continue
        conf = float(min(p.confidence for p in group_pairs))
        for m in mem:
            groups[m] = min(mem)
            confidences[m] = conf
    return groups, confidences


def assign_stitch_groups(
    labels: Any,
    qc_table: Any = None,
    *,
    sdata: Any = None,
    labels_key: str = "labels",
    qc_table_key: str | None = None,
    scale: str = "full",
    tile_size: int | None = None,
    min_confidence: float = 0.7,
    max_gap: float = 3.0,
    max_group_size: int = 4,
    inplace: bool = True,
    stitch_params: Any = None,
) -> pd.DataFrame:
    """Pair tile-cut cell pieces across seam lines into stitch groups.

    ``qc_table`` is the AnnData from
    :func:`squidpy_tpu.experimental.tl.calculate_tiling_qc`; pieces flagged
    there (``is_outlier`` / ``tile_cut``) are examined for straight cut
    chords on their bbox edges, facing chords are scored by five geometric
    features, and confident pairs are merged via union-find with size and
    corner/chain validation. Adds to obs: ``stitch_group_id`` (min member
    label for stitched groups, own label otherwise), ``is_stitched``,
    ``n_pieces`` and ``stitch_confidence`` (NaN for never-evaluated cells,
    1.0 for checked solos, the group's weakest pair score otherwise);
    records run metadata + per-pair features in ``uns['tiling_stitch']``.
    Returns the obs DataFrame.

    ``tile_size`` is accepted for compatibility but unused — the chord
    detection is grid-agnostic. ``stitch_params`` takes a
    :class:`StitchParams` instance (or mapping of field names) and overrides
    the individual knobs.
    """
    if stitch_params is not None:
        params = resolve_params(stitch_params, StitchParams, "stitch_params")
    else:
        params = StitchParams(
            min_confidence=min_confidence, max_gap=max_gap, max_group_size=max_group_size
        )
    from squidpy_tpu.experimental._sdata import is_sdata, resolve_element

    if is_sdata(labels):
        sdata = labels
        labels = resolve_element(sdata, labels_key, tree="labels", scale=scale, what="labels")
    if qc_table is None and sdata is not None:
        qc_table = sdata.tables[qc_table_key or f"{labels_key}_qc"]
    if qc_table is None:
        raise ValueError(
            "assign_stitch_groups needs the tiling-QC table: pass `qc_table=` "
            "(or an sdata holding it) — run `calculate_tiling_qc` first."
        )
    labels_arr = np.asarray(labels).squeeze()
    obs = qc_table.obs
    flagged = obs.get("is_outlier", obs.get("tile_cut"))
    if flagged is None:
        raise KeyError("`is_outlier`/`tile_cut` not found; run `calculate_tiling_qc` first.")
    out_mask = np.asarray(flagged, dtype=bool) | np.asarray(
        obs.get("tile_cut", False), dtype=bool
    )
    label_ids = obs["label"].to_numpy().astype(np.int64)
    outlier_ids = [int(x) for x in label_ids[out_mask]]

    slices = ndi.find_objects(labels_arr)
    bboxes = {
        lid: (sl[0].start, sl[1].start, sl[0].stop, sl[1].stop)
        for lid in outlier_ids
        if 0 < lid <= len(slices) and (sl := slices[lid - 1]) is not None
    }
    edges, crops = _extract_cut_edges(labels_arr, outlier_ids, bboxes, params)
    pairs = _score_pairs(edges, bboxes, crops, params, labels_arr.shape)
    groups, confidences = _assemble(pairs, outlier_ids, params)

    n = len(label_ids)
    group_id = label_ids.copy()
    is_stitched = np.zeros(n, dtype=bool)
    n_pieces = np.ones(n, dtype=np.int32)
    conf_col = np.full(n, np.nan)
    group_sizes: dict[int, int] = {}
    for root in groups.values():
        group_sizes[root] = group_sizes.get(root, 0) + 1
    idx_of = {int(l): i for i, l in enumerate(label_ids)}
    for cid, root in groups.items():
        i = idx_of.get(cid)
        if i is None:
            continue
        group_id[i] = root
        size = group_sizes[root]
        n_pieces[i] = size
        is_stitched[i] = size > 1
        conf_col[i] = confidences[cid]

    obs = obs.copy()
    obs["stitch_group_id"] = group_id
    obs["is_stitched"] = is_stitched
    obs["n_pieces"] = n_pieces
    obs["stitch_confidence"] = conf_col

    n_groups = sum(1 for s in group_sizes.values() if s > 1)
    qc_table.uns["tiling_stitch"] = {
        "params": asdict(params),
        "n_outliers": int(len(outlier_ids)),
        "n_candidate_pairs": int(len(pairs)),
        "n_stitched_groups": int(n_groups),
        "n_stitched_cells": int(is_stitched.sum()),
        "score_features": list(_SCORE_FEATURES),
        "pair_features": pd.DataFrame(
            [
                {"cell_a": p.a, "cell_b": p.b, "axis": p.axis, "confidence": p.confidence, **p.features}
                for p in pairs
            ]
        ),
    }
    logg.info(
        f"Assigned `{n_groups}` stitch groups covering `{int(is_stitched.sum())}` cells"
    )
    if inplace:
        qc_table.obs = obs
    return obs
