"""Tile-boundary segmentation QC: detect cells cut by tiled segmentation.

Functional counterpart of /root/reference/src/squidpy/experimental/tl/_tiling_qc.py:115-600:
cells cut at tile borders exhibit artificially straight axis-aligned edges;
per cell we measure the longest contiguous straight boundary run in each
direction (the "collinear scan"), normalize by the cell's extent, and flag
outliers by the MAD rule. Runs over the cell-aware tile grid so only one
tile's labels are resident at a time.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Literal

import numpy as np
import pandas as pd

from squidpy_tpu._core.anndata import AnnData
from squidpy_tpu.experimental.im._tiling import (
    TileSpec,
    build_tile_specs,
    compute_cell_info_tiled,
    extract_labels_tile,
    run_tiled,
)
from squidpy_tpu.experimental._params import resolve_params
from squidpy_tpu.utils import logg

__all__ = ["TilingQCParams", "calculate_tiling_qc"]


@dataclass(frozen=True)
class TilingQCParams:
    """Advanced knobs for :func:`calculate_tiling_qc` (reference:
    experimental/tl/_tiling_qc.py:61-91). ``min_area``: cells smaller than
    this (pixels) get NaN scores and are never flagged; ``min_run_px``:
    absolute floor on the straight-run length backing a cut flag;
    ``nmads_cut``: MAD-rule outlier multiplier for the flag."""

    min_area: int = 1
    min_run_px: int = 8
    nmads_cut: float = 1.5

    def __post_init__(self) -> None:
        if self.min_area < 1:
            raise ValueError(f"`min_area` must be >= 1, got {self.min_area}.")
        if self.min_run_px < 1:
            raise ValueError(f"`min_run_px` must be >= 1, got {self.min_run_px}.")
        if self.nmads_cut <= 0:
            raise ValueError(f"`nmads_cut` must be > 0, got {self.nmads_cut}.")


def _longest_run(mask_1d: np.ndarray) -> int:
    """Longest run of consecutive True values."""
    if not mask_1d.any():
        return 0
    padded = np.concatenate([[0], mask_1d.astype(np.int8), [0]])
    edges = np.diff(padded)
    starts = np.nonzero(edges == 1)[0]
    ends = np.nonzero(edges == -1)[0]
    return int((ends - starts).max())


def _cell_straightness(mask: np.ndarray) -> tuple[float, float, int]:
    """(vertical, horizontal) straight-edge scores in [0, 1] + the longest
    absolute run length in pixels.

    A straight vertical cut shows up as one column whose boundary pixels form
    a contiguous run spanning (most of) the cell's height — the score is that
    run length over the bbox height (resp. width for horizontal).
    """
    ys, xs = np.nonzero(mask)
    if not len(ys):
        return 0.0, 0.0, 0
    h = ys.max() - ys.min() + 1
    w = xs.max() - xs.min() + 1
    # boundary = pixels adjacent to background (4-connectivity)
    pad = np.pad(mask, 1)
    interior = pad[:-2, 1:-1] & pad[2:, 1:-1] & pad[1:-1, :-2] & pad[1:-1, 2:]
    boundary = mask & ~interior

    vert = 0
    col_counts = boundary.sum(axis=0)
    for c in np.nonzero(col_counts >= max(3, 0.5 * col_counts.max()))[0]:
        vert = max(vert, _longest_run(boundary[:, c]))
    horiz = 0
    row_counts = boundary.sum(axis=1)
    for r in np.nonzero(row_counts >= max(3, 0.5 * row_counts.max()))[0]:
        horiz = max(horiz, _longest_run(boundary[r, :]))
    return vert / h, horiz / w, max(vert, horiz)


def _qc_tile(spec: TileSpec, labels: Any) -> pd.DataFrame:
    tile = extract_labels_tile(labels, spec)
    if tile.max() == 0:
        return pd.DataFrame()
    cy0, cx0 = spec.crop[0], spec.crop[1]
    rows = []
    for lid in sorted(spec.owned_ids):
        mask = tile == lid
        if not mask.any():
            continue
        v, h, run_px = _cell_straightness(mask)
        ys, xs = np.nonzero(mask)
        rows.append(
            {
                "label": lid,
                "centroid_y": float(ys.mean()) + cy0,
                "centroid_x": float(xs.mean()) + cx0,
                "area": int(mask.sum()),
                "straight_v": v,
                "straight_h": h,
                "straight_run_px": run_px,
                "cut_score": max(v, h),
            }
        )
    return pd.DataFrame(rows)


def _mad_outliers(values: np.ndarray, nmads: float) -> np.ndarray:
    med = np.median(values)
    mad = np.median(np.abs(values - med)) or 1e-9
    return values > med + nmads * mad


def calculate_tiling_qc(
    labels: Any,
    *,
    tile_size: int = 2048,
    overlap_margin: int | Literal["auto"] = "auto",
    nmads_cut: float = 1.5,
    min_run_px: int = 8,
    n_jobs: int = 1,
    sdata: Any = None,
    labels_key: str = "labels",
    table_key_added: str | None = None,
    tiling_qc_params: Any = None,
    n_neighbors: int = 10,
    nmads_smoothed: float = 3.0,
    outlier_use_cut: bool = True,
    outlier_use_smoothed: bool = True,
    scale: str = "full",
    downsample: int = 1,
    inplace: bool = True,
) -> AnnData:
    """Score every cell for tile-boundary artifacts.

    Returns an AnnData with one obs per cell: straightness scores,
    ``cut_score`` and a ``tile_cut`` outlier flag (MAD rule at ``nmads_cut``),
    plus the reference's spatially smoothed columns
    (/root/reference/src/squidpy/experimental/tl/_tiling_qc.py:13-19,439-494):
    ``smoothed_cut_score`` (cut_score × mean cut_score of the ``n_neighbors``
    nearest cells — amplifies boundary clusters of cut cells), ``is_outlier``
    (cut and/or smoothed MAD gates per ``outlier_use_*``) and
    ``nhood_outlier_fraction`` (fraction of neighbors that are smoothed
    outliers). Attached to ``sdata.tables['{labels_key}_qc']`` when given.
    ``tiling_qc_params`` takes a :class:`TilingQCParams` instance (or a
    mapping of its field names) and overrides the individual knobs.
    """
    from squidpy_tpu.experimental._sdata import is_sdata, resolve_element

    if is_sdata(labels):
        sdata = labels
        labels = resolve_element(sdata, labels_key, tree="labels", scale=scale, what="labels")
    d = int(downsample) if downsample else 1
    if d > 1:
        labels = np.asarray(labels)[..., ::d, ::d]
    qp = resolve_params(tiling_qc_params, TilingQCParams, "tiling_qc_params")
    if tiling_qc_params is not None:
        nmads_cut, min_run_px = qp.nmads_cut, qp.min_run_px
    start = logg.info("Computing cell centroids for tiling QC")
    cell_info = compute_cell_info_tiled(labels)
    if not cell_info:
        raise ValueError("No cells found in the label image.")
    specs = build_tile_specs(labels.shape[-2:], cell_info, tile_size=tile_size, overlap_margin=overlap_margin)

    frames = run_tiled(specs, _qc_tile, n_jobs=n_jobs, scatter=(labels,), desc="QC tiles")
    df = pd.concat([f for f in frames if len(f)], ignore_index=True).sort_values("label").reset_index(drop=True)

    if d > 1:
        # report everything in FULL-RESOLUTION units, like the reference
        # (which downsamples only the per-cell analysis crop and compensates
        # its thresholds, reference tl/_tiling_qc.py:370-389): centroids and
        # run lengths scale by d, areas by d², so the obsm['spatial'] overlay
        # stays aligned with the full-res labels element and the
        # min_run_px/min_area gates keep their full-res meaning
        df["centroid_x"] *= d
        df["centroid_y"] *= d
        df["straight_run_px"] *= d
        df["area"] *= d * d

    # tiny cells trivially reach straightness 1.0, so the flag also requires
    # an absolute straight run of at least `min_run_px` pixels
    df["tile_cut"] = (
        _mad_outliers(df["cut_score"].to_numpy(), nmads_cut)
        & (df["cut_score"] > 0.5)
        & (df["straight_run_px"] >= min_run_px)
    )
    if qp.min_area > 1:
        tiny = df["area"].to_numpy() < qp.min_area
        df.loc[tiny, ["straight_v", "straight_h", "cut_score"]] = np.nan
        df.loc[tiny, "tile_cut"] = False

    # spatially smoothed score + combined outlier gates (reference columns)
    cut = np.nan_to_num(df["cut_score"].to_numpy(), nan=0.0)
    if len(df) > 1 and n_neighbors > 0:
        from scipy.spatial import cKDTree

        xy = df[["centroid_x", "centroid_y"]].to_numpy()
        k = min(n_neighbors + 1, len(df))
        _, nn = cKDTree(xy).query(xy, k=k)
        nbr = nn[:, 1:] if k > 1 else nn
        smoothed = cut * cut[nbr].mean(axis=1)
    else:
        # no neighborhood: each cell is its own neighborhood (self-index,
        # NOT cell 0 — a zeros array would report cell 0's flag everywhere)
        nbr = np.arange(len(df), dtype=int)[:, None]
        smoothed = cut * cut
    df["smoothed_cut_score"] = smoothed

    def _mad_gate(v: np.ndarray, nmads: float) -> np.ndarray:
        med = np.median(v)
        mad = np.median(np.abs(v - med)) or 1e-9
        return v > med + nmads * mad * 1.4826

    cut_out = _mad_gate(cut, nmads_cut)
    smooth_out = _mad_gate(smoothed, nmads_smoothed)
    df["is_outlier"] = (outlier_use_cut & cut_out) | (outlier_use_smoothed & smooth_out)
    df["nhood_outlier_fraction"] = smooth_out[nbr].mean(axis=1)

    # reference score columns (tl/_tiling_qc.py:515-523): the longest straight
    # boundary run over the cell's equivalent diameter, and its axis alignment.
    # This build's run detector only measures cardinal (axis-aligned) runs, so
    # alignment is 1.0 wherever a run exists and 0.0 otherwise.
    eq_diam = 2.0 * np.sqrt(df["area"].to_numpy(dtype=float) / np.pi)
    df["max_straight_edge_ratio"] = df["straight_run_px"].to_numpy(dtype=float) / np.maximum(eq_diam, 1.0)
    df["cardinal_alignment_score"] = (df["straight_run_px"].to_numpy() > 0).astype(float)

    obs = df.drop(columns=["centroid_y", "centroid_x"]).copy()
    obs.index = pd.Index([f"cell_{int(v)}" for v in df["label"]])
    adata = AnnData(X=df[["straight_v", "straight_h", "cut_score"]].to_numpy(), obs=obs,
                    var=pd.DataFrame(index=["straight_v", "straight_h", "cut_score"]))
    adata.obsm["spatial"] = df[["centroid_x", "centroid_y"]].to_numpy()
    adata.uns["tiling_qc"] = {"tile_size": tile_size, "nmads_cut": nmads_cut}
    logg.info(f"Flagged `{int(df['tile_cut'].sum())}` of `{len(df)}` cells as tile-cut", time=start)

    if sdata is not None and hasattr(sdata, "tables"):
        if inplace:
            sdata.tables[table_key_added or f"{labels_key}_qc"] = adata
    return adata
