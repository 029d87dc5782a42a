"""Materialize stitched labels from a stitch-group assignment.

Functional counterpart of /root/reference/src/squidpy/experimental/im/_stitched_labels.py:76-430:
rewrite the label image through an int→int LUT so every stitch group shares
one id, and collapse the companion table rows via a merge strategy.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd

from squidpy_tpu._core.anndata import AnnData
from squidpy_tpu.utils import logg

__all__ = ["make_stitched_labels"]

# Collapse policy (reference: experimental/im/_stitched_labels.py:145-200,276-330).
# Members of a stitch group agree on these — take the first value:
_TAKE_FIRST_COLS = frozenset({"stitch_group_id", "is_stitched", "n_pieces", "stitch_confidence", "region"})
# Position of the merged cell is the mean of its pieces' positions:
_CENTROID_COLS = frozenset({"centroid_y", "centroid_x"})
# Per-piece cut-artifact diagnostics keep the group's WORST value — summing
# them is meaningless and the default strategy is "sum":
_WORST_PIECE_COLS = frozenset(
    {
        "cut_score", "smoothed_cut_score", "max_straight_edge_ratio",
        "cardinal_alignment_score", "nhood_outlier_fraction", "is_outlier",
        "tile_cut", "straight_v", "straight_h", "straight_run_px",
    }
)
_STRATEGY_NAMES = frozenset({"sum", "min", "max", "mean", "median", "first"})
# These always return one of the inputs, so integer X keeps its dtype;
# "sum" can overflow the input range and must promote.
_INT_SAFE_STRATEGIES = frozenset({"min", "max", "first"})


def _check_strategy(strategy: str | Callable[[pd.Series], Any]) -> None:
    if callable(strategy):
        return
    if strategy not in _STRATEGY_NAMES:
        raise ValueError(
            f"Unknown merge_strategy {strategy!r}. Use one of {sorted(_STRATEGY_NAMES)} or pass a callable."
        )


def _aggregate_rows(X: Any, groups: list[np.ndarray], strategy: str | Callable[[pd.Series], Any]) -> np.ndarray:
    """Collapse row blocks of ``X`` (dense or scipy-sparse) into one row per
    group. Integer inputs keep their dtype only under range-preserving
    strategies; ``sum`` promotes to int64 and ``mean``/``median`` to float."""
    import scipy.sparse as sps

    sparse = sps.issparse(X)
    if np.issubdtype(X.dtype, np.integer):
        if strategy == "sum" or callable(strategy):
            out_dtype: Any = np.int64 if strategy == "sum" else np.float64
        elif strategy in _INT_SAFE_STRATEGIES:
            out_dtype = X.dtype
        else:
            out_dtype = np.float64
    else:
        out_dtype = X.dtype
    out = np.empty((len(groups), X.shape[1]), dtype=out_dtype)
    Xc = X.tocsr() if sparse else np.asarray(X)
    for i, idx in enumerate(groups):
        block = np.asarray(Xc[idx].todense()) if sparse else Xc[idx]
        if callable(strategy):
            out[i] = [strategy(pd.Series(block[:, j])) for j in range(block.shape[1])]
        elif strategy == "sum":
            out[i] = block.astype(out_dtype, copy=False).sum(axis=0)
        elif strategy == "min":
            out[i] = block.min(axis=0)
        elif strategy == "max":
            out[i] = block.max(axis=0)
        elif strategy == "mean":
            out[i] = block.mean(axis=0)
        elif strategy == "median":
            out[i] = np.median(block, axis=0)
        else:  # first
            out[i] = block[0]
    return out


def _collapse_table(
    qc_table: Any,
    merge_strategy: str | Callable[[pd.Series], Any],
    label_col: str,
) -> AnnData:
    """One output row per stitch group: invariants/non-numeric take the first
    member, centroids average, cut diagnostics keep the worst piece, remaining
    numeric obs columns and ``X`` collapse via ``merge_strategy``."""
    import copy as _copy

    obs = qc_table.obs
    gids = obs["stitch_group_id"].astype(int).to_numpy()
    order = np.argsort(gids, kind="stable")
    unique_groups, first_pos = np.unique(gids[order], return_index=True)
    groups = np.split(order, first_pos[1:])

    numeric = {c for c in obs.columns if c != label_col and pd.api.types.is_numeric_dtype(obs[c])}
    user_cols = [c for c in obs.columns if c in numeric - _TAKE_FIRST_COLS - _CENTROID_COLS - _WORST_PIECE_COLS]
    gb = obs.groupby(gids, sort=True)
    parts = []
    first_cols = [c for c in obs.columns if c != label_col and (c not in numeric or c in _TAKE_FIRST_COLS)]
    if first_cols:
        parts.append(gb[first_cols].first())
    cent_cols = [c for c in obs.columns if c in _CENTROID_COLS & numeric]
    if cent_cols:
        parts.append(gb[cent_cols].mean())
    worst_cols = [c for c in obs.columns if c in _WORST_PIECE_COLS & numeric]
    if worst_cols:
        parts.append(gb[worst_cols].max())
    if user_cols:
        parts.append(gb[user_cols].agg(merge_strategy))
    new_obs = pd.concat(parts, axis=1) if parts else pd.DataFrame(index=unique_groups)
    new_obs[label_col] = unique_groups
    new_obs = new_obs[[c for c in obs.columns]]
    new_obs.index = pd.Index([f"group_{int(g)}" for g in unique_groups])

    X = getattr(qc_table, "X", None)
    if X is not None and X.shape[1] > 0:
        new_X = _aggregate_rows(X, groups, merge_strategy)
    else:
        new_X = np.empty((len(unique_groups), 0), dtype=np.float32)

    out = AnnData(X=new_X, obs=new_obs, var=qc_table.var.copy())
    out.uns.update(_copy.deepcopy(dict(qc_table.uns)))
    spatial = getattr(qc_table, "obsm", {}).get("spatial")
    if spatial is not None:
        out.obsm["spatial"] = np.stack([np.asarray(spatial)[idx].mean(axis=0) for idx in groups])
    return out


def _apply_lut(labels: np.ndarray, mapping: dict[int, int]) -> np.ndarray:
    """Rewrite labels through a LUT (dense array lookup)."""
    max_label = int(labels.max())
    lut = np.arange(max_label + 1, dtype=np.int64)
    for old, new in mapping.items():
        if old <= max_label:
            lut[old] = new
    return lut[labels]


def _join_stitched_labels(labels: np.ndarray, group_ids: set[int], close_radius: int) -> np.ndarray:
    """Close the cut stripe inside each stitched group: fill background pixels
    covered by the binary closing of the group's mask — never another cell's.

    Each group's closing runs on its padded bounding box, not the whole image
    (a WSI-scale image with hundreds of groups would otherwise pay a full
    H×W morphology pass per group)."""
    from scipy import ndimage as ndi

    r = max(int(close_radius), 1)
    yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
    disk = (yy * yy + xx * xx) <= r * r
    out = labels.copy()
    slices = ndi.find_objects(labels)
    h, w = labels.shape
    for gid in group_ids:
        if gid <= 0 or gid > len(slices) or slices[gid - 1] is None:
            continue
        sy, sx = slices[gid - 1]
        y0, y1 = max(sy.start - r - 1, 0), min(sy.stop + r + 1, h)
        x0, x1 = max(sx.start - r - 1, 0), min(sx.stop + r + 1, w)
        crop = labels[y0:y1, x0:x1]
        mask = crop == gid
        closed = ndi.binary_closing(mask, structure=disk)
        fill = closed & ~mask & (crop == 0)
        out[y0:y1, x0:x1][fill] = gid
    return out


def make_stitched_labels(
    labels: Any,
    qc_table: Any = None,
    *,
    qc_table_key: str | None = None,
    scale: str = "full",
    inplace: bool = True,
    merge_strategy: str | Callable[[pd.Series], Any] = "sum",
    write_table: bool = True,
    join_labels: bool = False,
    join_close_radius: int = 3,
    sdata: Any = None,
    labels_key: str = "labels",
    labels_key_added: str | None = None,
    table_key_added: str | None = None,
) -> dict[str, Any]:
    """Build the stitched label image (+ merged per-group table).

    ``qc_table`` must carry ``obs['stitch_group_id']`` from
    :func:`squidpy_tpu.experimental.tl.assign_stitch_groups`. Returns
    ``{'labels': stitched array, 'table': merged AnnData or None}``; also
    registered on ``sdata`` when given.

    ``join_labels=True`` morphologically closes the cut stripe between the
    pieces of each stitched group (disk radius ``join_close_radius``),
    filling only genuine background pixels so each group becomes one
    connected component (reference ``_join_stitched_labels``,
    /root/reference/src/squidpy/experimental/im/_stitched_labels.py:99-137).
    """
    from squidpy_tpu.experimental._sdata import is_sdata, resolve_element

    _check_strategy(merge_strategy)
    if is_sdata(labels):
        sdata = labels
        labels = resolve_element(sdata, labels_key, tree="labels", scale=scale, what="labels")
    if qc_table is None and sdata is not None:
        qc_table = sdata.tables[qc_table_key or f"{labels_key}_qc"]
    if qc_table is None:
        raise ValueError(
            "make_stitched_labels needs the stitch-group table: pass `qc_table=` "
            "(or an sdata holding it) — run `assign_stitch_groups` first."
        )
    obs = qc_table.obs
    if "stitch_group_id" not in obs:
        raise KeyError("`stitch_group_id` not found; run `assign_stitch_groups` first.")
    label_col = "label" if "label" in obs.columns else "label_id"
    if label_col not in obs.columns:
        raise KeyError("QC table is missing the `label` column.")
    labels_arr = np.asarray(labels).squeeze()

    mapping = {
        int(lab): int(gid)
        for lab, gid in zip(obs[label_col].to_numpy(), obs["stitch_group_id"].to_numpy())
        if int(lab) != int(gid)
    }
    stitched = _apply_lut(labels_arr, mapping)
    logg.info(f"Stitched `{len(mapping)}` labels into their groups")
    if join_labels and mapping:
        stitched = _join_stitched_labels(stitched, set(mapping.values()), join_close_radius)

    table = _collapse_table(qc_table, merge_strategy, label_col) if write_table else None

    if sdata is not None and inplace:
        if hasattr(sdata, "labels"):
            sdata.labels[labels_key_added or f"{labels_key}_stitched"] = stitched
        if table is not None and hasattr(sdata, "tables"):
            sdata.tables[table_key_added or f"{labels_key}_stitched_table"] = table
    return {"labels": stitched, "table": table}
