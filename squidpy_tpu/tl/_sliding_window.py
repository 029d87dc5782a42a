"""Sliding-window assignment of observations to spatial grid windows.

API/semantics parity with /root/reference/src/squidpy/tl/_sliding_window.py:18-180:
non-overlapping windows produce one ordered categorical assignment column;
overlapping windows produce one boolean membership column per window.
"""

from __future__ import annotations

from itertools import product
from typing import Any

import numpy as np
import pandas as pd

from squidpy_tpu.gr._utils import _save_data, extract_adata_if_sdata
from squidpy_tpu.utils import logg

__all__ = ["sliding_window"]


def _window_coords(adata: Any, coord_columns: tuple[str, str], spatial_key: str) -> pd.DataFrame:
    """Locate the (x, y) columns: explicit obs columns win over obsm."""
    x_col, y_col = coord_columns
    if x_col in adata.obs.columns and y_col in adata.obs.columns:
        return adata.obs.loc[:, [x_col, y_col]].copy()
    if spatial_key in adata.obsm:
        xy = np.asarray(adata.obsm[spatial_key])[:, :2]
        return pd.DataFrame(xy, index=adata.obs.index, columns=[x_col, y_col])
    raise ValueError(
        f"Coordinates not found. Provide `{coord_columns}` in `adata.obs` or specify a "
        f"suitable `spatial_key` in `adata.obsm`."
    )


def _auto_window_size(xy: np.ndarray, target_windows: float = 4.0) -> int:
    """Pick a window size that tiles the larger coordinate extent into
    ``target_windows`` windows, widened by ~1% (divide by 3.95 rather than 4)
    so cells sitting exactly on the max border don't spill into a sliver
    extra window with only 1-2 members."""
    extent = float(np.max(np.ptp(xy, axis=0)))
    return max(int(extent / (target_windows - 0.05)), 1)


def sliding_window(
    adata: Any,
    library_key: str | None = None,
    window_size: int | None = None,
    overlap: int = 0,
    coord_columns: tuple[str, str] = ("globalX", "globalY"),
    sliding_window_key: str = "sliding_window_assignment",
    spatial_key: str = "spatial",
    drop_partial_windows: bool = False,
    copy: bool = False,
    *,
    table_key: str | None = None,
) -> pd.DataFrame | None:
    """Divide a tissue slice into regularly shaped spatially contiguous windows."""
    if overlap < 0:
        raise ValueError("Overlap must be non-negative.")

    adata = extract_adata_if_sdata(adata, table_key=table_key)
    if copy:
        adata = adata.copy()

    coords = _window_coords(adata, coord_columns, spatial_key)
    x_col, y_col = coord_columns

    if window_size is None:
        window_size = _auto_window_size(coords.to_numpy())
    if window_size <= 0:
        raise ValueError("Window size must be larger than 0.")

    if library_key is not None and library_key not in adata.obs:
        raise ValueError(f"Library key '{library_key}' not found in adata.obs")
    libraries = [None] if library_key is None else adata.obs[library_key].unique()

    if sliding_window_key in adata.obs:
        logg.warning(f"Overwriting existing column '{sliding_window_key}' in adata.obs.")

    out = pd.DataFrame(index=adata.obs.index)
    for lib in libraries:
        lib_coords = coords if lib is None else coords.loc[np.asarray(adata.obs[library_key] == lib)]
        windows = _calculate_window_corners(
            min_x=lib_coords[x_col].min(),
            max_x=lib_coords[x_col].max(),
            min_y=lib_coords[y_col].min(),
            max_y=lib_coords[y_col].max(),
            window_size=window_size,
            overlap=overlap,
            drop_partial_windows=drop_partial_windows,
        )
        lib_prefix = f"{lib}_" if lib is not None else ""
        for idx, window in windows.iterrows():
            inside = (
                (lib_coords[x_col] >= window["x_start"])
                & (lib_coords[x_col] <= window["x_end"])
                & (lib_coords[y_col] >= window["y_start"])
                & (lib_coords[y_col] <= window["y_end"])
            )
            members = lib_coords.index[inside]
            if overlap == 0:
                out.loc[members, sliding_window_key] = f"{lib_prefix}window_{idx}"
            else:
                col = f"{sliding_window_key}_{lib_prefix}window_{idx}"
                out.loc[members, col] = True
                out[col] = out[col].fillna(False).astype(bool)

    if overlap == 0:
        out[sliding_window_key] = pd.Categorical(
            out[sliding_window_key],
            ordered=True,
            categories=sorted(
                out[sliding_window_key].dropna().unique(),
                key=lambda x: int(x.split("_")[-1]),
            ),
        )

    out[x_col] = coords[x_col]
    out[y_col] = coords[y_col]

    if copy:
        return out
    for col_name, col_data in out.items():
        _save_data(adata, attr="obs", key=col_name, data=col_data)


def _calculate_window_corners(
    min_x: float,
    max_x: float,
    min_y: float,
    max_y: float,
    window_size: float,
    overlap: float = 0,
    drop_partial_windows: bool = False,
) -> pd.DataFrame:
    """Corner coordinates of all windows covering the bounding box."""
    if overlap < 0:
        raise ValueError("Overlap must be non-negative.")
    if overlap >= window_size:
        raise ValueError("Overlap must be less than the window size.")

    step = window_size - overlap
    x_starts = np.arange(min_x, max_x, step)
    y_starts = np.arange(min_y, max_y, step)
    windows = pd.DataFrame(list(product(x_starts, y_starts)), columns=["x_start", "y_start"])
    windows["x_end"] = windows["x_start"] + window_size
    windows["y_end"] = windows["y_start"] + window_size

    if drop_partial_windows:
        keep = (windows["x_end"] <= max_x) & (windows["y_end"] <= max_y)
        windows = windows[keep]
    else:
        windows["x_end"] = windows["x_end"].clip(upper=max_x)
        windows["y_end"] = windows["y_end"].clip(upper=max_y)
    return windows.reset_index(drop=True)[["x_start", "x_end", "y_start", "y_end"]]
