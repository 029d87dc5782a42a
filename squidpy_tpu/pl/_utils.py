"""Plotting utilities: palettes, heatmaps, figure saving, obsm extraction.

Functional counterpart of /root/reference/src/squidpy/pl/_utils.py and
_color_utils.py (annotated heatmaps with optional dendrograms, categorical
palettes, ``extract``).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import matplotlib as mpl
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

from squidpy_tpu._constants._pkg_constants import Key
from squidpy_tpu.utils import NDArrayA, logg

__all__ = ["save_fig", "extract", "_get_palette", "_heatmap", "_points_inside_triangles"]


def _points_inside_triangles(points: NDArrayA, triangles: NDArrayA) -> NDArrayA:
    """Vectorized point-in-triangle tests for interactive selection.

    ``points``: (n, 2); ``triangles``: (m, 3, 2). Returns a boolean (n,) mask
    of points inside ANY triangle (reference: pl/_utils.py:179-205, numba
    prange loop — here one broadcasted barycentric-sign test).
    """
    points = np.asarray(points, dtype=float)
    triangles = np.asarray(triangles, dtype=float)
    a, b, c = triangles[:, 0], triangles[:, 1], triangles[:, 2]  # (m, 2) each

    def sign(p1: NDArrayA, p2: NDArrayA, p3: NDArrayA) -> NDArrayA:
        # (n, m) cross-product z for each (point, triangle-edge)
        return (p1[:, None, 0] - p3[None, :, 0]) * (p2[None, :, 1] - p3[None, :, 1]) - (
            p2[None, :, 0] - p3[None, :, 0]
        ) * (p1[:, None, 1] - p3[None, :, 1])

    d1 = sign(points, a, b)
    d2 = sign(points, b, c)
    d3 = sign(points, c, a)
    has_neg = (d1 < 0) | (d2 < 0) | (d3 < 0)
    has_pos = (d1 > 0) | (d2 > 0) | (d3 > 0)
    inside = ~(has_neg & has_pos)  # (n, m)
    return inside.any(axis=1)


def save_fig(fig: mpl.figure.Figure, path: str | Path, make_dir: bool = True, ext: str = "png", **kwargs: Any) -> None:
    """Save a figure, creating directories as needed."""
    path = Path(path)
    if path.suffix == "":
        path = path.with_suffix(f".{ext}")
    if make_dir:
        path.parent.mkdir(parents=True, exist_ok=True)
    logg.info(f"Saving figure to `{path}`")
    fig.savefig(path, bbox_inches="tight", **kwargs)


def extract(
    adata: Any,
    obsm_key: str | list[str] = "img_features",
    prefix: str | list[str] | None = None,
) -> Any:
    """Copy ``obsm`` columns into ``obs`` for plotting (returns a new AnnData).

    Reference: pl/_utils.py:100-160.
    """
    if isinstance(obsm_key, str):
        obsm_key = [obsm_key]
    if prefix is not None and isinstance(prefix, str):
        prefix = [prefix]
    if prefix is not None and len(prefix) != len(obsm_key):
        raise ValueError(f"Expected `{len(obsm_key)}` prefixes, found `{len(prefix)}`.")

    out = adata.copy()
    for i, key in enumerate(obsm_key):
        if key not in out.obsm:
            raise KeyError(f"Key `{key}` not found in `adata.obsm`.")
        obsm = out.obsm[key]
        if isinstance(obsm, pd.DataFrame):
            df = obsm
        else:
            arr = np.asarray(obsm)
            df = pd.DataFrame(arr, index=out.obs.index, columns=[str(j) for j in range(arr.shape[1])])
        pre = (prefix[i] + "_") if prefix is not None else (key + "_" if len(obsm_key) > 1 else "")
        for col in df.columns:
            name = f"{pre}{col}" if pre else str(col)
            if name in out.obs:
                logg.warning(f"Overwriting `adata.obs[{name!r}]`")
            out.obs[name] = np.asarray(df[col])
    return out


_DEFAULT_CMAPS = ["tab10", "tab20", "tab20b", "tab20c"]


def _get_palette(
    adata: Any,
    cluster_key: str,
    categories: Any | None = None,
    palette: str | list[str] | None = None,
) -> dict[Any, Any]:
    """Category → color mapping, honoring ``uns['{cluster_key}_colors']``."""
    if categories is None:
        categories = adata.obs[cluster_key].cat.categories
    colors_key = Key.uns.colors(cluster_key)
    if palette is None and colors_key in adata.uns:
        colors = list(adata.uns[colors_key])
        if len(colors) >= len(categories):
            return dict(zip(categories, colors))
    if isinstance(palette, (list, tuple)):
        return dict(zip(categories, palette))
    n = len(categories)
    cmap_name = palette if isinstance(palette, str) else ("tab10" if n <= 10 else "tab20" if n <= 20 else "gist_rainbow")
    cmap = plt.get_cmap(cmap_name)
    if getattr(cmap, "N", 256) < 32:  # qualitative
        colors = [cmap(i % cmap.N) for i in range(n)]
    else:
        colors = [cmap(i / max(n - 1, 1)) for i in range(n)]
    return dict(zip(categories, colors))


def _dendrogram_order(arr: NDArrayA) -> NDArrayA:
    """Row order from hierarchical clustering (ward on euclidean)."""
    from scipy.cluster import hierarchy as sch

    if arr.shape[0] < 3:
        return np.arange(arr.shape[0])
    clean = np.nan_to_num(arr, nan=0.0, posinf=0.0, neginf=0.0)
    link = sch.linkage(clean, method="ward")
    return np.asarray(sch.leaves_list(link))


def _heatmap(
    matrix: NDArrayA,
    row_labels: Any,
    col_labels: Any,
    title: str = "",
    cmap: str = "viridis",
    cbar_kwargs: dict[str, Any] | None = None,
    method: str | None = None,
    annotate: bool = False,
    ax: Any = None,
    figsize: tuple[float, float] | None = None,
    dpi: int | None = None,
    vmin: float | None = None,
    vmax: float | None = None,
    vcenter: float | None = None,
    **kwargs: Any,
) -> mpl.figure.Figure:
    """Annotated heatmap with optional dendrogram reordering."""
    matrix = np.asarray(matrix, dtype=float)
    row_labels = list(row_labels)
    col_labels = list(col_labels)
    if method is not None:
        order = _dendrogram_order(matrix)
        matrix = matrix[order][:, order] if len(row_labels) == len(col_labels) else matrix[order]
        row_labels = [row_labels[i] for i in order]
        if len(col_labels) == len(order):
            col_labels = [col_labels[i] for i in order]

    if ax is None:
        fig, ax = plt.subplots(figsize=figsize or (6, 5), dpi=dpi)
    else:
        fig = ax.figure

    norm = None
    if vcenter is not None:
        norm = mpl.colors.TwoSlopeNorm(vcenter=vcenter, vmin=vmin, vmax=vmax)
    im = ax.imshow(matrix, cmap=cmap, norm=norm, vmin=None if norm else vmin, vmax=None if norm else vmax, **kwargs)
    ax.set_xticks(range(len(col_labels)))
    ax.set_xticklabels(col_labels, rotation=90)
    ax.set_yticks(range(len(row_labels)))
    ax.set_yticklabels(row_labels)
    if title:
        ax.set_title(title)
    if annotate:
        for i in range(matrix.shape[0]):
            for j in range(matrix.shape[1]):
                ax.text(j, i, f"{matrix[i, j]:.2f}", ha="center", va="center", fontsize=7)
    fig.colorbar(im, ax=ax, **(cbar_kwargs or {}))
    return fig
