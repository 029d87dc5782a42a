"""Plot gene expression against distance to an anchor (spline fit).

Functional counterpart of /root/reference/src/squidpy/pl/_var_by_distance.py:27-:
scatter var values along the normalized anchor distance from the design
matrix, with a smoothed trend line.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
from scipy import sparse as sp

from squidpy_tpu.gr._utils import extract_adata_if_sdata
from squidpy_tpu.pl._utils import save_fig

__all__ = ["var_by_distance"]


def var_by_distance(
    adata: Any,
    var: str | list[str],
    anchor_key: str,
    design_matrix_key: str = "design_matrix",
    color: str | None = None,
    covariate: str | None = None,
    order: int = 5,
    show_scatter: bool = True,
    line_palette: Any = None,
    scatter_palette: str = "viridis",
    dpi: int | None = None,
    figsize: tuple[float, float] | None = None,
    save: str | Path | None = None,
    title: str | None = None,
    axis_label: str | None = None,
    return_ax: bool = False,
    **kwargs: Any,
) -> Any:
    """Plot variables against distance to an anchor point with a spline trend."""
    adata = extract_adata_if_sdata(adata)
    if design_matrix_key not in adata.obsm:
        raise KeyError(f"Design matrix `{design_matrix_key}` not found; run `squidpy_tpu.tl.var_by_distance` first.")
    df = adata.obsm[design_matrix_key]
    if anchor_key not in df.columns:
        raise KeyError(f"Anchor `{anchor_key}` not found in the design matrix.")
    variables = [var] if isinstance(var, str) else list(var)

    fig, axes = plt.subplots(1, len(variables), figsize=figsize or (5 * len(variables), 4), dpi=dpi, squeeze=False)
    dist = np.asarray(df[anchor_key], dtype=float)

    for ax, v in zip(axes.ravel(), variables):
        if v in adata.obs.columns:
            values = np.asarray(adata.obs[v], dtype=float)
        elif v in adata.var_names:
            j = list(adata.var_names).index(v)
            col = adata.X[:, j]
            values = np.asarray(col.todense()).ravel() if sp.issparse(col) else np.asarray(col).ravel()
        else:
            raise KeyError(f"Unable to find `{v}` in `adata.obs` or `adata.var_names`.")
        ok = np.isfinite(dist) & np.isfinite(values)
        if show_scatter:
            ax.scatter(dist[ok], values[ok], s=6, alpha=0.4, c=values[ok], cmap=scatter_palette, **kwargs)
        # smooth trend: polynomial fit of the requested order
        if ok.sum() > order + 1:
            coeffs = np.polyfit(dist[ok], values[ok], deg=order)
            xs = np.linspace(np.nanmin(dist[ok]), np.nanmax(dist[ok]), 200)
            ax.plot(xs, np.polyval(coeffs, xs), color="crimson", lw=2)
        ax.set_xlabel(axis_label or f"distance to {anchor_key}")
        ax.set_ylabel(v)
        ax.set_title(title or v)
    if save is not None:
        save_fig(fig, save)
    if return_ax:
        return axes.ravel()[0] if len(variables) == 1 else axes.ravel()
