"""Plot gene expression against distance to an anchor (spline fit).

Functional counterpart of /root/reference/src/squidpy/pl/_var_by_distance.py:27-241:
scatter var values along the normalized anchor distance from the design
matrix, with a smoothed trend line; supports stacking several variables on
one axes and per-covariate-category regression lines.
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


def _var_values(adata: Any, v: str) -> np.ndarray:
    if v in adata.obs.columns:
        return np.asarray(adata.obs[v], dtype=float)
    if v in adata.var_names:
        j = list(adata.var_names).index(v)
        col = adata.X[:, j]
        return np.asarray(col.todense()).ravel() if sp.issparse(col) else np.asarray(col).ravel()
    raise KeyError(f"Unable to find `{v}` in `adata.obs` or `adata.var_names`.")


def _trend_line(
    ax: Any, x: np.ndarray, y: np.ndarray, order: int, color: Any, label: str | None,
    **plot_kwargs: Any,
) -> None:
    if len(x) > order + 1:
        coeffs = np.polyfit(x, y, deg=order)
        xs = np.linspace(np.nanmin(x), np.nanmax(x), 200)
        ax.plot(xs, np.polyval(coeffs, xs), **{"color": color, "lw": 2, "label": label, **plot_kwargs})


def _line_colors(n: int, palette: Any) -> list[Any]:
    if palette is None:
        cyc = plt.rcParams["axes.prop_cycle"].by_key().get("color", ["crimson"])
        return [cyc[i % len(cyc)] for i in range(n)]
    if isinstance(palette, str):
        cmap = plt.get_cmap(palette)
        return [cmap(i / max(n - 1, 1)) for i in range(n)]
    pal = list(palette)
    return [pal[i % len(pal)] for i in range(n)]


def var_by_distance(
    adata: Any,
    var: str | list[str],
    anchor_key: str,
    design_matrix_key: str = "design_matrix",
    stack_vars: bool = False,
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
    regplot_kwargs: dict[str, Any] | None = None,
    scatterplot_kwargs: dict[str, Any] | None = None,
    **kwargs: Any,
) -> Any:
    """Plot variables against distance to an anchor point with a spline trend.

    ``stack_vars`` overlays every variable's trend on one axes (legend by
    variable); ``covariate`` names a categorical obs column and draws one
    trend line per category (legend by category, colors from
    ``line_palette``). The two are mutually exclusive, matching the
    reference's contract.
    """
    adata = extract_adata_if_sdata(adata)
    if design_matrix_key not in adata.obsm:
        raise KeyError(f"Design matrix `{design_matrix_key}` not found; run `squidpy_tpu.tl.var_by_distance` first.")
    df = adata.obsm[design_matrix_key]
    if anchor_key not in df.columns:
        raise KeyError(f"Anchor `{anchor_key}` not found in the design matrix.")
    if stack_vars and covariate is not None:
        raise ValueError("`stack_vars=True` cannot be combined with `covariate` — one legend axis at a time.")
    reg_kw = dict(regplot_kwargs or {})
    sc_kw = {**(scatterplot_kwargs or {}), **kwargs}
    variables = [var] if isinstance(var, str) else list(var)
    if covariate is not None and covariate not in adata.obs.columns:
        raise KeyError(f"Covariate `{covariate}` not found in `adata.obs`.")

    dist = np.asarray(df[anchor_key], dtype=float)
    n_axes = 1 if stack_vars else len(variables)
    fig, axes = plt.subplots(1, n_axes, figsize=figsize or (5 * n_axes, 4), dpi=dpi, squeeze=False)

    if stack_vars:
        ax = axes.ravel()[0]
        colors = _line_colors(len(variables), line_palette)
        for v, c in zip(variables, colors):
            values = _var_values(adata, v)
            ok = np.isfinite(dist) & np.isfinite(values)
            if show_scatter:
                ax.scatter(dist[ok], values[ok], **{"s": 6, "alpha": 0.25, "color": c, **sc_kw})
            _trend_line(ax, dist[ok], values[ok], order, c, v, **reg_kw)
        ax.legend(frameon=False, fontsize=8)
        ax.set_xlabel(axis_label or f"distance to {anchor_key}")
        ax.set_ylabel("value")
        ax.set_title(title or " / ".join(variables))
    else:
        for ax, v in zip(axes.ravel(), variables):
            values = _var_values(adata, v)
            ok = np.isfinite(dist) & np.isfinite(values)
            if covariate is not None:
                cats = pd.Categorical(adata.obs[covariate])
                colors = _line_colors(len(cats.categories), line_palette)
                for cat, c in zip(cats.categories, colors):
                    sel = ok & np.asarray(cats == cat)
                    if show_scatter:
                        ax.scatter(dist[sel], values[sel], **{"s": 6, "alpha": 0.25, "color": c, **sc_kw})
                    _trend_line(ax, dist[sel], values[sel], order, c, str(cat), **reg_kw)
                ax.legend(title=covariate, frameon=False, fontsize=8)
            else:
                if show_scatter:
                    cvals = _var_values(adata, color) if color is not None else values
                    ax.scatter(dist[ok], values[ok], **{"s": 6, "alpha": 0.4, "c": cvals[ok], "cmap": scatter_palette, **sc_kw})
                _trend_line(ax, dist[ok], values[ok], order, "crimson", None, **reg_kw)
            ax.set_xlabel(axis_label or f"distance to {anchor_key}")
            ax.set_ylabel(v)
            ax.set_title(title or v)

    if save is not None:
        save_fig(fig, save)
    if return_ax:
        flat = axes.ravel()
        return flat[0] if len(flat) == 1 else flat
