"""Plots for graph statistics.

Functional counterpart of /root/reference/src/squidpy/pl/_graph.py:46-399:
``nhood_enrichment``, ``interaction_matrix``, ``centrality_scores``,
``ripley``, ``co_occurrence`` — each reads the ``uns`` key its statistic
wrote and renders it with matplotlib/seaborn.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Literal

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

from squidpy_tpu._constants._pkg_constants import Key
from squidpy_tpu.gr._utils import _assert_categorical_obs, extract_adata_if_sdata
from squidpy_tpu.pl._utils import _get_palette, _heatmap, save_fig

__all__ = ["nhood_enrichment", "interaction_matrix", "centrality_scores", "ripley", "co_occurrence"]


def _get_data(adata: Any, cluster_key: str, func_name: str, attr: str = "uns", **kwargs: Any) -> Any:
    key = getattr(Key.uns, func_name)(cluster_key, **kwargs) if kwargs else getattr(Key.uns, func_name)(cluster_key)
    try:
        return adata.uns[key]
    except KeyError:
        raise KeyError(
            f"Unable to find the data in `adata.uns[{key!r}]`. "
            f"Please run `squidpy_tpu.gr.{func_name}` first."
        ) from None


def nhood_enrichment(
    adata: Any,
    cluster_key: str,
    mode: Literal["zscore", "count"] = "zscore",
    annotate: bool = False,
    method: str | None = None,
    title: str | None = None,
    palette: Any = None,
    cmap: str = "viridis",
    cbar_kwargs: dict[str, Any] | None = None,
    figsize: tuple[float, float] | None = None,
    dpi: int | None = None,
    ax: Any = None,
    save: str | Path | None = None,
    **kwargs: Any,
) -> None:
    """Neighborhood enrichment heatmap (z-score or counts)."""
    adata = extract_adata_if_sdata(adata)
    _assert_categorical_obs(adata, key=cluster_key)
    data = _get_data(adata, cluster_key, "nhood_enrichment")
    arr = np.asarray(data[mode if mode in data else "zscore"])
    cats = adata.obs[cluster_key].cat.categories
    palette_map = _get_palette(adata, cluster_key, palette=palette)
    fig = _heatmap(
        arr, cats, cats,
        title=title if title is not None else f"Neighborhood enrichment ({mode})",
        cmap=cmap, cbar_kwargs=cbar_kwargs, method=method, annotate=annotate,
        category_colors=[palette_map[c] for c in cats],
        ax=ax, figsize=figsize, dpi=dpi, **kwargs,
    )
    if save is not None:
        save_fig(fig, save)


def interaction_matrix(
    adata: Any,
    cluster_key: str,
    annotate: bool = False,
    method: str | None = None,
    title: str | None = None,
    palette: Any = None,
    cmap: str = "viridis",
    cbar_kwargs: dict[str, Any] | None = None,
    figsize: tuple[float, float] | None = None,
    dpi: int | None = None,
    ax: Any = None,
    save: str | Path | None = None,
    **kwargs: Any,
) -> None:
    """Cluster interaction-matrix heatmap."""
    adata = extract_adata_if_sdata(adata)
    _assert_categorical_obs(adata, key=cluster_key)
    arr = np.asarray(_get_data(adata, cluster_key, "interaction_matrix"))
    cats = adata.obs[cluster_key].cat.categories
    palette_map = _get_palette(adata, cluster_key, palette=palette)
    fig = _heatmap(
        arr, cats, cats,
        title=title if title is not None else "Interaction matrix",
        cmap=cmap, cbar_kwargs=cbar_kwargs, method=method, annotate=annotate,
        category_colors=[palette_map[c] for c in cats],
        ax=ax, figsize=figsize, dpi=dpi, **kwargs,
    )
    if save is not None:
        save_fig(fig, save)


def centrality_scores(
    adata: Any,
    cluster_key: str,
    score: str | list[str] | None = None,
    legend_kwargs: dict[str, Any] | None = None,
    palette: Any = None,
    figsize: tuple[float, float] | None = None,
    dpi: int | None = None,
    save: str | Path | None = None,
    **kwargs: Any,
) -> None:
    """Scatter plots of per-cluster centrality scores."""
    adata = extract_adata_if_sdata(adata)
    _assert_categorical_obs(adata, key=cluster_key)
    df = _get_data(adata, cluster_key, "centrality_scores")
    if not isinstance(df, pd.DataFrame):
        raise TypeError(f"Expected a DataFrame, found `{type(df)}`.")
    scores = list(df.columns) if score is None else ([score] if isinstance(score, str) else list(score))
    palette_map = _get_palette(adata, cluster_key, categories=df.index, palette=palette)

    fig, axes = plt.subplots(1, len(scores), figsize=figsize or (4 * len(scores), 4), dpi=dpi, squeeze=False)
    for ax, sc in zip(axes.ravel(), scores):
        for cat in df.index:
            ax.scatter(df.loc[cat, sc], str(cat), color=palette_map.get(cat), **kwargs)
        ax.set_title(sc.replace("_", " "))
        ax.set_xlabel("value")
    if save is not None:
        save_fig(fig, save)


def ripley(
    adata: Any,
    cluster_key: str,
    mode: Literal["F", "G", "L"] = "F",
    plot_sims: bool = True,
    palette: Any = None,
    legend_kwargs: dict[str, Any] | None = None,
    figsize: tuple[float, float] | None = None,
    dpi: int | None = None,
    ax: Any = None,
    save: str | Path | None = None,
    **kwargs: Any,
) -> None:
    """Ripley statistic curves per cluster with the simulation envelope."""
    adata = extract_adata_if_sdata(adata)
    _assert_categorical_obs(adata, key=cluster_key)
    res = _get_data(adata, cluster_key, "ripley", mode=mode)
    obs_df = res[f"{mode}_stat"]
    sims_df = res["sims_stat"]
    palette_map = _get_palette(adata, cluster_key, palette=palette)

    if ax is None:
        fig, ax = plt.subplots(figsize=figsize or (6, 4), dpi=dpi)
    else:
        fig = ax.figure
    for cat, sub in obs_df.groupby(cluster_key, observed=True):
        ax.plot(sub["bins"], sub["stats"], label=str(cat), color=palette_map.get(cat), **kwargs)
    if plot_sims:
        grouped = sims_df.groupby("bins", observed=True)["stats"]
        lo, hi = grouped.quantile(0.025), grouped.quantile(0.975)
        ax.fill_between(lo.index, lo, hi, alpha=0.25, color="grey", label="sims 95%")
    ax.set_xlabel("distance")
    ax.set_ylabel(f"{mode}(t)")
    ax.set_title(f"Ripley's {mode}")
    ax.legend(**{"fontsize": 8, **(legend_kwargs or {})})
    if save is not None:
        save_fig(fig, save)


def co_occurrence(
    adata: Any,
    cluster_key: str,
    clusters: str | list[str] | None = None,
    palette: Any = None,
    figsize: tuple[float, float] | None = None,
    dpi: int | None = None,
    save: str | Path | None = None,
    legend_kwargs: dict[str, Any] | None = None,
    **kwargs: Any,
) -> None:
    """Co-occurrence probability ratio curves conditioned on each cluster."""
    adata = extract_adata_if_sdata(adata)
    _assert_categorical_obs(adata, key=cluster_key)
    data = _get_data(adata, cluster_key, "co_occurrence")
    occ = np.asarray(data["occ"])
    interval = np.asarray(data["interval"])[1:]
    cats = list(adata.obs[cluster_key].cat.categories)
    if clusters is None:
        clusters = cats
    elif isinstance(clusters, str):
        clusters = [clusters]
    palette_map = _get_palette(adata, cluster_key, palette=palette)

    fig, axes = plt.subplots(1, len(clusters), figsize=figsize or (5 * len(clusters), 4), dpi=dpi, squeeze=False)
    for ax, cond in zip(axes.ravel(), clusters):
        ci = cats.index(cond)
        for i, cat in enumerate(cats):
            ax.plot(interval, occ[i, ci, :], label=str(cat), color=palette_map.get(cat), **kwargs)
        ax.set_title(f"conditioned on {cond}")
        ax.set_xlabel("distance")
        ax.set_ylabel(r"$\frac{p(exp|cond)}{p(exp)}$")
        ax.legend(fontsize=7, **(legend_kwargs or {}))
    if save is not None:
        save_fig(fig, save)
