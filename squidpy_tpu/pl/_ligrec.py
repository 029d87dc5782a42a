"""Receptor-ligand dotplot.

Functional counterpart of /root/reference/src/squidpy/pl/_ligrec.py:28-427:
dot color = mean expression of the interacting pair, dot size = −log10
p-value, rows = interactions, columns = cluster pairs.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

from squidpy_tpu._constants._pkg_constants import Key
from squidpy_tpu.pl._utils import save_fig

__all__ = ["ligrec"]


def ligrec(
    adata: Any,
    cluster_key: str | None = None,
    source_groups: str | list[str] | None = None,
    target_groups: str | list[str] | None = None,
    means_range: tuple[float, float] = (-np.inf, np.inf),
    pvalue_threshold: float = 1.0,
    remove_empty_interactions: bool = True,
    remove_nonsig_interactions: bool = False,
    dendrogram: str | None = None,
    alpha: float = 0.001,
    swap_axes: bool = False,
    title: str | None = None,
    figsize: tuple[float, float] | None = None,
    dpi: int | None = None,
    cmap: str = "viridis",
    save: str | Path | None = None,
    **kwargs: Any,
) -> None:
    """Dotplot of the ligrec permutation-test result.

    ``adata`` may be the result dict from ``gr.ligrec(copy=True)`` or an
    AnnData holding it under ``uns['{cluster_key}_ligrec']``.
    """
    if isinstance(adata, Mapping) or (isinstance(adata, dict)):
        res = adata
    else:
        if cluster_key is None:
            raise ValueError("Please specify `cluster_key` when passing an AnnData object.")
        key = Key.uns.ligrec(cluster_key)
        if key not in adata.uns:
            raise KeyError(f"Unable to find `adata.uns[{key!r}]`. Please run `squidpy_tpu.gr.ligrec` first.")
        res = adata.uns[key]
    if not {"means", "pvalues"} <= set(res.keys()):
        raise ValueError("Expected the result to contain 'means' and 'pvalues'.")
    if not 0 <= alpha <= 1:
        raise ValueError(f"Expected `alpha` to be in range `[0, 1]`, found `{alpha}`.")
    if len(means_range) != 2:
        raise ValueError(f"Expected `means_range` to be a sequence of size `2`, found `{len(means_range)}`.")

    means = res["means"].astype(float)
    pvalues = res["pvalues"].astype(float)

    # reject unknown source/target groups up front (reference contract:
    # pl/_ligrec.py filters through scanpy's categorical machinery which
    # raises on unknown categories)
    present_src = {c[0] for c in means.columns}
    present_tgt = {c[1] for c in means.columns}
    for name, wanted, present in (
        ("source_groups", source_groups, present_src),
        ("target_groups", target_groups, present_tgt),
    ):
        if wanted is None:
            continue
        req = {wanted} if isinstance(wanted, str) else set(wanted)
        unknown = sorted(req - present)
        if unknown:
            raise ValueError(f"Invalid cluster(s) in `{name}`: {unknown}. Valid: {sorted(present)}.")

    # column filtering by source/target groups
    def _filter_cols(df: pd.DataFrame) -> pd.DataFrame:
        cols = df.columns
        keep = np.ones(len(cols), dtype=bool)
        if source_groups is not None:
            src = [source_groups] if isinstance(source_groups, str) else list(source_groups)
            keep &= np.asarray([c[0] in src for c in cols])
        if target_groups is not None:
            tgt = [target_groups] if isinstance(target_groups, str) else list(target_groups)
            keep &= np.asarray([c[1] in tgt for c in cols])
        return df.loc[:, cols[keep]]

    means = _filter_cols(means)
    pvalues = _filter_cols(pvalues)

    # row filtering
    within = (means >= means_range[0]) & (means <= means_range[1])
    sig = pvalues <= pvalue_threshold
    mask = within & sig
    if remove_empty_interactions:
        keep_rows = means.notna().any(axis=1) & (means != 0).any(axis=1)
        means, pvalues, mask = means[keep_rows], pvalues[keep_rows], mask[keep_rows]
    if remove_nonsig_interactions:
        keep_rows = (pvalues <= alpha).any(axis=1)
        means, pvalues, mask = means[keep_rows], pvalues[keep_rows], mask[keep_rows]
    if means.empty:
        raise ValueError("After filtering, no interactions remain.")

    # dendrogram-order rows (interactions) and/or columns (cluster pairs) by
    # Ward linkage over the mean-expression matrix (reference delegates to
    # scanpy's dendrogram machinery, /root/reference/src/squidpy/pl/_ligrec.py:229-265)
    if dendrogram is not None:
        valid = {"interacting_molecules", "interacting_clusters", "both"}
        if dendrogram not in valid:
            raise ValueError(f"Invalid `dendrogram` `{dendrogram}`. Valid: {sorted(valid)}.")
        from scipy.cluster import hierarchy as sch

        filled = np.nan_to_num(means.values.astype(float), nan=0.0)

        def _leaf_order(m: np.ndarray) -> np.ndarray:
            if m.shape[0] < 3:
                return np.arange(m.shape[0])
            return np.asarray(sch.leaves_list(sch.linkage(m, method="ward")))

        if dendrogram in ("interacting_molecules", "both"):
            order_r = _leaf_order(filled)
            means, pvalues, mask = means.iloc[order_r], pvalues.iloc[order_r], mask.iloc[order_r]
        if dendrogram in ("interacting_clusters", "both"):
            order_c = _leaf_order(np.nan_to_num(means.values.astype(float), nan=0.0).T)
            means, pvalues, mask = means.iloc[:, order_c], pvalues.iloc[:, order_c], mask.iloc[:, order_c]

    neglog = -np.log10(np.clip(pvalues.values, 1e-4, None))
    neglog = np.nan_to_num(neglog, nan=0.0)
    significant = np.nan_to_num(pvalues.values, nan=1.0) <= alpha

    n_rows, n_cols = means.shape
    if swap_axes:
        means = means.T
        mask = mask.T
        neglog = neglog.T
        significant = significant.T
        n_rows, n_cols = n_cols, n_rows

    fig, ax = plt.subplots(
        figsize=figsize or (max(4, n_cols * 0.4) + 2, max(3, n_rows * 0.3)), dpi=dpi
    )
    yy, xx = np.mgrid[0:n_rows, 0:n_cols]
    vals = means.values
    sizes = neglog
    shown = np.asarray(mask.values if hasattr(mask, "values") else mask, dtype=bool)
    # significant dots (p <= alpha) get a black outline, the reference
    # CustomDotplot's significance mark (/root/reference/src/squidpy/pl/_ligrec.py:70-96)
    edge = np.where(significant[shown], "black", "none")
    sc = ax.scatter(
        xx[shown], yy[shown],
        c=vals[shown],
        s=20 + 40 * sizes[shown],
        cmap=cmap,
        edgecolors=edge,
        linewidths=0.8,
        **kwargs,
    )
    ax.set_xticks(range(n_cols))
    ax.set_xticklabels([" | ".join(map(str, c)) if isinstance(c, tuple) else str(c) for c in means.columns], rotation=90, fontsize=7)
    ax.set_yticks(range(n_rows))
    ax.set_yticklabels([" | ".join(map(str, r)) if isinstance(r, tuple) else str(r) for r in means.index], fontsize=7)
    ax.invert_yaxis()
    ax.set_title(title or "Receptor-ligand test")
    cbar = fig.colorbar(sc, ax=ax)
    cbar.set_label("mean expression")
    # size legend for -log10 pvalues
    for ref in (1.0, 2.0, 3.0):
        ax.scatter([], [], s=20 + 40 * ref, c="grey", label=f"-log10(p)={ref:g}")
    ax.legend(loc="upper left", bbox_to_anchor=(1.25, 1.0), fontsize=7, frameon=False)
    if save is not None:
        save_fig(fig, save)
