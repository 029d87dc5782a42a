"""Experimental plotting: QC tile maps and tiling-QC overlays."""

from __future__ import annotations

from pathlib import Path
from typing import Any

import matplotlib.pyplot as plt
import numpy as np

from squidpy_tpu.pl._utils import save_fig

__all__ = ["qc_image", "tiling_qc"]


def _kde_panel(ax: Any, values: np.ndarray, tissue_mask: np.ndarray | None, name: str) -> None:
    """Distribution panel: KDE curves split by tissue/background when the QC
    table carries an ``is_tissue`` call (reference anatomy:
    /root/reference/src/squidpy/experimental/pl/_qc_image.py:120-165)."""
    from scipy.stats import gaussian_kde

    lo, hi = float(np.min(values)), float(np.max(values))
    if lo >= hi:
        ax.text(0.5, 0.5, f"Constant value: {lo:.4f}", ha="center", va="center",
                transform=ax.transAxes)
    else:
        xs = np.linspace(lo, hi, 200)
        parts = (
            [("Background", values[~tissue_mask]), ("Tissue", values[tissue_mask])]
            if tissue_mask is not None
            else [(None, values)]
        )
        for label, vals in parts:
            if len(vals) > 1 and np.std(vals) > 0:
                density = gaussian_kde(vals)(xs)
                ax.plot(xs, density, label=label, alpha=0.7)
                ax.fill_between(xs, density, alpha=0.3)
        if tissue_mask is not None:
            ax.legend(fontsize=8)
    ax.set_xlabel(name.replace("_", " ").title())
    ax.set_ylabel("Density")
    ax.set_title("Distribution")
    ax.grid(True, alpha=0.3)


def _stats_panel(ax: Any, values: np.ndarray, name: str) -> None:
    ax.axis("off")
    pct = {p: np.percentile(values, p) for p in (5, 25, 50, 75, 95)}
    text = (
        f"Raw {name.replace('_', ' ').title()} Statistics:\n\n"
        f"Count: {len(values):,}\n"
        f"Mean: {np.mean(values):.4f}\n"
        f"Std: {np.std(values):.4f}\n"
        f"Min: {np.min(values):.4f}\n"
        f"Max: {np.max(values):.4f}\n\n"
        "Percentiles:\n"
        + "".join(f"{p}%: {v:.4f}\n" for p, v in pct.items())
        + f"\nNon-zero: {np.count_nonzero(values):,}\n"
        f"Zero: {int(np.sum(values == 0)):,}"
    )
    ax.text(0.05, 0.95, text, transform=ax.transAxes, fontsize=9,
            verticalalignment="top", fontfamily="monospace")


def qc_image(
    qc_adata: Any,
    image_key: str | None = None,
    metrics: list[str] | None = None,
    cmap: str = "viridis",
    figsize: tuple[float, float] | None = None,
    dpi: int | None = None,
    return_ax: bool = False,
    save: str | Path | None = None,
    **kwargs: Any,
) -> np.ndarray | None:
    """Summary view of tile-QC metrics: one row per metric with a spatial
    tile map, a tissue/background KDE distribution, and a statistics panel
    (companion to :func:`squidpy_tpu.experimental.im.qc_image`; same panel
    anatomy as the reference's experimental/pl/_qc_image.py:45-199).

    SpatialData form — ``qc_image(sdata, image_key, ...)`` (reference:
    experimental/pl/_qc_image.py:14-56) — reads the QC table written by
    :func:`squidpy_tpu.experimental.im.qc_image` at
    ``sdata.tables[f"qc_img_{image_key}"]``.
    """
    from squidpy_tpu.experimental._sdata import is_sdata

    if is_sdata(qc_adata):
        sdata = qc_adata
        # same fallback the writer uses for single-image sdatas with no
        # explicit image_key (im/_qc.py stores "qc_img_image")
        table_key = f"qc_img_{image_key or 'image'}"
        tables = getattr(sdata, "tables", None) or {}
        if table_key not in tables:
            raise ValueError(
                f"No QC data found for image '{image_key}'. Run experimental.im.qc_image() first."
            )
        qc_adata = tables[table_key]
    elif image_key is not None:
        # with a QC AnnData the second positional is image_key, not metrics —
        # silently dropping it would plot every metric instead of the
        # requested ones
        raise TypeError(
            f"`image_key`={image_key!r} requires a SpatialData input; with a QC "
            "AnnData, pass metrics via the keyword `metrics=[...]`."
        )
    if "qc_image" not in qc_adata.uns:
        raise ValueError("No qc_image metadata found. Run experimental.im.qc_image() first.")
    ny, nx = qc_adata.uns["qc_image"]["grid_shape"]
    metrics = metrics or list(qc_adata.var_names)
    # accept bare metric names for the reference's qc_-prefixed columns
    have = set(qc_adata.var_names)
    metrics = [m if m in have else f"qc_{m}" if f"qc_{m}" in have else m for m in metrics]
    unknown = [m for m in metrics if m not in have]
    if unknown:
        raise ValueError(f"Metric(s) {unknown} not found. Available: {list(qc_adata.var_names)}.")
    if "is_tissue" in qc_adata.obs:
        col = qc_adata.obs["is_tissue"]
        # "True"/"False" string categorical (the reference's convention) or
        # a plain boolean column — both accepted
        tissue = (
            np.asarray(col) == "True"
            if col.dtype == object or str(col.dtype) == "category"
            else np.asarray(col, dtype=bool)
        )
    else:
        tissue = None
    fig, axes = plt.subplots(
        len(metrics), 3, figsize=figsize or (12, 4 * len(metrics)), dpi=dpi, squeeze=False
    )
    for row, m in zip(axes, metrics):
        vals = np.asarray(qc_adata.obs_vector(m), dtype=float)
        im = row[0].imshow(vals.reshape(ny, nx), cmap=cmap, **kwargs)
        row[0].set_title(m.replace("_", " ").title())
        fig.colorbar(im, ax=row[0], shrink=0.8)
        row[0].axis("off")
        _kde_panel(row[1], vals, tissue, m)
        _stats_panel(row[2], vals, m)
    fig.tight_layout()
    if save is not None:
        save_fig(fig, save)
    return axes if return_ax else None


def tiling_qc(
    qc_adata: Any,
    labels_key: str | None = None,
    qc_key: str | None = None,
    score_col: str = "nhood_outlier_fraction",
    cmap: str = "RdYlGn_r",
    figsize: tuple[float, float] | None = None,
    *,
    labels: Any | None = None,
    dpi: int | None = None,
    save: str | Path | None = None,
    **kwargs: Any,
) -> None:
    """Cells colored by their tiling-artifact score, highlighting flagged
    cells (companion to
    :func:`squidpy_tpu.experimental.tl.calculate_tiling_qc`).

    SpatialData form — ``tiling_qc(sdata, labels_key, qc_key, score_col,
    cmap)`` with the reference's defaults (experimental/pl/_tiling_qc.py:
    12-26: ``score_col='nhood_outlier_fraction'``, ``cmap='RdYlGn_r'``) —
    reads the QC table at ``sdata.tables[qc_key or f"{labels_key}_qc"]``
    and overlays the labels element. The array form takes a QC AnnData plus
    an optional ``labels`` array.
    """
    from squidpy_tpu.experimental._sdata import is_sdata, resolve_scale

    if is_sdata(qc_adata):
        sdata = qc_adata
        if labels_key is None and qc_key is None:
            raise ValueError(
                "Pass `labels_key` (the labels element the QC table was computed "
                "for) or an explicit `qc_key`."
            )
        table_key = qc_key if qc_key is not None else f"{labels_key}_qc"
        tables = getattr(sdata, "tables", None) or {}
        if table_key not in tables:
            raise ValueError(
                f"No tiling-QC table `{table_key}` in sdata.tables. "
                "Run experimental.tl.calculate_tiling_qc() first."
            )
        qc_adata = tables[table_key]
        if labels is None and labels_key in (getattr(sdata, "labels", None) or {}):
            # the QC table's coordinates are FULL-resolution (calculate_
            # tiling_qc resolves scale='full'): the overlay must be too, or
            # a multiscale element's coarsest level shrinks into the corner
            labels = resolve_scale(sdata.labels[labels_key], "full")
    elif labels_key is not None:
        # an array in the labels_key slot means a misbound positional call
        # (old array form was tiling_qc(qc_adata, labels_arr)) — the overlay
        # would otherwise silently disappear
        if not isinstance(labels_key, str):
            raise TypeError(
                "The second positional argument is `labels_key` (a str selecting "
                "sdata.labels); pass a labels ARRAY via the keyword `labels=...`."
            )
        raise TypeError(
            f"`labels_key`={labels_key!r} requires a SpatialData input; with a QC "
            "AnnData, pass the labels array via `labels=...`."
        )
    if score_col not in qc_adata.obs:
        raise ValueError(
            f"Score column `{score_col}` not in the QC table. "
            f"Available: {sorted(qc_adata.obs.columns)}."
        )
    coords = np.asarray(qc_adata.obsm["spatial"])
    scores = np.asarray(qc_adata.obs[score_col], dtype=float)
    fig, ax = plt.subplots(figsize=figsize or (6, 6), dpi=dpi)
    if labels is not None:
        ax.imshow(np.asarray(labels).squeeze() > 0, cmap="gray", alpha=0.3)
    sc = ax.scatter(coords[:, 0], coords[:, 1], c=scores, s=8, cmap=cmap, **kwargs)
    if "tile_cut" in qc_adata.obs:
        flagged = np.asarray(qc_adata.obs["tile_cut"], dtype=bool)
        ax.scatter(coords[flagged, 0], coords[flagged, 1], facecolors="none",
                   edgecolors="red", s=40, label="tile_cut")
        ax.legend()
    fig.colorbar(sc, ax=ax, label=score_col)
    ax.invert_yaxis()
    ax.set_title("Tiling QC")
    if save is not None:
        save_fig(fig, save)
