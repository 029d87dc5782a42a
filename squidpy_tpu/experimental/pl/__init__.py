"""Experimental plotting: QC tile maps and tiling-QC overlays."""

from __future__ import annotations

from pathlib import Path
from typing import Any

import matplotlib.pyplot as plt
import numpy as np

from squidpy_tpu.pl._utils import save_fig

__all__ = ["qc_image", "tiling_qc"]


def qc_image(
    qc_adata: Any,
    metrics: list[str] | None = None,
    cmap: str = "viridis",
    figsize: tuple[float, float] | None = None,
    dpi: int | None = None,
    save: str | Path | None = None,
    **kwargs: Any,
) -> None:
    """Render per-tile QC scores as metric grids
    (companion to :func:`squidpy_tpu.experimental.im.qc_image`)."""
    ny, nx = qc_adata.uns["qc_image"]["grid_shape"]
    metrics = metrics or list(qc_adata.var_names)
    fig, axes = plt.subplots(1, len(metrics), figsize=figsize or (4 * len(metrics), 4), dpi=dpi, squeeze=False)
    for ax, m in zip(axes.ravel(), metrics):
        vals = qc_adata.obs_vector(m).reshape(ny, nx)
        im = ax.imshow(vals, cmap=cmap, **kwargs)
        ax.set_title(m)
        fig.colorbar(im, ax=ax, shrink=0.8)
        ax.axis("off")
    if save is not None:
        save_fig(fig, save)


def tiling_qc(
    qc_adata: Any,
    labels: Any | None = None,
    figsize: tuple[float, float] | None = None,
    dpi: int | None = None,
    save: str | Path | None = None,
    **kwargs: Any,
) -> None:
    """Scatter cells colored by their tile-cut score, highlighting flagged cells
    (companion to :func:`squidpy_tpu.experimental.tl.calculate_tiling_qc`)."""
    coords = np.asarray(qc_adata.obsm["spatial"])
    scores = np.asarray(qc_adata.obs["cut_score"], dtype=float)
    flagged = np.asarray(qc_adata.obs["tile_cut"], dtype=bool)
    fig, ax = plt.subplots(figsize=figsize or (6, 6), dpi=dpi)
    if labels is not None:
        ax.imshow(np.asarray(labels).squeeze() > 0, cmap="gray", alpha=0.3)
    sc = ax.scatter(coords[:, 0], coords[:, 1], c=scores, s=8, cmap="viridis", **kwargs)
    ax.scatter(coords[flagged, 0], coords[flagged, 1], facecolors="none", edgecolors="red", s=40, label="tile_cut")
    fig.colorbar(sc, ax=ax, label="cut_score")
    ax.invert_yaxis()
    ax.legend()
    ax.set_title("Tiling QC")
    if save is not None:
        save_fig(fig, save)
