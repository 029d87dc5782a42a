"""Spatial scatter / segmentation plots.

Functional counterpart of /root/reference/src/squidpy/pl/_spatial.py:397-470
and _spatial_utils.py: scatter observations at their spatial coordinates over
the tissue image (when present under ``uns['spatial']``), colored by obs
categories or gene expression; ``spatial_segment`` overlays segmentation
masks.
"""

from __future__ import annotations

from collections.abc import Sequence
from pathlib import Path
from typing import Any

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
from scipy import sparse as sp

from squidpy_tpu._constants._pkg_constants import Key
from squidpy_tpu.gr._utils import extract_adata_if_sdata
from squidpy_tpu.pl._utils import _get_palette, save_fig

__all__ = ["spatial_scatter", "spatial_segment"]


def _get_color_vector(adata: Any, color: str | None, layer: str | None = None) -> tuple[Any, bool]:
    """Values to color by: obs column (categorical or numeric) or gene."""
    if color is None:
        return None, False
    if color in adata.obs.columns:
        col = adata.obs[color]
        return col, isinstance(col.dtype, pd.CategoricalDtype)
    if color in adata.var_names:
        j = list(adata.var_names).index(color)
        X = adata.X if layer is None else adata.layers[layer]
        vec = X[:, j]
        if sp.issparse(vec):
            vec = np.asarray(vec.todense()).ravel()
        return np.asarray(vec).ravel(), False
    raise KeyError(f"Unable to find `{color}` in `adata.obs` or `adata.var_names`.")


def _get_image_and_scale(adata: Any, library_id: str | None, img_res_key: str) -> tuple[Any, float, float]:
    if Key.uns.spatial not in adata.uns or not adata.uns[Key.uns.spatial]:
        return None, 1.0, 1.0
    lid = library_id or next(iter(adata.uns[Key.uns.spatial]))
    entry = adata.uns[Key.uns.spatial].get(lid, {})
    images = entry.get(Key.uns.image_key, {})
    img = images.get(img_res_key)
    scalef = entry.get("scalefactors", {}).get(f"tissue_{img_res_key}_scalef", 1.0)
    spot_diam = entry.get("scalefactors", {}).get("spot_diameter_fullres", 10.0)
    return img, float(scalef), float(spot_diam)


def spatial_scatter(
    adata: Any,
    shape: str | None = "circle",
    color: str | Sequence[str] | None = None,
    library_id: str | None = None,
    library_key: str | None = None,
    spatial_key: str = Key.obsm.spatial,
    img: bool = True,
    img_res_key: str = "hires",
    layer: str | None = None,
    size: float | None = None,
    cmap: str = "viridis",
    palette: Any = None,
    alpha: float = 1.0,
    legend_loc: str = "right margin",
    title: str | Sequence[str] | None = None,
    axis_label: Sequence[str] | None = None,
    figsize: tuple[float, float] | None = None,
    dpi: int | None = None,
    ax: Any = None,
    save: str | Path | None = None,
    **kwargs: Any,
) -> None:
    """Scatter observations in spatial coordinates, optionally over the image."""
    adata = extract_adata_if_sdata(adata)
    if spatial_key not in adata.obsm:
        raise KeyError(f"Spatial basis `{spatial_key}` not found in `adata.obsm`.")
    coords = np.asarray(adata.obsm[spatial_key])[:, :2].astype(float)

    colors = [color] if (color is None or isinstance(color, str)) else list(color)
    titles = [title] * len(colors) if (title is None or isinstance(title, str)) else list(title)

    background, scalef, spot_diam = _get_image_and_scale(adata, library_id, img_res_key) if img else (None, 1.0, 10.0)
    plot_coords = coords * (scalef if background is not None else 1.0)
    if size is None:
        size = max((spot_diam * scalef / 2.0) ** 2 * np.pi / 20.0, 4.0) if background is not None else 8.0

    if ax is None:
        fig, axes = plt.subplots(1, len(colors), figsize=figsize or (5 * len(colors), 5), dpi=dpi, squeeze=False)
        axes = axes.ravel()
    else:
        axes = np.atleast_1d(ax)
        fig = axes[0].figure

    for a, col_name, ttl in zip(axes, colors, titles):
        if background is not None:
            a.imshow(np.asarray(background))
        values, is_cat = _get_color_vector(adata, col_name, layer)
        if values is None:
            a.scatter(plot_coords[:, 0], plot_coords[:, 1], s=size, alpha=alpha, **kwargs)
        elif is_cat:
            palette_map = _get_palette(adata, col_name, palette=palette)
            for cat in values.cat.categories:
                m = np.asarray(values == cat)
                a.scatter(
                    plot_coords[m, 0], plot_coords[m, 1], s=size, alpha=alpha,
                    color=palette_map.get(cat), label=str(cat), **kwargs,
                )
            if legend_loc:
                a.legend(fontsize=7, loc="center left", bbox_to_anchor=(1.0, 0.5), frameon=False)
        else:
            scp = a.scatter(plot_coords[:, 0], plot_coords[:, 1], c=values, s=size, alpha=alpha, cmap=cmap, **kwargs)
            fig.colorbar(scp, ax=a)
        if background is None:
            a.invert_yaxis()
        a.set_title(ttl if ttl is not None else (col_name or ""))
        a.set_xlabel("spatial1" if axis_label is None else axis_label[0])
        a.set_ylabel("spatial2" if axis_label is None else axis_label[1])
        a.set_aspect("equal")
    if save is not None:
        save_fig(fig, save)


def spatial_segment(
    adata: Any,
    color: str | Sequence[str] | None = None,
    library_id: str | None = None,
    library_key: str | None = None,
    seg_cell_id: str | None = None,
    seg: bool = True,
    seg_key: str = Key.uns.image_seg_key,
    spatial_key: str = Key.obsm.spatial,
    img_res_key: str = "hires",
    cmap: str = "viridis",
    palette: Any = None,
    figsize: tuple[float, float] | None = None,
    dpi: int | None = None,
    ax: Any = None,
    save: str | Path | None = None,
    **kwargs: Any,
) -> None:
    """Plot segmentation masks colored by an observation annotation.

    Requires ``uns['spatial'][library_id]['images'][seg_key]`` (the
    segmentation label image) and ``seg_cell_id`` — the obs column holding
    each observation's label id in that image.
    """
    adata = extract_adata_if_sdata(adata)
    if seg_cell_id is None:
        raise ValueError("Please specify `seg_cell_id`.")
    lid = library_id or next(iter(adata.uns[Key.uns.spatial]))
    entry = adata.uns[Key.uns.spatial][lid]
    seg_img = np.asarray(entry[Key.uns.image_key][seg_key]).squeeze()
    cell_ids = np.asarray(adata.obs[seg_cell_id], dtype=np.int64)

    colors = [color] if (color is None or isinstance(color, str)) else list(color)
    if ax is None:
        fig, axes = plt.subplots(1, len(colors), figsize=figsize or (5 * len(colors), 5), dpi=dpi, squeeze=False)
        axes = axes.ravel()
    else:
        axes = np.atleast_1d(ax)
        fig = axes[0].figure

    max_label = int(seg_img.max())
    for a, col_name in zip(axes, colors):
        values, is_cat = _get_color_vector(adata, col_name)
        lut = np.zeros((max_label + 1, 4))
        if values is None:
            lut[cell_ids[cell_ids <= max_label]] = (0.3, 0.5, 0.8, 1.0)
        elif is_cat:
            palette_map = _get_palette(adata, col_name, palette=palette)
            for cid, val in zip(cell_ids, values):
                if cid <= max_label:
                    c = palette_map.get(val, (0.5, 0.5, 0.5))
                    lut[cid] = plt.matplotlib.colors.to_rgba(c)
        else:
            import matplotlib as mpl

            norm = mpl.colors.Normalize(vmin=np.nanmin(values), vmax=np.nanmax(values))
            mapper = plt.get_cmap(cmap)
            for cid, val in zip(cell_ids, np.asarray(values, dtype=float)):
                if cid <= max_label:
                    lut[cid] = mapper(norm(val))
        rgba = lut[np.clip(seg_img, 0, max_label)]
        rgba[seg_img == 0] = (0, 0, 0, 1)
        a.imshow(rgba, **kwargs)
        a.set_title(col_name or "")
        a.axis("off")
    if save is not None:
        save_fig(fig, save)
