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

__all__ = ["save_fig", "extract", "ALayer", "_get_palette", "_heatmap", "_points_inside_triangles"]


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


def _dendrogram_linkage(arr: NDArrayA, method: str = "ward") -> Any:
    """Hierarchical-clustering linkage of the rows (NaN-safe)."""
    from scipy.cluster import hierarchy as sch

    clean = np.nan_to_num(np.asarray(arr, dtype=float), nan=0.0, posinf=0.0, neginf=0.0)
    return sch.linkage(clean, method=method)


def _dendrogram_order(arr: NDArrayA, method: str = "ward") -> NDArrayA:
    """Row order from hierarchical clustering."""
    from scipy.cluster import hierarchy as sch

    if arr.shape[0] < 3:
        return np.arange(arr.shape[0])
    return np.asarray(sch.leaves_list(_dendrogram_linkage(arr, method)))


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
    category_colors: Any | None = None,
    show_dendrogram: bool = True,
    **kwargs: Any,
) -> mpl.figure.Figure:
    """Annotated heatmap with category color strips and a dendrogram axis.

    Same visual anatomy as the reference's annotated heatmap
    (/root/reference/src/squidpy/pl/_utils.py:537-627): the matrix image,
    a left color strip for row categories and a top strip for column
    categories (``category_colors``: one color per input label, reordered
    with the matrix), a right colorbar, and — when ``method`` is given — rows
    and columns reordered by hierarchical clustering with the dendrogram
    drawn above.
    """
    from mpl_toolkits.axes_grid1 import make_axes_locatable

    matrix = np.asarray(matrix, dtype=float)
    row_labels = list(row_labels)
    col_labels = list(col_labels)
    square = len(row_labels) == len(col_labels)
    colors = None
    if category_colors is not None:
        colors = [mpl.colors.to_rgba(c) for c in category_colors]

    link = None
    if method is not None and matrix.shape[0] >= 3:
        link = _dendrogram_linkage(matrix, method)
        from scipy.cluster import hierarchy as sch

        order = np.asarray(sch.leaves_list(link))
        matrix = matrix[order][:, order] if square else matrix[order]
        row_labels = [row_labels[i] for i in order]
        if square:
            col_labels = [col_labels[i] for i in order]
        if colors is not None:
            colors = [colors[i] for i in order]

    if ax is None:
        fig, ax = plt.subplots(figsize=figsize or (6, 5), dpi=dpi, constrained_layout=True)
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
    if annotate:
        for i in range(matrix.shape[0]):
            for j in range(matrix.shape[1]):
                ax.text(j, i, f"{matrix[i, j]:.2f}", ha="center", va="center", fontsize=7)

    divider = make_axes_locatable(ax)
    title_ax = ax

    if colors is not None:
        strip = np.asarray(colors).reshape(-1, 1, 4)
        row_cax = divider.append_axes("left", size="3%", pad=0.02)
        row_cax.imshow(strip, aspect="auto")
        row_cax.set_xticks([])
        row_cax.set_yticks([])
        ax.set_yticks([])  # labels live on the strip side now
        row_cax.set_yticks(range(len(row_labels)))
        row_cax.set_yticklabels(row_labels)
        if square:
            col_cax = divider.append_axes("top", size="3%", pad=0.02)
            col_cax.imshow(strip.transpose(1, 0, 2), aspect="auto")
            col_cax.set_xticks([])
            col_cax.set_yticks([])
            title_ax = col_cax

    if link is not None and show_dendrogram:
        from scipy.cluster import hierarchy as sch

        dend_ax = divider.append_axes("top", size="15%", pad=0.05)
        with plt.rc_context({"lines.linewidth": 1.0}):
            sch.dendrogram(link, ax=dend_ax, no_labels=True, color_threshold=0, above_threshold_color="black")
        dend_ax.axis("off")
        title_ax = dend_ax

    if title:
        title_ax.set_title(title)
    cax = divider.append_axes("right", size="4%", pad=0.1)
    fig.colorbar(im, cax=cax, **(cbar_kwargs or {}))
    return fig


def _min_max_norm(vec: Any) -> NDArrayA:
    """Min-max normalize a 1D vector to [0, 1] (constant vectors map to 1)."""
    from scipy.sparse import issparse

    if issparse(vec):
        vec = vec.toarray().squeeze()
    vec = np.asarray(vec, dtype=np.float64)
    if vec.ndim != 1:
        raise ValueError(f"Expected `1` dimension, found `{vec.ndim}`.")
    mx, mn = np.nanmax(vec), np.nanmin(vec)
    return np.ones_like(vec) if np.isclose(mn, mx) else (vec - mn) / (mx - mn)


def _coerce_dense(res: Any, fmt: str, *, normalize: bool = False) -> tuple[Any, str | None]:
    """Densify / categorize a fetched vector (reference pl/_utils.py:223-261
    ``_ensure_dense_vector``): strings/bools/low-cardinality ints become
    categorical; everything else a dense float vector, optionally min-max
    normalized."""
    from scipy.sparse import issparse

    if res is None:
        return None, None
    if isinstance(res, pd.Series):
        if isinstance(res.dtype, pd.CategoricalDtype):
            return res, fmt
        if pd.api.types.is_string_dtype(res) or pd.api.types.is_object_dtype(res) or pd.api.types.is_bool_dtype(res):
            return res.astype("category"), fmt
        if pd.api.types.is_integer_dtype(res):
            unique = res.unique()
            if len(unique) <= 2 and (set(unique) & {0, 1}):
                return res.astype(bool).astype("category"), fmt
            if len(unique) <= len(res) // 100:
                return res.astype("category"), fmt
        elif not pd.api.types.is_numeric_dtype(res):
            raise TypeError(f"Unable to process `pandas.Series` of type `{res.dtype}`.")
        res = res.to_numpy()
    elif issparse(res):
        res = res.toarray()
    elif not isinstance(res, (np.ndarray, list, tuple)):
        raise TypeError(f"Unable to process result of type `{type(res).__name__}`.")
    res = np.asarray(np.squeeze(res))
    if res.ndim != 1:
        raise ValueError(f"Expected 1-dimensional array, found `{res.ndim}`.")
    return (_min_max_norm(res) if normalize else res), fmt


class ALayer:
    """Switchable view over ``adata``'s layers / raw / libraries for
    interactive plotting widgets (reference: pl/_utils.py:269-470).

    Tracks a current ``layer`` (None = ``X``), a ``raw`` toggle (mutually
    exclusive with ``layer``), and a current ``library_id``; ``get_obs`` /
    ``get_var`` / ``get_obsm`` fetch display-ready dense vectors.
    """

    VALID_ATTRIBUTES = ("obs", "var", "obsm")

    def __init__(
        self,
        adata: Any,
        library_ids: Any,
        is_raw: bool = False,
        palette: str | None = None,
    ):
        if is_raw and adata.raw is None:
            raise AttributeError("Attribute `.raw` is `None`.")
        self._adata = adata
        self._library_id = library_ids[0]
        self._ix_to_group = dict(enumerate(library_ids))
        self._layer: str | None = None
        self._previous_layer: str | None = None
        self._raw = is_raw
        self._palette = palette

    @property
    def adata(self) -> Any:
        return self._adata

    @property
    def layer(self) -> str | None:
        return self._layer

    @layer.setter
    def layer(self, layer: str | None = None) -> None:
        if layer not in (None,) + tuple(self.adata.layers.keys()):
            raise KeyError(
                f"Invalid layer `{layer}`. Valid options are `{[None] + sorted(self.adata.layers.keys())}`."
            )
        self._previous_layer = layer
        self.raw = False  # raw setter installs `_previous_layer`

    @property
    def raw(self) -> bool:
        return self._raw

    @raw.setter
    def raw(self, is_raw: bool) -> None:
        if is_raw:
            if self.adata.raw is None:
                raise AttributeError("Attribute `.raw` is `None`.")
            self._previous_layer = self.layer
            self._layer = None
        else:
            self._layer = self._previous_layer
        self._raw = is_raw

    @property
    def palette(self) -> str | None:
        return self._palette

    @property
    def library_id(self) -> Any:
        return self._library_id

    @library_id.setter
    def library_id(self, library_id: Any) -> None:
        if isinstance(library_id, int):
            library_id = self._ix_to_group[library_id]
        self._library_id = library_id

    def get_obs(self, name: str, *, normalize: bool = False) -> tuple[Any, str | None]:
        """Fetch an ``adata.obs`` column as a display-ready vector."""
        if name not in self.adata.obs.columns:
            raise KeyError(f"Key `{name}` not found in `adata.obs`.")
        return _coerce_dense(self.adata.obs[name], name, normalize=normalize)

    def get_var(self, name: str, *, normalize: bool = False) -> tuple[Any, str | None]:
        """Fetch one gene's expression from ``X`` / current layer / raw."""
        adata = self.adata.raw if self.raw else self.adata
        names = list(adata.var_names)
        if name not in names:
            raise KeyError(f"Key `{name}` not found in `adata.{'raw.' if self.raw else ''}var_names`.")
        ix = names.index(name)
        if self.raw:
            X = adata.X
        elif self.layer is not None:
            X = self.adata.layers[self.layer]
        else:
            X = self.adata.X
        col = X[:, ix]
        fmt = f"{name} ({'raw' if self.raw else (self.layer or 'X')})"
        return _coerce_dense(np.asarray(col.todense()).ravel() if hasattr(col, "todense") else col, fmt, normalize=normalize)

    def get_obsm(self, name: str, index: int | str = 0, *, normalize: bool = False) -> tuple[Any, str | None]:
        """Fetch one column of an ``adata.obsm`` entry."""
        if name not in self.adata.obsm:
            raise KeyError(f"Unable to find key `{name!r}` in `adata.obsm`.")
        res = self.adata.obsm[name]
        if isinstance(res, pd.DataFrame):
            col = res[index] if isinstance(index, str) else res.iloc[:, int(index)]
            label = index if isinstance(index, str) else res.columns[int(index)]
            return _coerce_dense(col, f"{name}:{label}", normalize=normalize)
        if isinstance(index, str):
            raise KeyError(f"Key `{index}` not found in `adata.obsm[{name!r}]`.")
        return _coerce_dense(np.asarray(res)[:, int(index)], f"{name}:{index}", normalize=normalize)

    def get_items(self, attr: str) -> tuple[str, ...]:
        """Valid keys for ``attr`` in :attr:`VALID_ATTRIBUTES`."""
        adata = self.adata.raw if (self.raw and attr == "var") else self.adata
        if attr == "obs":
            return tuple(map(str, adata.obs.columns))
        if attr == "obsm":
            return tuple(map(str, adata.obsm.keys()))
        return tuple(map(str, adata.var_names))

    def __repr__(self) -> str:
        return f"ALayer(layer={self.layer!r}, raw={self.raw}, library_id={self.library_id!r})"

    def __str__(self) -> str:
        return repr(self)
