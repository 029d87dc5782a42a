"""Tile-grid generation over images and Visium spots.

Functional counterpart of /root/reference/src/squidpy/experimental/im/_make_tiles.py:163-392:
regular (or spot-centered) tile grids classified by tissue coverage into
``background`` / ``partial_tissue`` / ``tissue``. Array-first: works on any
image/mask array or an ImageContainer; attaches the tile table to
``sdata.shapes`` when a SpatialData-like object is provided.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd

from squidpy_tpu.experimental.im._detect_tissue import detect_tissue
from squidpy_tpu.utils import logg

__all__ = ["make_tiles", "make_tiles_from_spots"]


def _tissue_fractions(mask: np.ndarray, tiles: pd.DataFrame) -> np.ndarray:
    integral = np.zeros((mask.shape[0] + 1, mask.shape[1] + 1), dtype=np.int64)
    np.cumsum(np.cumsum(mask.astype(np.int64), axis=0), axis=1, out=integral[1:, 1:])
    y0 = tiles["pixel_y0"].to_numpy().clip(0, mask.shape[0])
    y1 = tiles["pixel_y1"].to_numpy().clip(0, mask.shape[0])
    x0 = tiles["pixel_x0"].to_numpy().clip(0, mask.shape[1])
    x1 = tiles["pixel_x1"].to_numpy().clip(0, mask.shape[1])
    counts = integral[y1, x1] - integral[y0, x1] - integral[y1, x0] + integral[y0, x0]
    areas = np.maximum((y1 - y0) * (x1 - x0), 1)
    return counts / areas


def _classify(frac: np.ndarray, min_tissue_fraction: float) -> pd.Categorical:
    labels = np.where(frac <= 0, "background", np.where(frac >= min_tissue_fraction, "tissue", "partial_tissue"))
    return pd.Categorical(labels, categories=["background", "partial_tissue", "tissue"])


def make_tiles(
    image: Any,
    *,
    tissue_mask: np.ndarray | None = None,
    tile_size: tuple[int, int] = (224, 224),
    center_grid_on_tissue: bool = False,
    min_tissue_fraction: float = 1.0,
    sdata: Any = None,
    image_key: str = "image",
    image_mask_key: str | None = None,
    tissue_mask_key: str | None = None,
    scale: str = "full",
    new_shapes_key: str | None = None,
    preview: bool = False,
    **detect_kwargs: Any,
) -> pd.DataFrame:
    """Regular grid of tiles classified by tissue coverage.

    ``preview=True`` renders the image with the tile grid overlaid, colored
    by classification.

    Returns a DataFrame with one row per tile: ``pixel_y0/x0/y1/x1``,
    ``tile_row``/``tile_col``, ``tissue_fraction``, ``tile_classification``.
    """
    # reference-surface compatibility: first arg may be SpatialData-like,
    # with the image/mask selected by keys (reference signature,
    # /root/reference/src/squidpy/experimental/im/_make_tiles.py:163-180)
    from squidpy_tpu.experimental._sdata import is_sdata, resolve_element

    if is_sdata(image):
        sdata = image
        image = resolve_element(sdata, image_key, tree="images", scale=scale, what="image")
    mask_key = tissue_mask_key or image_mask_key
    if tissue_mask is None and mask_key is not None and sdata is not None:
        tissue_mask = np.asarray(
            resolve_element(sdata, mask_key, tree="labels", scale=scale, what="tissue_mask")
        ).squeeze() > 0
    arr = np.asarray(image).squeeze()
    h, w = (arr.shape[:2]) if arr.ndim >= 2 else arr.shape
    if tissue_mask is None:
        tissue_mask = detect_tissue(arr, **detect_kwargs)
    tissue_mask = np.asarray(tissue_mask).squeeze().astype(bool)
    if tissue_mask.shape != (h, w):
        # the stored mask may live at a different pyramid level than the
        # image (detect_tissue defaults to scale='auto') — align it before
        # the tile fractions, or full-res tile coords index past the small
        # mask and every tile silently classifies as background
        from squidpy_tpu.experimental.im._stain import _nearest_resize_mask

        tissue_mask = _nearest_resize_mask(tissue_mask, (h, w))

    ty, tx = (tile_size, tile_size) if np.isscalar(tile_size) else tile_size
    off_y = off_x = 0
    if center_grid_on_tissue and tissue_mask.any():
        ys, xs = np.nonzero(tissue_mask)
        off_y = int(ys.min()) % ty
        off_x = int(xs.min()) % tx

    rows = []
    r = 0
    for y0 in range(off_y, h, ty):
        c = 0
        for x0 in range(off_x, w, tx):
            rows.append((r, c, y0, x0, min(y0 + ty, h), min(x0 + tx, w)))
            c += 1
        r += 1
    tiles = pd.DataFrame(rows, columns=["tile_row", "tile_col", "pixel_y0", "pixel_x0", "pixel_y1", "pixel_x1"])
    tiles.index = pd.Index([f"tile_{t.tile_row}_{t.tile_col}" for t in tiles.itertuples()])
    tiles["tissue_fraction"] = _tissue_fractions(tissue_mask, tiles)
    tiles["tile_classification"] = _classify(tiles["tissue_fraction"].to_numpy(), min_tissue_fraction)
    logg.info(
        f"Created `{len(tiles)}` tiles "
        f"({(tiles['tile_classification'] == 'tissue').sum()} tissue, "
        f"{(tiles['tile_classification'] == 'partial_tissue').sum()} partial)"
    )
    if sdata is not None and hasattr(sdata, "shapes"):
        sdata.shapes[new_shapes_key or f"{image_key}_tiles"] = tiles
    if preview:
        _preview_tiles(arr, tiles)
    return tiles


def _preview_tiles(image: np.ndarray | None, tiles: pd.DataFrame) -> None:
    """Render the image with the tile grid colored by classification
    (reference renders via sdata.pl, _make_tiles.py:219-221)."""
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    fig, ax = plt.subplots(figsize=(7, 7))
    if image is not None:
        ax.imshow(image, cmap="gray" if image.ndim == 2 else None)
    colors = {"tissue": "tab:green", "partial_tissue": "tab:orange", "background": "tab:red"}
    classes = (
        tiles["tile_classification"]
        if "tile_classification" in tiles
        else pd.Series("tissue", index=tiles.index)
    )
    for (_, t), cls in zip(tiles.iterrows(), classes):
        ax.add_patch(
            Rectangle(
                (t["pixel_x0"], t["pixel_y0"]),
                t["pixel_x1"] - t["pixel_x0"],
                t["pixel_y1"] - t["pixel_y0"],
                fill=False, edgecolor=colors.get(cls, "grey"), lw=0.8,
            )
        )
    handles = [plt.Line2D([], [], color=c, label=k) for k, c in colors.items()]
    ax.legend(handles=handles, fontsize=8, loc="upper right")
    ax.set_title(f"{len(tiles)} tiles")


def make_tiles_from_spots(
    spots: np.ndarray,
    *,
    image: Any | None = None,
    tissue_mask: np.ndarray | None = None,
    tile_size: int | None = None,
    min_tissue_fraction: float = 1.0,
    sdata: Any = None,
    spots_key: str = "spots",
    image_key: str | None = None,
    tissue_mask_key: str | None = None,
    scale: str = "full",
    new_shapes_key: str | None = None,
    preview: bool = False,
    **detect_kwargs: Any,
) -> pd.DataFrame:
    """One tile per Visium spot, sized from the vertical spot spacing.

    ``spots`` is an ``(n, 2)`` array of (x, y) centers, or a SpatialData-like
    whose ``shapes[spots_key]`` holds x/y columns.
    """
    from squidpy_tpu.experimental._sdata import is_sdata, resolve_element

    if is_sdata(spots):
        sdata = spots
        table = pd.DataFrame(sdata.shapes[spots_key])
        cols = {c.lower(): c for c in table.columns}
        spots = table[[cols["x"], cols["y"]]].to_numpy(dtype=float)
        if image is None and image_key is not None:
            image = resolve_element(sdata, image_key, tree="images", scale=scale, what="image")
        if tissue_mask is None and tissue_mask_key is not None:
            tissue_mask = np.asarray(
                resolve_element(sdata, tissue_mask_key, tree="labels", scale=scale, what="tissue_mask")
            ).squeeze() > 0
    spots = np.asarray(spots, dtype=float)
    if tile_size is None:
        ys = np.unique(np.round(spots[:, 1]))
        diffs = np.diff(np.sort(ys))
        diffs = diffs[diffs > 0]
        tile_size = int(round(diffs.min())) if len(diffs) else 224
    half = tile_size // 2

    tiles = pd.DataFrame(
        {
            "pixel_y0": (spots[:, 1] - half).astype(int),
            "pixel_x0": (spots[:, 0] - half).astype(int),
            "pixel_y1": (spots[:, 1] - half).astype(int) + tile_size,
            "pixel_x1": (spots[:, 0] - half).astype(int) + tile_size,
        },
        index=pd.Index([f"spot_{i}" for i in range(len(spots))]),
    )
    if tissue_mask is None and image is not None:
        tissue_mask = detect_tissue(np.asarray(image).squeeze(), **detect_kwargs)
    if tissue_mask is not None:
        tissue_mask = np.asarray(tissue_mask).squeeze().astype(bool)
        if image is not None:
            img_hw = np.asarray(image).squeeze().shape[:2]
            if tissue_mask.shape != tuple(img_hw):
                # stored masks may live at a coarser pyramid level — align
                # to the image grid the spot coordinates live in
                from squidpy_tpu.experimental.im._stain import _nearest_resize_mask

                tissue_mask = _nearest_resize_mask(tissue_mask, img_hw)
        tiles["tissue_fraction"] = _tissue_fractions(tissue_mask, tiles)
        tiles["tile_classification"] = _classify(tiles["tissue_fraction"].to_numpy(), min_tissue_fraction)
    if sdata is not None and hasattr(sdata, "shapes"):
        sdata.shapes[new_shapes_key or f"{spots_key}_tiles"] = tiles
    if preview:
        img_arr = np.asarray(image).squeeze() if image is not None else None
        _preview_tiles(img_arr, tiles)
    return tiles
