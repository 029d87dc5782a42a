"""Tiled per-cell image featurization (WSI-scale).

Functional counterpart of
/root/reference/src/squidpy/experimental/im/_calculate_image_features.py:874-1156:
a centroid pass assigns every segmented cell to exactly one tile, tiles are
read with halo margins, non-owned cells are zeroed, and per-cell features
(morphology regionprops + per-channel intensity stats, optionally per-cell
texture) are computed — here through the device segment-reduction kernels
(:func:`squidpy_tpu.ops.features.regionprops`) instead of cp_measure/skimage,
with tiles streamed through :func:`squidpy_tpu.experimental.im.run_tiled`.
Results assemble into an AnnData (one obs per cell).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import numpy as np
import pandas as pd

from squidpy_tpu._core.anndata import AnnData
from squidpy_tpu.experimental.im._tiling import (
    TileSpec,
    build_tile_specs,
    compute_cell_info_tiled,
    extract_tile,
    run_tiled,
)
from squidpy_tpu.ops.features import regionprops
from squidpy_tpu.utils import logg

__all__ = ["calculate_image_features"]

_DEFAULT_MORPHOLOGY = (
    "area",
    "bbox_area",
    "eccentricity",
    "equivalent_diameter",
    "extent",
    "major_axis_length",
    "minor_axis_length",
    "perimeter",
)
_INTENSITY = ("mean_intensity", "max_intensity", "min_intensity")


def _featurize_tile(
    spec: TileSpec,
    image: Any,
    labels: Any,
    morphology_props: Sequence[str],
    intensity: bool,
    n_channels: int,
) -> pd.DataFrame:
    tile_image, tile_labels = extract_tile(image, labels, spec)
    if tile_labels.max() == 0:
        return pd.DataFrame()
    props = ["label", "centroid", *morphology_props]
    res = regionprops(tile_labels, props)
    cy0, cx0 = spec.crop[0], spec.crop[1]
    data: dict[str, np.ndarray] = {"label": res["label"]}
    data["centroid_y"] = res["centroid-0"] + cy0
    data["centroid_x"] = res["centroid-1"] + cx0
    for p in morphology_props:
        data[p] = res[p]
    if intensity:
        img2d = tile_image if tile_image.ndim == 2 else None
        if tile_image.ndim == 3:
            # channels may be leading (c, y, x) or trailing (y, x, c)
            if tile_image.shape[0] == n_channels:
                channels = [tile_image[c] for c in range(n_channels)]
            else:
                channels = [tile_image[..., c] for c in range(n_channels)]
        else:
            channels = [img2d]
        for c, chan in enumerate(channels):
            ires = regionprops(tile_labels, ["label", *_INTENSITY], intensity_image=chan)
            for p in _INTENSITY:
                data[f"ch{c}_{p}"] = ires[p]
    return pd.DataFrame(data)


def calculate_image_features(
    image: Any,
    labels: Any,
    *,
    tile_size: int = 2048,
    overlap_margin: int | str = "auto",
    morphology_props: Sequence[str] = _DEFAULT_MORPHOLOGY,
    intensity: bool = True,
    n_jobs: int = 1,
    key_added: str = "cell_features",
    sdata: Any = None,
    table_key: str | None = None,
) -> AnnData:
    """Per-cell features over a (possibly on-disk) image + label pair.

    ``image`` is ``(y, x)``, ``(c, y, x)`` or ``(y, x, c)``; ``labels`` is a
    ``(y, x)`` integer segmentation. Both only need to support numpy-style
    slicing, so memory-mapped/h5py arrays stream tile by tile. Returns an
    AnnData with one obs per cell (centroids in ``obsm['spatial']``), and
    attaches it to ``sdata.tables[key_added]`` when a SpatialData-like object
    is passed.
    """
    lab_shape = labels.shape[-2:]
    start = logg.info("Computing cell centroids (streaming pass)")
    cell_info = compute_cell_info_tiled(labels, chunk_size=max(tile_size, 2048))
    logg.info(f"Found `{len(cell_info)}` cells", time=start)
    if not cell_info:
        raise ValueError("No cells found in the label image.")

    specs = build_tile_specs(lab_shape, cell_info, tile_size=tile_size, overlap_margin=overlap_margin)

    img_shape = image.shape
    if len(img_shape) == 2:
        n_channels = 1
    else:
        n_channels = img_shape[0] if img_shape[-2:] == tuple(lab_shape) else img_shape[-1]

    start = logg.info(f"Featurizing `{len(specs)}` tiles")
    frames = run_tiled(
        specs,
        _featurize_tile,
        n_jobs=n_jobs,
        scatter=(image, labels, tuple(morphology_props), intensity, n_channels),
        desc="tiles",
    )
    df = pd.concat([f for f in frames if len(f)], axis=0, ignore_index=True)
    df = df.sort_values("label").reset_index(drop=True)

    obs = pd.DataFrame({"label": df["label"].astype(np.int64)})
    obs.index = pd.Index([f"cell_{int(v)}" for v in df["label"]])
    feature_cols = [c for c in df.columns if c not in ("label", "centroid_y", "centroid_x")]
    adata = AnnData(
        X=df[feature_cols].to_numpy(dtype=np.float64),
        obs=obs,
        var=pd.DataFrame(index=pd.Index(feature_cols)),
    )
    adata.obsm["spatial"] = df[["centroid_x", "centroid_y"]].to_numpy(dtype=np.float64)
    adata.uns["cell_features"] = {"tile_size": tile_size, "n_tiles": len(specs)}
    logg.info("Finish", time=start)

    if sdata is not None and hasattr(sdata, "tables"):
        sdata.tables[key_added] = adata
    return adata
