"""Design matrix of distances to anchor points.

API/semantics parity with /root/reference/src/squidpy/tl/_var_by_distance.py:24-265:
per (library, anchor) minimum distances (KDTree), the reference's
normalization quirk (zero distances → NaN, minimum nonzero → 0, min-max
scale per slide), raw-distance columns, covariates, ``obsm['design_matrix']``.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
from sklearn.neighbors import KDTree

from squidpy_tpu.gr._utils import _save_data, extract_adata_if_sdata
from squidpy_tpu.utils import NDArrayA, logg

__all__ = ["var_by_distance"]


def var_by_distance(
    adata: Any,
    groups: str | list[str] | NDArrayA,
    cluster_key: str | None = None,
    library_key: str | None = None,
    library_id: str | list[str] | None = None,
    design_matrix_key: str = "design_matrix",
    covariates: str | list[str] | None = None,
    metric: str = "euclidean",
    spatial_key: str = "spatial",
    copy: bool = False,
    *,
    table_key: str | None = None,
) -> pd.DataFrame | None:
    """Build a design matrix of distances to anchor observation group(s)."""
    adata = extract_adata_if_sdata(adata, table_key=table_key)
    start = logg.info(f"Creating {design_matrix_key}")
    if metric != "euclidean":
        raise NotImplementedError(f"Only the `euclidean` metric is supported, found `{metric}`.")

    # resolve anchors: obs-group names or one custom coordinate
    custom_coord: np.ndarray | None = None
    if isinstance(groups, str):
        anchors = [groups]
    elif isinstance(groups, np.ndarray):
        if groups.ndim != 1:
            raise ValueError(f"Expected a 1D array for 'groups', but got shape {groups.shape}.")
        custom_coord = groups.astype(float).reshape(1, -1)
        anchors = ["custom_anchor"]
    elif isinstance(groups, list):
        anchors = list(groups)
    else:
        raise TypeError(f"Expected `groups` to be of type `str or list or ndarray`, got `{type(groups).__name__}`.")

    if cluster_key is None and custom_coord is None:
        raise ValueError("Please specify `cluster_key` when anchors are obs groups.")

    # resolve slides
    if library_key is None:
        slides: list[Any] = [None]
    else:
        all_slides = list(adata.obs[library_key].unique())
        if library_id is not None:
            requested = [library_id] if isinstance(library_id, str) else list(library_id)
            for x in requested:
                if x not in all_slides:
                    raise ValueError(f"library id {x} not in {library_key}")
            slides = requested
        else:
            slides = all_slides

    spatial = np.asarray(adata.obsm[spatial_key], dtype=float)
    finite = ~np.isnan(spatial).any(axis=1)

    df = pd.DataFrame(index=adata.obs.index)
    if cluster_key is not None:
        df[cluster_key] = adata.obs[cluster_key].values
    if library_key is not None:
        df[library_key] = adata.obs[library_key].values

    for anchor in anchors:
        raw = np.full(adata.n_obs, np.nan)
        norm = np.full(adata.n_obs, np.nan)
        found_anchor = custom_coord is not None
        for slide in slides:
            slide_mask = (
                np.ones(adata.n_obs, dtype=bool)
                if slide is None
                else np.asarray(adata.obs[library_key] == slide)
            )
            rows = slide_mask & finite
            if custom_coord is not None:
                anchor_coord = custom_coord
            else:
                in_anchor = np.asarray(adata.obs[cluster_key].astype(str) == str(anchor))
                anchor_coord = spatial[slide_mask & in_anchor & finite]
                if not len(anchor_coord):
                    continue
                found_anchor = True
            tree = KDTree(anchor_coord)
            mindist, _ = tree.query(spatial[rows])
            mindist = mindist.ravel()
            raw[rows] = mindist
            # normalization contract: anchors (distance 0) -> NaN, nearest
            # non-anchor -> 0, farthest -> 1 (per slide)
            d = mindist.copy()
            d[d == 0] = np.nan
            if np.isfinite(d).any():
                d[np.nanargmin(d)] = 0.0
                dmin, dmax = np.nanmin(d), np.nanmax(d)
                scale = (dmax - dmin) or 1.0
                norm[rows] = (d - dmin) / scale
        if not found_anchor:
            raise ValueError(
                f"Anchor group `{anchor}` not found in `adata.obs[{cluster_key!r}]` on any slide."
            )
        df[str(anchor)] = norm
        df[f"{anchor}_raw"] = raw

    if covariates is not None:
        if isinstance(covariates, str):
            covariates = [covariates]
        df[covariates] = adata.obs[covariates].copy()

    if copy:
        logg.info("Finish", time=start)
        return df
    _save_data(adata, attr="obsm", key=design_matrix_key, data=df, time=start)


__all__ = ["var_by_distance"]
