"""Per-spot image featurization.

API parity with /root/reference/src/squidpy/im/_feature.py:22-154: iterate the
observations' spot crops and compute the requested feature families into
``adata.obsm['img_features']``. The reference fans crops over a loky process
pool (pickling the whole container per worker); here the crop loop is a plain
host loop feeding the device kernels — the per-crop work is device-bound, so
no pool is needed.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from types import MappingProxyType
from typing import Any

import numpy as np
import pandas as pd

from squidpy_tpu._constants._constants import ImageFeature
from squidpy_tpu.gr._utils import _save_data, extract_adata_if_sdata
from squidpy_tpu.im._container import ImageContainer
from squidpy_tpu.utils import logg

__all__ = ["calculate_image_features"]


def calculate_image_features(
    adata: Any,
    img: ImageContainer,
    layer: str | None = None,
    library_id: str | Sequence[str] | None = None,
    features: str | Sequence[str] = "summary",
    features_kwargs: Mapping[str, Mapping[str, Any]] = MappingProxyType({}),
    key_added: str = "img_features",
    copy: bool = False,
    n_jobs: int | None = None,
    backend: str = "loky",
    show_progress_bar: bool = True,
    *,
    table_key: str | None = None,
    **kwargs: Any,
) -> pd.DataFrame | None:
    """Calculate image features for all observations' spot crops.

    Stores a ``(n_obs, n_features)`` DataFrame under ``obsm['img_features']``.
    """
    adata = extract_adata_if_sdata(adata, table_key=table_key)
    layer = img._get_layer(layer)

    if isinstance(features, (str, ImageFeature)):
        features = [features]
    features = [ImageFeature(f) for f in features]

    start = logg.info(f"Calculating features `{[f.s for f in features]}`")

    # batched fast path: when every crop has the same shape (single spot
    # diameter — the common 10x case) and only array-statistics features are
    # requested, stack all crops and run ONE device kernel per feature family
    # (SURVEY §3.4's prescription); avoids a device round-trip per crop.
    batchable = {ImageFeature.SUMMARY, ImageFeature.COLOR_HIST, ImageFeature.TEXTURE}
    if set(features) <= batchable:
        res_df = _calculate_features_batched(
            adata, img, layer, features, features_kwargs, library_id=library_id, **kwargs
        )
        if res_df is not None:
            if copy:
                logg.info("Finish", time=start)
                return res_df
            _save_data(adata, attr="obsm", key=key_added, data=res_df, time=start)
            return None

    rows = []
    for crop, obs in img.generate_spot_crops(
        adata, library_id=library_id, return_obs=True, as_array=False, **kwargs
    ):
        features_dict: dict[str, Any] = {}
        for feature in features:
            fkwargs = dict(features_kwargs.get(feature.s, {}))
            if feature == ImageFeature.TEXTURE:
                res = crop.features_texture(layer=layer, **fkwargs)
            elif feature == ImageFeature.COLOR_HIST:
                res = crop.features_histogram(layer=layer, **fkwargs)
            elif feature == ImageFeature.SUMMARY:
                res = crop.features_summary(layer=layer, **fkwargs)
            elif feature == ImageFeature.SEGMENTATION:
                res = crop.features_segmentation(intensity_layer=layer, **fkwargs)
            elif feature == ImageFeature.CUSTOM:
                res = crop.features_custom(layer=layer, **fkwargs)
            else:
                raise NotImplementedError(f"Feature `{feature}` is not yet implemented.")
            features_dict.update(res)
        rows.append(pd.Series(features_dict, name=obs))

    res_df = pd.DataFrame(rows)
    res_df.index = pd.Index([r.name for r in rows])

    if copy:
        logg.info("Finish", time=start)
        return res_df

    _save_data(adata, attr="obsm", key=key_added, data=res_df, time=start)


def _calculate_features_batched(
    adata: Any,
    img: ImageContainer,
    layer: str,
    features: Sequence[ImageFeature],
    features_kwargs: Mapping[str, Mapping[str, Any]],
    library_id: Any = None,
    **kwargs: Any,
) -> pd.DataFrame | None:
    """Stack same-shaped spot crops and featurize in one device pass per
    family; returns None (falls back to the per-crop path) when crop shapes
    differ or per-crop feature kwargs make batching invalid."""
    import numpy as np

    from squidpy_tpu.ops.features import (
        histogram_features_batch,
        summary_features_batch,
    )

    crops: list[Any] = []
    names: list[Any] = []
    shape = None
    for crop, obs in img.generate_spot_crops(
        adata, library_id=library_id, return_obs=True, as_array=layer, squeeze=False, **kwargs
    ):
        if shape is None:
            shape = crop.shape
        elif crop.shape != shape:
            return None  # ragged crops -> per-crop path
        crops.append(crop[:, :, 0, :])
        names.append(obs)
    if not crops:
        return None
    batch = np.stack(crops)  # (n, h, w, c)
    n, _, _, n_ch = batch.shape

    cols: dict[str, Any] = {}
    for feature in features:
        fkwargs = dict(features_kwargs.get(feature.s, {}))
        feature_name = fkwargs.pop("feature_name", feature.s if feature != ImageFeature.COLOR_HIST else "histogram")
        channels = fkwargs.pop("channels", None)
        channels = list(range(n_ch)) if channels is None else ([channels] if isinstance(channels, int) else list(channels))
        if feature == ImageFeature.SUMMARY:
            quantiles = tuple(fkwargs.pop("quantiles", (0.9, 0.5, 0.1)))
            stats = summary_features_batch(batch, quantiles)
            for c in channels:
                for qi, q in enumerate(quantiles):
                    cols[f"{feature_name}_ch-{c}_quantile-{q}"] = stats["quantiles"][:, qi, c]
                cols[f"{feature_name}_ch-{c}_mean"] = stats["mean"][:, c]
                cols[f"{feature_name}_ch-{c}_std"] = stats["std"][:, c]
        elif feature == ImageFeature.COLOR_HIST:
            bins = int(fkwargs.pop("bins", 10))
            v_range = fkwargs.pop("v_range", None)
            hist = histogram_features_batch(batch, bins, v_range)
            for c in channels:
                for b in range(bins):
                    cols[f"{feature_name}_ch-{c}_bin-{b}"] = hist[:, c, b].astype(int)
        elif feature == ImageFeature.TEXTURE:
            props = list(fkwargs.pop("props", ("contrast", "dissimilarity", "homogeneity", "correlation", "ASM")))
            distances = list(fkwargs.pop("distances", (1,)))
            angles = list(fkwargs.pop("angles", (0, np.pi / 4, np.pi / 2, 3 * np.pi / 4)))
            from squidpy_tpu.im._feature_mixin import _img_as_ubyte
            from squidpy_tpu.ops.features import glcm_props_batch

            arr = batch if np.issubdtype(batch.dtype, np.uint8) else _img_as_ubyte(batch)
            for c in channels:
                vals = glcm_props_batch(arr[..., c], distances=distances, angles=angles, props=tuple(props))
                for pi, p in enumerate(props):
                    for d_idx, dist in enumerate(distances):
                        for a_idx, a in enumerate(angles):
                            cols[f"{feature_name}_ch-{c}_{p}_dist-{dist}_angle-{a:.2f}"] = vals[:, d_idx, a_idx, pi]
        else:  # pragma: no cover - guarded by caller
            return None

    return pd.DataFrame(cols, index=pd.Index(names))
