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
from squidpy_tpu._constants._pkg_constants import Key
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
