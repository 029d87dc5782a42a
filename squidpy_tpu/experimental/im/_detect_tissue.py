"""Tissue detection on downscaled whole-slide images.

Functional counterpart of /root/reference/src/squidpy/experimental/im/_detect_tissue.py:208-489:
segment tissue vs background on a coarse scale (Otsu thresholding or a
pixel-feature clustering stand-in for the reference's Weka random forest),
close holes, drop small specks, honor border margins, and upscale the mask
back to full resolution with nearest-neighbor interpolation
(``jax.image.resize``).
"""

from __future__ import annotations

from typing import Any, Literal

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage as ndi

from squidpy_tpu.im._segment import threshold_otsu
from squidpy_tpu.ops.filters import gaussian_blur
from squidpy_tpu.utils import logg

__all__ = ["detect_tissue"]


def _downscale(gray: np.ndarray, max_side: int) -> tuple[np.ndarray, float]:
    h, w = gray.shape
    scale = max(h, w) / max_side
    if scale <= 1:
        return gray, 1.0
    ny, nx = max(int(h / scale), 1), max(int(w / scale), 1)
    small = np.asarray(jax.image.resize(jnp.asarray(gray, jnp.float32), (ny, nx), method="linear"))
    return small, scale


def detect_tissue(
    image: Any,
    method: Literal["otsu", "kmeans"] = "otsu",
    downscale_to: int = 2048,
    sigma: float = 2.0,
    min_region_fraction: float = 1e-4,
    close_holes: bool = True,
    border_margin: int = 0,
    invert: bool | None = None,
    **kwargs: Any,
) -> np.ndarray:
    """Detect tissue; returns a full-resolution boolean mask.

    ``method='otsu'`` thresholds smoothed luminance; ``method='kmeans'``
    clusters per-pixel (intensity, smoothed intensity, gradient) features into
    two groups — the stand-in for the reference's trainable Weka segmentation.
    ``invert=None`` auto-orients the mask so tissue is the darker phase
    (bright-field convention); pass False/True to force.
    """
    arr = np.asarray(image).squeeze()
    gray = arr.mean(axis=-1) if arr.ndim == 3 else arr.astype(float)
    gray = gray.astype(np.float32)
    if gray.max() > 1.0:
        gray = gray / 255.0

    small, scale = _downscale(gray, downscale_to)
    smooth = gaussian_blur(small, sigma) if sigma > 0 else small

    if method == "otsu":
        thr = threshold_otsu(smooth)
        mask = smooth < thr
    elif method == "kmeans":
        from sklearn.cluster import KMeans

        grad_y, grad_x = np.gradient(smooth)
        feats = np.column_stack(
            [small.ravel(), smooth.ravel(), np.hypot(grad_y, grad_x).ravel()]
        )
        labels = KMeans(n_clusters=2, n_init=4, random_state=0).fit_predict(feats).reshape(small.shape)
        # tissue = cluster with the lower mean intensity
        means = [small[labels == k].mean() for k in (0, 1)]
        mask = labels == int(np.argmin(means))
    else:
        raise ValueError(f"Unknown tissue detection method `{method}`. Valid: ['otsu', 'kmeans'].")

    if invert is None:
        # tissue should be the minority-to-half darker phase; flip if it is
        # brighter than the background
        if small[mask].mean() > small[~mask].mean():
            mask = ~mask
    elif invert:
        mask = ~mask

    if close_holes:
        mask = ndi.binary_fill_holes(mask)
        mask = ndi.binary_closing(mask, structure=np.ones((3, 3)))
    if min_region_fraction > 0:
        lab, n = ndi.label(mask)
        if n:
            sizes = np.bincount(lab.ravel())
            keep = sizes >= min_region_fraction * mask.size
            keep[0] = False
            mask = keep[lab]
    if border_margin > 0:
        m = int(np.ceil(border_margin / scale))
        mask[:m, :] = False
        mask[-m:, :] = False
        mask[:, :m] = False
        mask[:, -m:] = False

    if scale > 1:
        full = np.asarray(
            jax.image.resize(jnp.asarray(mask.astype(np.float32)), gray.shape, method="nearest")
        ).astype(bool)
    else:
        full = mask.astype(bool)
    logg.info(f"Detected tissue covering {full.mean():.1%} of the image")
    return full
