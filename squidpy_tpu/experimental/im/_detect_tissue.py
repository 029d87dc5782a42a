"""Tissue detection on downscaled whole-slide images.

Functional counterpart of /root/reference/src/squidpy/experimental/im/_detect_tissue.py:208-489:
segment tissue vs background on a coarse scale — Otsu thresholding, native
C++ Felzenszwalb superpixels classified by corner-oriented Otsu, a trainable
Weka-style RandomForest on multiscale pixel features, or 2-means pixel
clustering — then close holes, drop small specks, honor border margins, and
upscale the mask back to full resolution with nearest-neighbor interpolation
(``jax.image.resize``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Literal

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage as ndi

from squidpy_tpu.experimental._params import resolve_params
from squidpy_tpu.im._segment import threshold_otsu
from squidpy_tpu.ops.filters import gaussian_blur
from squidpy_tpu.utils import logg

__all__ = [
    "BackgroundDetectionParams",
    "FelzenszwalbParams",
    "WekaParams",
    "detect_tissue",
]


@dataclass(frozen=True)
class BackgroundDetectionParams:
    """Which image corners are background priors, and how large the corner
    boxes are (fraction of each side). If no corner is flagged, orientation
    falls back to treating the brightest pixels as background (bright-field
    convention). Reference: experimental/im/_detect_tissue.py:37-59."""

    ymin_xmin_is_bg: bool = True
    ymax_xmin_is_bg: bool = True
    ymin_xmax_is_bg: bool = True
    ymax_xmax_is_bg: bool = True
    corner_size_pct: float = 0.04

    @property
    def any_corner(self) -> bool:
        return (
            self.ymin_xmin_is_bg
            or self.ymax_xmin_is_bg
            or self.ymin_xmax_is_bg
            or self.ymax_xmax_is_bg
        )

    def __post_init__(self) -> None:
        if not 0.0 < self.corner_size_pct <= 0.5:
            raise ValueError(f"`corner_size_pct` must be in (0, 0.5], got {self.corner_size_pct}.")


@dataclass(frozen=True)
class FelzenszwalbParams:
    """Superpixel sizing for the felzenszwalb method. ``grid_rows × grid_cols``
    sets the target superpixel count; ``scale_coef`` multiplies the image's
    intensity range to give the merge threshold k (intensity units — unlike
    the reference's area-based coefficient, see the k discussion in
    ``_segment_felzenszwalb_mask``); ``min_size_coef`` × target area is the
    minimum region size. Reference: experimental/im/_detect_tissue.py:62-72."""

    grid_rows: int = 8
    grid_cols: int = 8
    scale_coef: float = 2.0
    min_size_coef: float = 0.05

    def __post_init__(self) -> None:
        if self.grid_rows < 1 or self.grid_cols < 1:
            raise ValueError("`grid_rows`/`grid_cols` must be >= 1.")
        if self.min_size_coef < 0 or self.scale_coef <= 0:
            raise ValueError("`scale_coef` must be > 0 and `min_size_coef` >= 0.")


@dataclass(frozen=True)
class WekaParams:
    """Knobs for the trainable (Weka-style) method: the multiscale feature
    ladder (geometric sigmas from ``sigma_min`` to ``sigma_max``; ``edges``
    adds gradient-magnitude channels), pseudo-label seeding, and the
    RandomForest. Reference: experimental/im/_detect_tissue.py:75-92."""

    sigma_min: float = 1.0
    sigma_max: float = 8.0
    edges: bool = True
    pseudo_tissue_percentile: float = 95.0
    pseudo_min_pixels: int = 200
    rf_estimators: int = 50
    rf_max_depth: int | None = 10
    random_state: int = 0

    @property
    def sigmas(self) -> tuple[float, ...]:
        out, s = [], float(self.sigma_min)
        while s <= self.sigma_max * (1 + 1e-9):
            out.append(s)
            s *= 2.0
        return tuple(out)

    def __post_init__(self) -> None:
        if not 0 < self.sigma_min <= self.sigma_max:
            raise ValueError("need 0 < sigma_min <= sigma_max.")
        if not 0.0 < self.pseudo_tissue_percentile < 100.0:
            raise ValueError("`pseudo_tissue_percentile` must be in (0, 100).")
        if self.rf_estimators < 1 or self.pseudo_min_pixels < 1:
            raise ValueError("`rf_estimators` and `pseudo_min_pixels` must be >= 1.")


def _downscale(gray: np.ndarray, max_side: int) -> tuple[np.ndarray, float]:
    h, w = gray.shape
    scale = max(h, w) / max_side
    if scale <= 1:
        return gray, 1.0
    ny, nx = max(int(h / scale), 1), max(int(w / scale), 1)
    small = np.asarray(jax.image.resize(jnp.asarray(gray, jnp.float32), (ny, nx), method="linear"))
    return small, scale


def _corner_background_stats(
    small: np.ndarray, bg: BackgroundDetectionParams | None = None
) -> tuple[np.ndarray, float, float]:
    """Background-prior seed mask + its mean/std. The flagged corners are the
    prior; with no corner flagged, the brightest 5% of pixels stand in
    (bright-field fallback, reference BackgroundDetectionParams docstring)."""
    bg = bg or BackgroundDetectionParams()
    h, w = small.shape
    seeds = np.zeros((h, w), dtype=bool)
    if bg.any_corner:
        ch = max(1, int(h * bg.corner_size_pct))
        cw = max(1, int(w * bg.corner_size_pct))
        if bg.ymin_xmin_is_bg:
            seeds[:ch, :cw] = True
        if bg.ymin_xmax_is_bg:
            seeds[:ch, -cw:] = True
        if bg.ymax_xmin_is_bg:
            seeds[-ch:, :cw] = True
        if bg.ymax_xmax_is_bg:
            seeds[-ch:, -cw:] = True
    else:
        seeds = small >= np.percentile(small, 95.0)
    vals = small[seeds]
    return seeds, float(vals.mean()), float(max(vals.std(), 1e-6))


def _segment_felzenszwalb_mask(
    small: np.ndarray, fp: FelzenszwalbParams, bg: BackgroundDetectionParams | None
) -> np.ndarray:
    """Superpixels → tissue mask: Otsu over per-superpixel mean intensity,
    oriented by the corner-background brightness (reference
    ``_mask_from_labels_via_corners``, _detect_tissue.py:560-600)."""
    from squidpy_tpu.native import felzenszwalb

    h, w = small.shape
    target_area = h * w / (fp.grid_rows * fp.grid_cols)
    # k is in intensity units: a few times the image's dynamic range keeps
    # genuine tissue/background boundaries while merging noise (measured on
    # the synthetic H&E: k ~= 2x range gives clean superpixels on [0, 1] data)
    span = float(small.max() - small.min()) or 1.0
    labels = felzenszwalb(small, scale=fp.scale_coef * span, min_size=int(fp.min_size_coef * target_area))

    n = int(labels.max()) + 1
    counts = np.bincount(labels.ravel(), minlength=n).astype(np.float64)
    sums = np.bincount(labels.ravel(), weights=small.ravel().astype(np.float64), minlength=n)
    means = sums / np.maximum(counts, 1)
    thr = threshold_otsu(means.astype(np.float32)) if n > 1 else means[0] - 1.0
    _, bg_mean, _ = _corner_background_stats(small, bg)
    bright_bg = bg_mean > float(small.mean())
    keep = (means <= thr) if bright_bg else (means >= thr)
    return keep[labels]


def _multiscale_pixel_features(
    small: np.ndarray, sigmas: tuple[float, ...], edges: bool = True
) -> np.ndarray:
    """WEKA-style per-pixel feature stack: intensity plus, per scale,
    gaussian-smoothed intensity, gradient magnitude (when ``edges``) and
    laplacian — all through the device convolution kernel.
    (n_pixels, n_features)."""
    feats = [small.ravel()]
    for s in sigmas:
        sm = np.asarray(gaussian_blur(small, s), dtype=np.float32)
        lap = np.asarray(gaussian_blur(sm, s), dtype=np.float32) - sm
        feats += [sm.ravel(), lap.ravel()]
        if edges:
            gy, gx = np.gradient(sm)
            feats.append(np.hypot(gy, gx).ravel())
    return np.column_stack(feats).astype(np.float32)


def _segment_weka_mask(
    small: np.ndarray, wp: WekaParams, bg: BackgroundDetectionParams | None
) -> np.ndarray:
    """Trainable segmentation: corner background seeds + pseudo tissue seeds
    from a background z-score map, a RandomForest on multiscale pixel
    features, prediction over every pixel (reference ``_segment_weka``,
    _detect_tissue.py:626-760)."""
    from sklearn.ensemble import RandomForestClassifier

    corners, bg_mean, bg_std = _corner_background_stats(small, bg)
    zmap = np.abs((small - bg_mean) / bg_std)
    non_bg = ~corners
    thr = np.percentile(zmap[non_bg], wp.pseudo_tissue_percentile)
    tissue_seeds = (zmap >= thr) & non_bg
    if tissue_seeds.sum() < wp.pseudo_min_pixels:
        order = np.argsort(zmap.ravel())[::-1]
        take = order[np.isin(order, np.flatnonzero(non_bg))][: wp.pseudo_min_pixels]
        tissue_seeds = np.zeros_like(tissue_seeds)
        tissue_seeds.ravel()[take] = True

    feats = _multiscale_pixel_features(small, wp.sigmas, wp.edges)
    y = np.zeros(small.size, dtype=np.int8)
    y[corners.ravel()] = 1
    y[tissue_seeds.ravel()] = 2
    seeded = y > 0
    clf = RandomForestClassifier(
        n_estimators=wp.rf_estimators,
        max_depth=wp.rf_max_depth,
        n_jobs=-1,
        random_state=wp.random_state,
    )
    clf.fit(feats[seeded], y[seeded])
    pred = clf.predict(feats)
    return (pred == 2).reshape(small.shape)


def detect_tissue(
    image: Any = None,
    image_key: str | None = None,
    method: Literal["otsu", "kmeans", "felzenszwalb", "weka"] = "otsu",
    downscale_to: int = 2048,
    sigma: float = 2.0,
    min_region_fraction: float = 1e-4,
    close_holes: bool = True,
    close_holes_smaller_than_frac: float | None = None,
    mask_smoothing_cycles: int = 0,
    border_margin: int = 0,
    invert: bool | None = None,
    label_components: bool = False,
    method_params: Any = None,
    background_params: Any = None,
    *,
    scale: str = "auto",
    channel_format: Literal["infer", "rgb", "rgba", "multichannel"] = "infer",
    background_detection_params: Any = None,
    corners_are_background: bool = True,
    border_margin_px: int | None = None,
    min_specimen_area_frac: float | None = None,
    n_samples: int | None = None,
    auto_max_pixels: int | None = None,
    new_labels_key: str | None = None,
    inplace: bool = True,
    sdata: Any = None,
    **kwargs: Any,
) -> np.ndarray:
    """Detect tissue; returns a full-resolution boolean mask (or an
    integer-labeled specimen mask when ``label_components=True``, one id per
    connected tissue piece — the reference's labeled-mask convention,
    /root/reference/src/squidpy/experimental/im/_detect_tissue.py:226).

    ``close_holes_smaller_than_frac`` fills only holes below that area
    fraction (instead of all enclosed holes); ``mask_smoothing_cycles``
    applies that many binary open+close rounds to smooth ragged edges.

    Methods (reference: experimental/im/_detect_tissue.py:208-489):

    - ``'otsu'``: threshold smoothed luminance;
    - ``'felzenszwalb'``: native C++ superpixels classified by Otsu on
      per-superpixel mean intensity, oriented by the corner background;
    - ``'weka'``: trainable segmentation — RandomForest on a multiscale
      pixel-feature stack, seeded by corner background priors and
      z-score-selected pseudo tissue pixels;
    - ``'kmeans'``: 2-cluster pixel-feature clustering (a lighter
      alternative kept from round 1).

    ``invert=None`` auto-orients the mask so tissue is the darker phase
    (bright-field convention); pass False/True to force.

    ``method_params`` takes a :class:`FelzenszwalbParams` / :class:`WekaParams`
    instance or a mapping of field names (``method='otsu'``/``'kmeans'`` take
    none); ``background_params`` takes a :class:`BackgroundDetectionParams`
    controlling which corners seed the background prior.
    """
    # reference-surface compatibility (sdata-native call sites and kwarg
    # names, /root/reference/src/squidpy/experimental/im/_detect_tissue.py:208-226)
    from squidpy_tpu.experimental._sdata import is_sdata, resolve_element, store_labels

    if image is None:
        if sdata is None:
            raise TypeError("detect_tissue() needs an image (or `sdata` + `image_key`).")
        image = sdata  # reference keyword form: detect_tissue(sdata=..., image_key=...)
    # a plain-array image with an explicit sdata= keyword keeps the sdata
    # (the mask still stores there); only derive it from `image` when given
    if is_sdata(image):
        sdata = image
    image = resolve_element(image, image_key, tree="images", scale=scale, what="image")
    if background_detection_params is not None:
        background_params = background_detection_params
    if not corners_are_background and background_params is None:
        background_params = BackgroundDetectionParams(
            ymin_xmin_is_bg=False, ymin_xmax_is_bg=False,
            ymax_xmin_is_bg=False, ymax_xmax_is_bg=False,
        )
    if border_margin_px is not None:
        border_margin = border_margin_px
    if min_specimen_area_frac is not None:
        min_region_fraction = min_specimen_area_frac
    if auto_max_pixels is not None:
        # the reference bounds processing by pixel COUNT; downscale_to bounds
        # the max side — convert (n_samples is the same knob at fit level)
        downscale_to = max(int(np.sqrt(auto_max_pixels)), 64)
    elif n_samples is not None:
        downscale_to = max(int(np.sqrt(n_samples)), 64)
    if sdata is not None and new_labels_key is not None:
        label_components = True  # the stored element is a labeled mask

    arr = np.asarray(image).squeeze()
    if arr.ndim == 3 and arr.shape[-1] == 4:
        if channel_format == "rgba":
            arr = arr[..., :3]
        elif channel_format == "infer":
            # a constant 4th channel is an alpha plane, not signal —
            # averaging it into the grayscale would compress the
            # tissue/background contrast by 25% and shift the threshold;
            # a varying 4th channel is treated as multichannel data
            a4 = arr[::16, ::16, 3]
            if a4.size and (a4 == a4.flat[0]).all():
                arr = arr[..., :3]
    if arr.ndim == 3 and channel_format == "rgb" and arr.shape[-1] != 3:
        raise ValueError(f"channel_format='rgb' but image has {arr.shape[-1]} channels.")
    gray = arr.mean(axis=-1) if arr.ndim == 3 else arr.astype(float)
    gray = gray.astype(np.float32)
    if gray.max() > 1.0:
        gray = gray / 255.0

    small, scale = _downscale(gray, downscale_to)
    smooth = gaussian_blur(small, sigma) if sigma > 0 else small
    bg = (
        resolve_params(background_params, BackgroundDetectionParams, "background_params")
        if background_params is not None
        else None
    )
    if method_params is not None and method in ("otsu", "kmeans"):
        raise ValueError(f"`method_params` is not supported for method `{method}`.")

    if method == "otsu":
        thr = threshold_otsu(smooth)
        mask = smooth < thr
    elif method == "felzenszwalb":
        fp = resolve_params(method_params, FelzenszwalbParams, "method_params")
        mask = _segment_felzenszwalb_mask(np.asarray(smooth, dtype=np.float32), fp, bg)
    elif method == "weka":
        wp = resolve_params(method_params, WekaParams, "method_params")
        mask = _segment_weka_mask(np.asarray(small, dtype=np.float32), wp, bg)
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
        raise ValueError(
            f"Unknown tissue detection method `{method}`. Valid: ['otsu', 'felzenszwalb', 'weka', 'kmeans']."
        )

    if invert is None:
        # tissue should be the minority-to-half darker phase; flip if it is
        # brighter than the background
        if small[mask].mean() > small[~mask].mean():
            mask = ~mask
    elif invert:
        mask = ~mask

    if close_holes_smaller_than_frac is not None:
        # fill only small enclosed holes: background components not touching
        # the border and below the area bound
        holes, nh = ndi.label(~mask)
        if nh:
            border_ids = np.unique(
                np.concatenate([holes[0, :], holes[-1, :], holes[:, 0], holes[:, -1]])
            )
            sizes = np.bincount(holes.ravel())
            fill = (sizes < close_holes_smaller_than_frac * mask.size)
            fill[border_ids] = False
            fill[0] = False
            mask = mask | fill[holes]
    elif close_holes:
        mask = ndi.binary_fill_holes(mask)
        mask = ndi.binary_closing(mask, structure=np.ones((3, 3)))
    for _ in range(int(mask_smoothing_cycles)):
        mask = ndi.binary_closing(ndi.binary_opening(mask, structure=np.ones((3, 3))),
                                  structure=np.ones((3, 3)))
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
    result: np.ndarray = full
    if label_components:
        labeled, n = ndi.label(full)
        logg.info(f"Labeled `{n}` tissue specimen(s)")
        result = labeled.astype(np.int32)
    if sdata is not None and inplace:
        store_labels(sdata, new_labels_key or f"{image_key or 'image'}_tissue", result)
    return result
