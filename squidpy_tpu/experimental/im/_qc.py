"""Tile-based image quality control.

Functional counterpart of /root/reference/src/squidpy/experimental/im/_qc_image.py
and the metric modules (_sharpness_metrics.py:14-94, _intensity_metrics.py:8-140,
_qc_metrics.py:37-96): the image is cut into a tile grid and per-tile scalar
metrics (sharpness, intensity, H&E staining, artifacts, tissue coverage) are
computed — here as ONE batched device pass over the stacked tile tensor
(vmapped conv/FFT/histogram kernels) instead of per-block dask tasks — and
returned as an AnnData of tile scores with outlier flags.
"""

from __future__ import annotations

from collections.abc import Sequence
from enum import Enum
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from squidpy_tpu._core.anndata import AnnData
from squidpy_tpu.utils import logg

__all__ = ["QCMetric", "qc_image"]


class QCMetric(str, Enum):
    # sharpness (grayscale)
    TENENGRAD = "tenengrad"
    VAR_OF_LAPLACIAN = "var_of_laplacian"
    VARIANCE = "variance"
    FFT_HIGH_FREQ_ENERGY = "fft_high_freq_energy"
    HAAR_WAVELET_ENERGY = "haar_wavelet_energy"
    # intensity (grayscale)
    BRIGHTNESS_MEAN = "brightness_mean"
    BRIGHTNESS_STD = "brightness_std"
    ENTROPY = "entropy"
    # staining (RGB, H&E)
    HEMATOXYLIN_MEAN = "hematoxylin_mean"
    HEMATOXYLIN_STD = "hematoxylin_std"
    EOSIN_MEAN = "eosin_mean"
    EOSIN_STD = "eosin_std"
    HE_RATIO = "he_ratio"
    # artifacts (RGB, H&E)
    FOLD_FRACTION = "fold_fraction"
    # tissue coverage
    TISSUE_FRACTION = "tissue_fraction"


_DEFAULT_METRICS = (
    QCMetric.TENENGRAD,
    QCMetric.VAR_OF_LAPLACIAN,
    QCMetric.BRIGHTNESS_MEAN,
    QCMetric.BRIGHTNESS_STD,
    QCMetric.ENTROPY,
    QCMetric.TISSUE_FRACTION,
)

# Ruifrok RGB→HED deconvolution matrix (published constants)
_HED_FROM_RGB = np.linalg.inv(
    np.array(
        [
            [0.65, 0.70, 0.29],
            [0.07, 0.99, 0.11],
            [0.27, 0.57, 0.78],
        ]
    ).T
)


def _conv2(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """'same' 2-D convolution of a single-channel tile batch (n, h, w)."""
    kh, kw = k.shape
    x4 = x[:, None]  # NCHW
    k4 = k[None, None]
    dn = jax.lax.conv_dimension_numbers(x4.shape, k4.shape, ("NCHW", "OIHW", "NCHW"))
    out = jax.lax.conv_general_dilated(x4, k4, (1, 1), [(kh // 2, kh // 2), (kw // 2, kw // 2)], dimension_numbers=dn)
    return out[:, 0]


def _batched_metrics(
    tiles_gray: jnp.ndarray,
    tiles_rgb: jnp.ndarray | None,
    metrics: list[QCMetric],
    tissue_thr: float = 0.5,
) -> dict[str, jnp.ndarray]:
    """All requested metrics over a (n, ty, tx) grayscale (and optional
    (n, ty, tx, 3) RGB) tile batch, each reduced to (n,)."""
    out: dict[str, jnp.ndarray] = {}
    g = tiles_gray
    n = g.shape[0]

    sobel_x = jnp.asarray([[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=g.dtype)
    sobel_y = sobel_x.T
    lap = jnp.asarray([[0.0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=g.dtype)

    need = set(metrics)
    if QCMetric.TENENGRAD in need:
        gx, gy = _conv2(g, sobel_x), _conv2(g, sobel_y)
        out["tenengrad"] = jnp.mean(gx * gx + gy * gy, axis=(1, 2))
    if QCMetric.VAR_OF_LAPLACIAN in need:
        lv = _conv2(g, lap)
        out["var_of_laplacian"] = jnp.var(lv, axis=(1, 2))
    if QCMetric.VARIANCE in need:
        out["variance"] = jnp.var(g, axis=(1, 2))
    if QCMetric.FFT_HIGH_FREQ_ENERGY in need:
        spec = jnp.abs(jnp.fft.fft2(g))
        h, w = g.shape[1:]
        fy = jnp.fft.fftfreq(h)[:, None]
        fx = jnp.fft.fftfreq(w)[None, :]
        mask = jnp.sqrt(fy * fy + fx * fx) > 0.25
        out["fft_high_freq_energy"] = jnp.sum(spec * mask, axis=(1, 2)) / jnp.maximum(jnp.sum(spec, axis=(1, 2)), 1e-12)
    if QCMetric.HAAR_WAVELET_ENERGY in need:
        h2 = (g.shape[1] // 2) * 2
        w2 = (g.shape[2] // 2) * 2
        a = g[:, :h2:2, :w2:2]
        b = g[:, 1:h2:2, :w2:2]
        c = g[:, :h2:2, 1:w2:2]
        d = g[:, 1:h2:2, 1:w2:2]
        lh = (a - b + c - d) / 4
        hl = (a + b - c - d) / 4
        hh = (a - b - c + d) / 4
        out["haar_wavelet_energy"] = jnp.mean(lh * lh + hl * hl + hh * hh, axis=(1, 2))
    if QCMetric.BRIGHTNESS_MEAN in need:
        out["brightness_mean"] = jnp.mean(g, axis=(1, 2))
    if QCMetric.BRIGHTNESS_STD in need:
        out["brightness_std"] = jnp.std(g, axis=(1, 2))
    if QCMetric.ENTROPY in need:
        # 64-bin shannon entropy per tile
        def tile_entropy(t: jnp.ndarray) -> jnp.ndarray:
            hist, _ = jnp.histogram(t, bins=64, range=(0.0, 1.0))
            p = hist / jnp.maximum(jnp.sum(hist), 1)
            return -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.maximum(p, 1e-12)), 0.0))

        out["entropy"] = jax.vmap(tile_entropy)(g)
    if QCMetric.TISSUE_FRACTION in need:
        # tissue = darker than the whole-image mean luminance; the threshold
        # arrives as a scalar so every metric stays per-tile — the tile batch
        # can then shard over the device mesh with no cross-tile reduction
        out["tissue_fraction"] = jnp.mean((g < tissue_thr).astype(jnp.float32), axis=(1, 2))

    hne = need & {
        QCMetric.HEMATOXYLIN_MEAN, QCMetric.HEMATOXYLIN_STD, QCMetric.EOSIN_MEAN,
        QCMetric.EOSIN_STD, QCMetric.HE_RATIO, QCMetric.FOLD_FRACTION,
    }
    if hne:
        if tiles_rgb is None:
            raise ValueError(f"Metrics `{sorted(m.value for m in hne)}` require an RGB (H&E) image.")
        od = -jnp.log10(jnp.maximum(tiles_rgb, 1.0 / 255.0))
        hed = jnp.einsum("nyxc,dc->nyxd", od, jnp.asarray(_HED_FROM_RGB))
        hem, eos = hed[..., 0], hed[..., 1]
        if QCMetric.HEMATOXYLIN_MEAN in need:
            out["hematoxylin_mean"] = jnp.mean(hem, axis=(1, 2))
        if QCMetric.HEMATOXYLIN_STD in need:
            out["hematoxylin_std"] = jnp.std(hem, axis=(1, 2))
        if QCMetric.EOSIN_MEAN in need:
            out["eosin_mean"] = jnp.mean(eos, axis=(1, 2))
        if QCMetric.EOSIN_STD in need:
            out["eosin_std"] = jnp.std(eos, axis=(1, 2))
        if QCMetric.HE_RATIO in need:
            out["he_ratio"] = jnp.mean(hem, axis=(1, 2)) / jnp.maximum(jnp.mean(eos, axis=(1, 2)), 1e-8)
        if QCMetric.FOLD_FRACTION in need:
            # folds look dark and saturated; fixed HSV thresholds match the
            # reference (sat > 0.4, val < 0.3, _intensity_metrics.py:112-129)
            mx = jnp.max(tiles_rgb, axis=-1)
            mn = jnp.min(tiles_rgb, axis=-1)
            sat = jnp.where(mx > 0, (mx - mn) / jnp.maximum(mx, 1e-12), 0.0)
            fold = (sat > 0.4) & (mx < 0.3)
            out["fold_fraction"] = jnp.mean(fold.astype(jnp.float32), axis=(1, 2))
    return out


def qc_image(
    image: Any = None,
    image_key: str | None = None,
    tile_size: int | tuple[int, int] | str = 256,
    metrics: Sequence[str | QCMetric] | None = None,
    outlier_percentile: float = 2.0,
    key_added: str | None = None,
    detect_tissue: bool = False,
    detect_outliers: bool = True,
    *,
    scale: str = "full",
    is_hne: bool = False,
    outlier_threshold: float | None = None,
    progress: bool = True,
    tissue_mask_key: str | None = None,
    preview: bool = False,
    sdata: Any = None,
    **kwargs: Any,
) -> AnnData:
    """Tile the image and compute per-tile QC metric scores.

    Returns an AnnData with one obs per tile (grid position + pixel bounds in
    ``obs``, tile-center coordinates in ``obsm['spatial']``), one var per
    metric, and — with ``detect_outliers`` — per-metric low/high outlier flags
    at ``outlier_percentile`` plus an ``unfocus_score`` (1 − the tile's worst
    percentile rank across the gradient-based sharpness metrics; reference
    ``_compute_unfocus_scores``, _qc_image.py:394-440). ``detect_tissue`` adds
    ``is_tissue``/``is_background`` from per-tile tissue coverage (> 0.5 of
    the tile; reference ``_classify_tiles_by_tissue``, _qc_image.py:353-392)
    and restricts the unfocus ranking to tissue tiles (background gets NaN).
    """
    # reference-surface compatibility (sdata-native call sites,
    # /root/reference/src/squidpy/experimental/im/_qc_image.py:45-59)
    from squidpy_tpu.experimental._sdata import is_sdata, resolve_element, store_table

    if image is None:
        if sdata is None:
            raise TypeError("qc_image() needs an image (or `sdata` + `image_key`).")
        image = sdata  # reference keyword form: qc_image(sdata=..., image_key=...)
    sdata = image if is_sdata(image) else None
    image = resolve_element(image, image_key, tree="images", scale=scale, what="image")
    if outlier_threshold is not None:
        # reference expresses the flag cut as a fraction; internal knob is %
        outlier_percentile = float(outlier_threshold) * 100.0

    arr = np.asarray(image).squeeze()
    if arr.ndim == 3 and arr.shape[-1] not in (1, 3):
        raise ValueError(f"Expected grayscale or RGB image, found shape `{arr.shape}`.")
    rgb = arr if (arr.ndim == 3 and arr.shape[-1] == 3) else None
    if isinstance(tile_size, str):
        if tile_size != "auto":
            raise ValueError(f"Expected `tile_size` to be an int, (ty, tx) tuple or 'auto', found `{tile_size!r}`.")
        side = max(arr.shape[0], arr.shape[1])
        auto = int(np.clip(((side // 8) // 32) * 32, 64, 512))
        ty = tx = auto
    elif isinstance(tile_size, (tuple, list)):
        # reference surface: tile_size is (ty, tx), rectangular tiles allowed
        # (/root/reference/src/squidpy/experimental/im/_qc_image.py:51)
        ty, tx = (int(t) for t in tile_size)
    else:
        ty = tx = int(tile_size)
    if ty <= 0 or tx <= 0:
        raise ValueError(f"Expected positive tile sizes, found `({ty}, {tx})`.")
    if metrics is None and is_hne and rgb is not None:
        metrics = [*(m.value for m in _DEFAULT_METRICS),
                   QCMetric.HEMATOXYLIN_MEAN, QCMetric.EOSIN_MEAN, QCMetric.HE_RATIO]
    gray = arr if arr.ndim == 2 else arr.mean(axis=-1)
    gray = gray.astype(np.float32)
    if gray.max() > 1.0:
        gray = gray / 255.0

    metrics = [QCMetric(m) for m in (metrics if metrics is not None else _DEFAULT_METRICS)]
    compute_metrics = list(metrics)
    if detect_tissue and QCMetric.TISSUE_FRACTION not in compute_metrics:
        compute_metrics.append(QCMetric.TISSUE_FRACTION)
    h, w = gray.shape
    # tiles larger than the image degrade to a single full-image tile
    # (reflect padding cannot exceed the axis extent anyway)
    ty, tx = min(ty, h), min(tx, w)
    ny, nx = (h + ty - 1) // ty, (w + tx - 1) // tx
    pad_h, pad_w = ny * ty - h, nx * tx - w
    gray_p = np.pad(gray, ((0, pad_h), (0, pad_w)), mode="reflect")
    tiles_gray = gray_p.reshape(ny, ty, nx, tx).transpose(0, 2, 1, 3).reshape(-1, ty, tx)
    tiles_rgb = None
    if rgb is not None:
        rgb_f = rgb.astype(np.float32)
        if rgb_f.max() > 1.0:
            rgb_f = rgb_f / 255.0
        rgb_p = np.pad(rgb_f, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
        tiles_rgb = jnp.asarray(
            rgb_p.reshape(ny, ty, nx, tx, 3).transpose(0, 2, 1, 3, 4).reshape(-1, ty, tx, 3)
        )

    start = logg.info(f"Computing `{len(metrics)}` QC metrics over `{ny * nx}` tiles on device")
    # tile-batch data parallelism: the (n_tiles, h, w) batch shards over all
    # local devices (SURVEY §2.2 multi-node tile execution — the reference's
    # dask LocalCluster path, experimental/im/_tiling.py:395-498); every
    # metric is a per-tile reduction, so GSPMD partitions with no collectives
    from squidpy_tpu.parallel.sharded import batch0_sharded

    n_true = ny * nx
    tiles_gray_d, _ = batch0_sharded(jnp.asarray(tiles_gray))
    if tiles_rgb is not None:
        tiles_rgb, _ = batch0_sharded(tiles_rgb)
    scores = _batched_metrics(tiles_gray_d, tiles_rgb, compute_metrics, tissue_thr=float(gray.mean()))
    X = np.column_stack([np.asarray(scores[m.value], dtype=np.float64)[:n_true] for m in metrics])

    rows, cols = np.divmod(np.arange(ny * nx), nx)
    obs = pd.DataFrame(
        {
            "tile_row": rows,
            "tile_col": cols,
            "y0": rows * ty,
            "x0": cols * tx,
            "y1": np.minimum((rows + 1) * ty, h),
            "x1": np.minimum((cols + 1) * tx, w),
        },
        index=[f"tile_{r}_{c}" for r, c in zip(rows, cols)],
    )
    # reference column contract: qc_-prefixed metric columns + explicit
    # tile-center coordinates (/root/reference/src/squidpy/experimental/im/
    # _qc_image.py:238-244, tests/experimental/test_qc_image.py:198-216)
    adata = AnnData(X=X, obs=obs, var=pd.DataFrame(index=[f"qc_{m.value}" for m in metrics]))
    adata.obs["centroid_y"] = ((obs["y0"] + obs["y1"]) / 2).to_numpy()
    adata.obs["centroid_x"] = ((obs["x0"] + obs["x1"]) / 2).to_numpy()
    adata.obsm["spatial"] = np.column_stack([(obs["x0"] + obs["x1"]) / 2, (obs["y0"] + obs["y1"]) / 2])
    adata.uns["qc_image"] = {
        "tile_size": (ty, tx),
        "tile_size_y": ty,
        "tile_size_x": tx,
        "grid_shape": (ny, nx),
        "image_shape": (h, w),
    }

    if tissue_mask_key is not None and sdata is not None:
        # explicit tissue mask from sdata.labels overrides the heuristic
        tmask = np.asarray(
            resolve_element(sdata, tissue_mask_key, tree="labels", scale=scale, what="tissue_mask")
        ).squeeze() > 0
        if tmask.shape != (h, w):
            # the mask may live at a different pyramid level than the image
            # (e.g. detect_tissue's scale='auto' vs this call's scale) —
            # align it to the image grid before tiling, or every slice below
            # silently reads out of range and reports fraction 0
            from squidpy_tpu.experimental.im._stain import _nearest_resize_mask

            tmask = _nearest_resize_mask(tmask, (h, w))
        fr = np.zeros(n_true)
        for i, (r, c) in enumerate(zip(*np.divmod(np.arange(n_true), nx))):
            sub = tmask[r * ty : (r + 1) * ty, c * tx : (c + 1) * tx]
            fr[i] = sub.mean() if sub.size else 0.0
        _set_tissue_flags(adata, fr > 0.5)
        detect_tissue = True  # downstream unfocus restriction applies
    elif detect_tissue:
        tf = np.asarray(scores[QCMetric.TISSUE_FRACTION.value], dtype=np.float64)[:n_true]
        _set_tissue_flags(adata, tf > 0.5)

    if detect_outliers:
        for m in metrics:
            col = adata.obs_vector(f"qc_{m.value}")
            lo, hi = np.percentile(col, [outlier_percentile, 100 - outlier_percentile])
            adata.obs[f"qc_{m.value}_outlier_low"] = col < lo
            adata.obs[f"qc_{m.value}_outlier_high"] = col > hi
        tissue_bool = (
            adata.obs["is_tissue"].to_numpy() == "True" if detect_tissue else None
        )
        unfocus = _unfocus_scores(X, [m.value for m in metrics], within=tissue_bool)
        adata.obs["unfocus_score"] = unfocus
        # reference flag: a tile is an outlier when its within-tissue
        # percentile rank falls below the threshold — i.e. unfocus above
        # 1 - threshold; stored as a "True"/"False" categorical
        flagged = np.nan_to_num(unfocus, nan=0.0) > 1.0 - outlier_percentile / 100.0
        adata.obs["qc_outlier"] = pd.Categorical(
            np.where(flagged, "True", "False"), categories=["False", "True"]
        )
    if sdata is not None:
        # reference on-disk table key contract: sdata.tables[f"qc_img_{image_key}"]
        # (/root/reference/src/squidpy/experimental/im/_qc_image.py:109,316)
        store_table(sdata, key_added or f"qc_img_{image_key or 'image'}", adata)
    if preview:
        from squidpy_tpu.experimental import pl as _exp_pl

        _exp_pl.qc_image(adata, metrics=[metrics[0].value])
    logg.info("Finish", time=start)
    return adata


def _set_tissue_flags(adata: AnnData, tissue: np.ndarray) -> None:
    """Write ``is_tissue``/``is_background`` in the reference's convention:
    "True"/"False" string categoricals (plotting-friendly), both categories
    always registered."""
    cats = ["False", "True"]
    adata.obs["is_tissue"] = pd.Categorical(np.where(tissue, "True", "False"), categories=cats)
    adata.obs["is_background"] = pd.Categorical(np.where(tissue, "False", "True"), categories=cats)


def _unfocus_scores(X: np.ndarray, var_names: list[str], within: np.ndarray | None = None) -> np.ndarray:
    """``1 − min percentile rank`` across the gradient-based sharpness metrics
    (tenengrad / laplacian); other metrics track tissue structure rather than
    optical focus and are excluded (reference _qc_image.py:394-440). With
    ``within`` (tissue mask), ranking is restricted to those tiles and the
    rest get NaN.
    """
    from scipy.stats import rankdata

    cols = [i for i, name in enumerate(var_names) if "tenengrad" in name or "laplacian" in name]
    if not cols:
        cols = list(range(X.shape[1]))
    out = np.full(X.shape[0], np.nan)
    sel = np.ones(X.shape[0], dtype=bool) if within is None else np.asarray(within, dtype=bool)
    n = int(sel.sum())
    if n == 0:
        return out
    if n == 1:
        out[sel] = 0.0
        return out
    ranks = np.column_stack([(rankdata(X[sel, c], method="average") - 1) / (n - 1) for c in cols])
    out[sel] = 1.0 - ranks.min(axis=1)
    return out
