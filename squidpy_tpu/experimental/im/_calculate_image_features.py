"""Tiled per-cell image featurization (WSI-scale).

Functional counterpart of
/root/reference/src/squidpy/experimental/im/_calculate_image_features.py:874-1156:
a centroid pass assigns every segmented cell to exactly one tile, tiles are
read with halo margins, non-owned cells are zeroed, and per-cell features
(morphology regionprops, per-channel intensity stats, GLCM texture,
histograms, and the cp_measure-equivalent granularity / Zernike / radial /
colocalization families) are computed — through the device segment-reduction
kernels (:func:`squidpy_tpu.ops.features.regionprops`) and the batched crop
kernels (:mod:`squidpy_tpu.ops.cellfeats`) instead of cp_measure/skimage,
with tiles streamed through :func:`squidpy_tpu.experimental.im.run_tiled`.
Results assemble into an AnnData (one obs per cell).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any, NamedTuple

import numpy as np
import pandas as pd

from squidpy_tpu._core.anndata import AnnData
from squidpy_tpu.experimental.im._tiling import (
    TileSpec,
    build_tile_specs,
    compute_cell_info_multiscale,
    compute_cell_info_tiled,
    extract_tile,
    run_tiled,
)
from squidpy_tpu.ops.features import regionprops
from squidpy_tpu.utils import logg

__all__ = ["calculate_image_features", "parse_features", "align_to_image_grid"]

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
# Feature-flag grammar (reference: experimental/im/_calculate_image_features.py:89-249).
_MORPHOLOGY_PROPS = frozenset(_DEFAULT_MORPHOLOGY) | {
    "orientation", "solidity", "feret_diameter_max", "convex_area",
    "filled_area", "euler_number", "perimeter_crofton",
}
_INTENSITY_PROPS = frozenset({"intensity_mean", "intensity_std", "intensity_min", "intensity_max"})
# cp_measure-group flags map onto this build's native kernels
# (reference grammar: experimental/im/_calculate_image_features.py:89-110):
# intensity/sizeshape/texture reuse the skimage/squidpy families they
# duplicate; granularity/zernike/radial/correlation run as batched device
# kernels in ops/cellfeats.py (Pearson, Costes auto-threshold C1/C2,
# Manders M1/M2, rank-weighted RWC1/RWC2 per channel pair).
_CORRELATION_VARIANTS = frozenset({"pearson", "costes", "manders_fold", "rwc"})
_CP_MEASURE_GROUPS = frozenset(
    {
        "cp_measure:intensity", "cp_measure:sizeshape", "cp_measure:texture",
        "cp_measure:granularity", "cp_measure:zernike", "cp_measure:feret",
        "cp_measure:radial", "cp_measure:correlation",
    }
    | {f"cp_measure:correlation_{v}" for v in _CORRELATION_VARIANTS}
)
_ALL_FEATURES = (
    _CP_MEASURE_GROUPS
    | {"skimage:morphology", "skimage:intensity"}
    | {"squidpy:summary", "squidpy:texture", "squidpy:histogram"}
)
GRANULARITY_LENGTH = 16
ZERNIKE_NMAX = 9
RADIAL_BINS = 4
GLCM_LEVELS = 32
HIST_BINS = 16


class ParsedFeatures(NamedTuple):
    """Structured per-backend feature selection."""

    morphology_props: frozenset[str] | None
    intensity_props: frozenset[str] | None
    summary: bool
    texture: bool
    histogram: bool
    granularity: bool = False
    zernike: bool = False
    radial: bool = False
    correlation: frozenset[str] = frozenset()


def parse_features(features: list[str] | str | None) -> ParsedFeatures:
    """Parse user-facing feature flags into a structured config.

    Grammar follows the reference's ``_parse_features``
    (/root/reference/src/squidpy/experimental/im/_calculate_image_features.py:163-249):
    ``None`` enables everything; ``skimage:morphology[:prop]`` /
    ``skimage:intensity[:prop]`` select regionprops families (here computed
    by the device segment kernels, the names are the compatibility contract);
    ``squidpy:summary`` / ``squidpy:texture`` / ``squidpy:histogram`` select
    the per-cell summary/GLCM/histogram features. ``cp_measure:*`` groups map
    onto the native device kernels in :mod:`squidpy_tpu.ops.cellfeats`
    (granularity/zernike/radial/correlation) or the equivalent
    skimage/squidpy families they duplicate (intensity/sizeshape/texture/feret).
    """
    if features is None:
        return ParsedFeatures(
            morphology_props=frozenset(_MORPHOLOGY_PROPS),
            intensity_props=frozenset(_INTENSITY_PROPS),
            summary=True,
            texture=True,
            histogram=True,
            granularity=True,
            zernike=True,
            radial=True,
            correlation=frozenset(_CORRELATION_VARIANTS),
        )
    if isinstance(features, str):
        features = [features]

    morphology: set[str] | None = None
    intensity: set[str] | None = None
    summary = texture = histogram = False
    granularity = zernike = radial = False
    correlation: set[str] = set()
    # skimage group vs fine-grained flags for the same family are ambiguous
    # (reference contract: _parse_features raises rather than silently
    # preferring one) — track them separately from cp_measure-implied props
    skimage_group: set[str] = set()
    skimage_fine: set[str] = set()

    def _ambiguous(family: str) -> ValueError:
        return ValueError(
            f"Ambiguous {family} selection: `skimage:{family}` already requests every "
            f"property; do not also pass `skimage:{family}:<prop>` flags."
        )

    for f in features:
        if f == "cp_measure:intensity":
            intensity = set(_INTENSITY_PROPS)
        elif f == "cp_measure:sizeshape":
            # CellProfiler's sizeshape group includes the shape Zernikes
            morphology = set(_MORPHOLOGY_PROPS)
            zernike = True
        elif f == "cp_measure:texture":
            texture = True
        elif f == "cp_measure:granularity":
            granularity = True
        elif f == "cp_measure:zernike":
            zernike = True
        elif f == "cp_measure:feret":
            morphology = (morphology or set()) | {"feret_diameter_max"}
        elif f == "cp_measure:radial":
            radial = True
        elif f == "cp_measure:correlation":
            correlation |= _CORRELATION_VARIANTS
        elif f.startswith("cp_measure:correlation_"):
            variant = f.removeprefix("cp_measure:correlation_")
            if variant not in _CORRELATION_VARIANTS:
                raise ValueError(
                    f"Unknown correlation variant `{variant}`. Available: {sorted(_CORRELATION_VARIANTS)}."
                )
            correlation.add(variant)
        elif f == "skimage:morphology":
            if "morphology" in skimage_fine:
                raise _ambiguous("morphology")
            skimage_group.add("morphology")
            morphology = set(_MORPHOLOGY_PROPS)
        elif f == "skimage:intensity":
            if "intensity" in skimage_fine:
                raise _ambiguous("intensity")
            skimage_group.add("intensity")
            intensity = set(_INTENSITY_PROPS)
        elif f.startswith("skimage:morphology:"):
            prop = f.split(":", 2)[2]
            if prop not in _MORPHOLOGY_PROPS:
                raise ValueError(
                    f"Unknown skimage morphology property `{prop}`. Available: {sorted(_MORPHOLOGY_PROPS)}."
                )
            if "morphology" in skimage_group:
                raise _ambiguous("morphology")
            skimage_fine.add("morphology")
            morphology = (morphology or set()) | {prop}
        elif f.startswith("skimage:intensity:"):
            prop = f.split(":", 2)[2]
            if prop not in _INTENSITY_PROPS:
                raise ValueError(
                    f"Unknown skimage intensity property `{prop}`. Available: {sorted(_INTENSITY_PROPS)}."
                )
            if "intensity" in skimage_group:
                raise _ambiguous("intensity")
            skimage_fine.add("intensity")
            intensity = (intensity or set()) | {prop}
        elif f == "squidpy:summary":
            summary = True
        elif f == "squidpy:texture":
            texture = True
        elif f == "squidpy:histogram":
            histogram = True
        else:
            raise ValueError(
                f"Unknown feature `{f}`. Available: {sorted(_ALL_FEATURES)}, or "
                f"`skimage:morphology:<prop>` / `skimage:intensity:<prop>` for single properties."
            )
    return ParsedFeatures(
        morphology_props=frozenset(morphology) if morphology else None,
        intensity_props=frozenset(intensity) if intensity else None,
        summary=summary,
        texture=texture,
        histogram=histogram,
        granularity=granularity,
        zernike=zernike,
        radial=radial,
        correlation=frozenset(correlation),
    )


def align_to_image_grid(
    image: Any,
    labels: Any,
    labels_translation: tuple[int, int] | tuple[float, float] = (0, 0),
    align_mode: str = "strict",
) -> tuple[Any, Any]:
    """Crop image and labels to their pixel-grid overlap.

    ``labels_translation`` = (ty, tx): labels pixel (0, 0) lands at image
    pixel (ty, tx). Integer translations crop both arrays to the overlap
    rectangle; a fractional translation raises under ``align_mode='strict'``
    and is nearest-neighbor resampled onto the image grid under
    ``'rasterize'`` (reference ``_align_to_image_grid``,
    /root/reference/src/squidpy/experimental/im/_calculate_image_features.py:635-716).
    Cells that would be clipped by the crop are zeroed so no truncated
    features are produced.
    """
    ty, tx = labels_translation
    if float(ty) != int(ty) or float(tx) != int(tx):
        if align_mode == "strict":
            raise ValueError(
                f"Labels are offset by a non-integer translation ({ty}, {tx}) relative to the "
                f"image grid. Pass align_mode='rasterize' to resample the labels."
            )
        lbl = np.asarray(labels)
        img_h, img_w = image.shape[-2], image.shape[-1]
        yy = np.clip(np.round(np.arange(img_h) - float(ty)).astype(np.int64), 0, lbl.shape[0] - 1)
        xx = np.clip(np.round(np.arange(img_w) - float(tx)).astype(np.int64), 0, lbl.shape[1] - 1)
        in_y = (np.arange(img_h) >= ty) & (np.arange(img_h) < ty + lbl.shape[0])
        in_x = (np.arange(img_w) >= tx) & (np.arange(img_w) < tx + lbl.shape[1])
        res = lbl[yy[:, None], xx[None, :]]
        res[~in_y, :] = 0
        res[:, ~in_x] = 0
        return image, res
    ty, tx = int(ty), int(tx)

    img_h, img_w = image.shape[-2], image.shape[-1]
    lbl_h, lbl_w = labels.shape[-2], labels.shape[-1]
    iy0, ix0 = max(0, ty), max(0, tx)
    iy1, ix1 = min(img_h, lbl_h + ty), min(img_w, lbl_w + tx)
    if iy1 <= iy0 or ix1 <= ix0:
        raise ValueError("Image and labels do not overlap.")
    ly0, lx0, ly1, lx1 = iy0 - ty, ix0 - tx, iy1 - ty, ix1 - tx

    lbl = np.asarray(labels)
    crop = np.array(lbl[..., ly0:ly1, lx0:lx1])
    # zero cells only partially inside the overlap (clipped features lie)
    inside = set(np.unique(crop)) - {0}
    border_ids: set[int] = set()
    if ly0 > 0:
        border_ids |= set(np.unique(lbl[..., ly0 - 1, lx0:lx1]).tolist())
    if ly1 < lbl_h:
        border_ids |= set(np.unique(lbl[..., ly1, lx0:lx1]).tolist())
    if lx0 > 0:
        border_ids |= set(np.unique(lbl[..., ly0:ly1, lx0 - 1]).tolist())
    if lx1 < lbl_w:
        border_ids |= set(np.unique(lbl[..., ly0:ly1, lx1]).tolist())
    partial = (border_ids - {0}) & inside
    if partial:
        crop[np.isin(crop, list(partial))] = 0
        logg.warning(f"Dropped `{len(partial)}` cell(s) partially outside the image extent.")
    img_crop = image[..., iy0:iy1, ix0:ix1] if image.ndim >= 2 else image
    return img_crop, crop


def _tile_channels(tile_image: Any, n_channels: int) -> list[np.ndarray]:
    if tile_image.ndim == 2:
        return [np.asarray(tile_image)]
    # channels may be leading (c, y, x) or trailing (y, x, c)
    if tile_image.shape[0] == n_channels:
        return [np.asarray(tile_image[c]) for c in range(n_channels)]
    return [np.asarray(tile_image[..., c]) for c in range(n_channels)]


def _round_up(v: int, granule: int) -> int:
    return ((max(v, 1) + granule - 1) // granule) * granule


def _per_cell_squidpy_features(
    tile_labels: np.ndarray,
    channels: list[np.ndarray],
    ids: np.ndarray,
    parsed: ParsedFeatures,
    channel_names: Sequence[str] | None = None,
) -> dict[str, np.ndarray]:
    """Per-cell summary / texture / histogram over one tile, batched on device.

    Labels are compacted to 1..n and the segment kernels run once per tile;
    the label count and texture crop shapes are padded to coarse buckets so
    the jitted kernels re-specialize rarely (the reference loops python-side
    per region, /root/reference/src/squidpy/experimental/im/
    _calculate_image_features.py:450-537).
    """
    import jax.numpy as jnp

    from squidpy_tpu.ops.features import (
        _per_label_channel_stats_kernel,
        _per_label_histogram_kernel,
        per_cell_texture_batch,
    )
    from squidpy_tpu.utils import to_host

    n_cells = len(ids)
    lut = np.zeros(int(tile_labels.max()) + 1, dtype=np.int32)
    lut[ids] = np.arange(1, n_cells + 1, dtype=np.int32)
    compact = lut[tile_labels]
    num_labels = 1 + _round_up(n_cells, 128)  # bucketized static arg

    # column suffixes: the resolved channel names (sdata coords / user
    # selection) when given, positional `ch{i}` otherwise
    nm = list(channel_names) if channel_names is not None else [f"ch{c}" for c in range(len(channels))]

    out: dict[str, np.ndarray] = {}
    if parsed.summary or parsed.intensity_props:
        stack = np.stack([c.astype(np.float32) for c in channels])
        stats = _per_label_channel_stats_kernel(jnp.asarray(compact), jnp.asarray(stack), num_labels)
        stats = {k: to_host(v)[:, 1 : n_cells + 1] for k, v in stats.items()}
        for c in range(len(channels)):
            if parsed.summary:
                for stat in ("mean", "std", "min", "max"):
                    out[f"summary_{stat}__{nm[c]}"] = stats[stat][c]
            if parsed.intensity_props:
                for prop in sorted(parsed.intensity_props):
                    out[f"{prop}__{nm[c]}"] = stats[prop.removeprefix("intensity_")][c]

    if parsed.histogram:
        for c, chan in enumerate(channels):
            hist = to_host(
                _per_label_histogram_kernel(
                    jnp.asarray(compact), jnp.asarray(chan.astype(np.float32)), num_labels, HIST_BINS
                )
            )[1 : n_cells + 1]
            for b in range(HIST_BINS):
                out[f"histogram_bin{b}__{nm[c]}"] = hist[:, b]

    needs_crops = parsed.texture or parsed.zernike or parsed.radial or parsed.granularity or (
        parsed.correlation and len(channels) >= 2
    )
    if needs_crops:
        bb = regionprops(tile_labels, ["label", "bbox"])
        heights = bb["bbox-2"] - bb["bbox-0"]
        widths = bb["bbox-3"] - bb["bbox-1"]
        side = _round_up(int(max(heights.max(initial=1), widths.max(initial=1))), 32)
        masks = np.zeros((n_cells, side, side), dtype=bool)
        for i in range(n_cells):
            y0, x0, y1, x1 = bb["bbox-0"][i], bb["bbox-1"][i], bb["bbox-2"][i], bb["bbox-3"][i]
            masks[i, : y1 - y0, : x1 - x0] = tile_labels[y0:y1, x0:x1] == ids[i]

        def channel_crops(c: int) -> np.ndarray:
            crops = np.zeros((n_cells, side, side), dtype=np.float32)
            chan = channels[c].astype(np.float32)
            for i in range(n_cells):
                y0, x0, y1, x1 = bb["bbox-0"][i], bb["bbox-1"][i], bb["bbox-2"][i], bb["bbox-3"][i]
                crops[i, : y1 - y0, : x1 - x0] = chan[y0:y1, x0:x1]
            return crops

        if parsed.zernike:
            from squidpy_tpu.ops.cellfeats import zernike_batch, zernike_table

            mags, _ = zernike_batch(masks, n_max=ZERNIKE_NMAX)
            for zi, (zn, zm, _t) in enumerate(zernike_table(ZERNIKE_NMAX)):
                out[f"zernike_{zn}_{zm}"] = mags[:, zi]

        # only the correlation branch needs several channels' crop stacks
        # alive at once; everywhere else a one-slot cache caps the tile's
        # crop memory at a single channel (a full crop stack can run to
        # ~100s of MB, and fresh large allocations are expensive on this
        # single-core host)
        keep_all = bool(parsed.correlation) and len(channels) >= 2
        per_channel_crops: dict[int, np.ndarray] = {}

        def get_crops(c: int) -> np.ndarray:
            if c not in per_channel_crops:
                if not keep_all:
                    per_channel_crops.clear()
                per_channel_crops[c] = channel_crops(c)
            return per_channel_crops[c]

        if parsed.texture:
            props = ("contrast", "dissimilarity", "homogeneity", "energy", "ASM", "correlation")
            for c in range(len(channels)):
                tex = per_cell_texture_batch(get_crops(c), masks, props=props, levels=GLCM_LEVELS)
                for pi, prop in enumerate(props):
                    out[f"texture_{prop}__{nm[c]}"] = tex[:, pi]

        if parsed.granularity:
            from squidpy_tpu.ops.cellfeats import granularity_batch

            for c in range(len(channels)):
                gs = granularity_batch(get_crops(c), masks, length=GRANULARITY_LENGTH)
                for i in range(GRANULARITY_LENGTH):
                    out[f"granularity_{i + 1}__{nm[c]}"] = gs[:, i]

        if parsed.radial:
            from squidpy_tpu.ops.cellfeats import (
                radial_distribution_batch,
                zernike_batch as _zb,
                zernike_table as _zt,
            )

            for c in range(len(channels)):
                crops = get_crops(c)
                rd = radial_distribution_batch(masks, crops, bins=RADIAL_BINS)
                for b in range(RADIAL_BINS):
                    out[f"radial_frac_at_d_{b + 1}of{RADIAL_BINS}__{nm[c]}"] = rd["frac_at_d"][:, b]
                    out[f"radial_mean_frac_{b + 1}of{RADIAL_BINS}__{nm[c]}"] = rd["mean_frac"][:, b]
                    out[f"radial_cv_{b + 1}of{RADIAL_BINS}__{nm[c]}"] = rd["radial_cv"][:, b]
                zmag, zph = _zb(masks, intensity=crops, n_max=ZERNIKE_NMAX)
                for zi, (zn, zm, _t) in enumerate(_zt(ZERNIKE_NMAX)):
                    out[f"radial_zernike_mag_{zn}_{zm}__{nm[c]}"] = zmag[:, zi]
                    out[f"radial_zernike_phase_{zn}_{zm}__{nm[c]}"] = zph[:, zi]

        if parsed.correlation and len(channels) >= 2:
            from squidpy_tpu.ops import cellfeats as cf

            for a in range(len(channels)):
                for b in range(a + 1, len(channels)):
                    ca, cb = get_crops(a), get_crops(b)
                    pair = f"{nm[a]}_{nm[b]}"
                    if "pearson" in parsed.correlation:
                        out[f"correlation_pearson__{pair}"] = cf.pearson_correlation_batch(masks, ca, cb)
                    if "costes" in parsed.correlation:
                        for k, v in cf.costes_coloc_batch(masks, ca, cb).items():
                            out[f"correlation_{k}__{pair}"] = v
                    if "manders_fold" in parsed.correlation:
                        for k, v in cf.manders_batch(masks, ca, cb).items():
                            out[f"correlation_{k}__{pair}"] = v
                    if "rwc" in parsed.correlation:
                        for k, v in cf.rwc_batch(masks, ca, cb).items():
                            out[f"correlation_{k}__{pair}"] = v
    return out


def _image_channel_names(image: Any, n_channels: int) -> list[str]:
    """Channel names carried by the image element (xarray-style ``coords['c']``
    or a ``channel_names`` attribute), falling back to positional ``ch{i}``.
    The reference resolves names from the SpatialData image model's c coords
    (experimental/im/_calculate_image_features.py:763-830)."""
    coords = getattr(image, "coords", None)
    if coords is not None:
        try:
            vals = coords["c"]
            vals = getattr(vals, "values", vals)
            names = [str(v) for v in np.asarray(vals).tolist()]
            if len(names) == n_channels:
                return names
        except (KeyError, TypeError):
            pass
    vals = getattr(image, "channel_names", None)
    if vals is not None and not callable(vals):
        names = [str(v) for v in vals]
        if len(names) == n_channels:
            return names
    return [f"ch{i}" for i in range(n_channels)]


def _resolve_channel_selection(
    channels: Sequence[Any],
    names: Sequence[str],
    n_channels: int,
    *,
    names_only: bool,
) -> list[int]:
    """Map the user's channel selection to indices.

    The SpatialData form takes channel NAMES only (ints raise, matching the
    reference's contract); the direct-array form also accepts integer
    indices. Digit strings fall back to positional indices so ``["0"]``
    works on images without named channels."""
    idxs: list[int] = []
    for ch in channels:
        if isinstance(ch, str):
            if ch in names:
                idxs.append(list(names).index(ch))
            elif ch.isdigit() and int(ch) < n_channels:
                idxs.append(int(ch))
            else:
                raise ValueError(f"Channel {ch!r} not found. Available channels: {list(names)}.")
        elif names_only:
            raise TypeError(
                f"channels must contain strings (channel names); got {type(ch).__name__} {ch!r}. "
                f"Available channels: {list(names)}."
            )
        else:
            i = int(ch)
            if not 0 <= i < n_channels:
                raise ValueError(f"channels {[ch]} out of range for an image with {n_channels} channel(s).")
            idxs.append(i)
    return idxs


def _featurize_tile(
    spec: TileSpec,
    image: Any,
    labels: Any,
    parsed: ParsedFeatures,
    n_channels: int,
    channel_names: Sequence[str] | None = None,
) -> pd.DataFrame:
    tile_image, tile_labels = extract_tile(image, labels, spec)
    if tile_labels.max() == 0:
        return pd.DataFrame()
    morphology = sorted(parsed.morphology_props) if parsed.morphology_props else []
    res = regionprops(tile_labels, ["label", "centroid", *morphology])
    cy0, cx0 = spec.crop[0], spec.crop[1]
    data: dict[str, np.ndarray] = {"label": res["label"]}
    data["centroid_y"] = res["centroid-0"] + cy0
    data["centroid_x"] = res["centroid-1"] + cx0
    for p in morphology:
        if p == "centroid":
            continue
        data[p] = res[p]

    needs_pixels = (
        parsed.summary or parsed.texture or parsed.histogram or parsed.intensity_props
        or parsed.granularity or parsed.radial or parsed.correlation
    )
    if (needs_pixels and image is not None) or parsed.zernike:
        channels = _tile_channels(tile_image, n_channels) if image is not None else []
        data.update(_per_cell_squidpy_features(tile_labels, channels, res["label"], parsed, channel_names))
    return pd.DataFrame(data)


def calculate_image_features(
    image: Any,
    labels: Any = None,
    *,
    features: list[str] | str | None = None,
    channels: Sequence[int] | None = None,
    tile_size: int = 2048,
    overlap_margin: int | str = "auto",
    morphology_props: Sequence[str] | None = None,
    intensity: bool = True,
    invalid_as_zero: bool = False,
    drop_constant_features: bool = False,
    labels_translation: tuple[float, float] = (0, 0),
    align_mode: str = "strict",
    n_jobs: int = 1,
    key_added: str = "cell_features",
    sdata: Any = None,
    table_key: str | None = None,
    image_key: str | None = None,
    labels_key: str | None = None,
    shapes_key: str | None = None,
    scale: str = "full",
    inplace: bool = True,
) -> AnnData:
    """Per-cell features over a (possibly on-disk) image + label pair.

    ``image`` is ``(y, x)``, ``(c, y, x)`` or ``(y, x, c)``; ``labels`` is a
    ``(y, x)`` integer segmentation. Both only need to support numpy-style
    slicing, so memory-mapped/h5py arrays stream tile by tile.

    ``features`` selects feature families with the reference's flag grammar
    (see :func:`parse_features`); ``None`` computes everything. The legacy
    ``morphology_props``/``intensity`` kwargs override the parsed morphology /
    intensity selections when given. ``labels_translation``/``align_mode``
    crop both arrays to their pixel-grid overlap first (see
    :func:`align_to_image_grid`). ``channels`` restricts intensity features
    to those channel indices; ``invalid_as_zero`` replaces non-finite feature
    values with 0 and ``drop_constant_features`` removes zero-variance
    columns (reference kwargs, experimental/im/_calculate_image_features.py:881-887).

    Returns an AnnData with one obs per cell (centroids in
    ``obsm['spatial']``), and attaches it to ``sdata.tables[key_added]`` when
    a SpatialData-like object is passed.
    """
    # reference-surface compatibility: first arg may be a SpatialData-like
    # (image_key/labels_key/shapes_key select elements; a shapes table of
    # circles is rasterized into labels) — reference signature
    # /root/reference/src/squidpy/experimental/im/_calculate_image_features.py:874-887
    from squidpy_tpu.experimental._sdata import is_sdata, resolve_element

    from_sdata = is_sdata(image)
    if from_sdata:
        sdata = image
        if labels is None:
            labels = labels_key if labels_key is not None else shapes_key
        # image_key is an explicit opt-in to pixel features: without it the
        # sdata form runs labels-only even when images exist (reference
        # contract, tests/experimental/test_calculate_image_features.py:964-1008)
        image = (
            None
            if image_key is None
            else resolve_element(sdata, image_key, tree="images", scale=scale, what="image")
        )
    if sdata is not None and isinstance(labels, str):
        if shapes_key is not None and labels == shapes_key:
            if image is None:
                raise ValueError("`shapes_key` requires `image_key` (shapes rasterize onto the image grid).")
            shapes = sdata.shapes[shapes_key]
            # .shape only — never materialize a possibly-lazy WSI here
            labels = _rasterize_circles(shapes, image.shape)
        else:
            labels = resolve_element(sdata, labels, tree="labels", scale=scale, what="labels")
    if labels is None:
        raise ValueError(
            "No segmentation provided: pass `labels_key` (or `shapes_key`) with the "
            "sdata form, or a labels array."
        )

    parsed = parse_features(features)
    if morphology_props is not None:
        unknown = set(morphology_props) - _MORPHOLOGY_PROPS
        if unknown:
            raise ValueError(f"Unknown morphology properties: {sorted(unknown)}.")
        parsed = parsed._replace(morphology_props=frozenset(morphology_props))
    elif features is None:
        parsed = parsed._replace(morphology_props=frozenset(_DEFAULT_MORPHOLOGY))
    if not intensity:
        # every pixel-value-derived family goes, not just the classic four —
        # granularity/radial/correlation read intensities too; zernike stays
        # (it is computed on the binary mask)
        parsed = parsed._replace(
            intensity_props=None, summary=False, texture=False, histogram=False,
            granularity=False, radial=False, correlation=frozenset(),
        )
    if not (
        parsed.morphology_props
        or parsed.intensity_props
        or parsed.summary
        or parsed.texture
        or parsed.histogram
        or parsed.granularity
        or parsed.zernike
        or parsed.radial
        or parsed.correlation
    ):
        raise ValueError(
            "No features requested. Pass feature flags (see `parse_features`) or `features=None` for all."
        )

    if image is None:
        pixel_flags = [
            flag
            for flag, on in (
                ("skimage:intensity", parsed.intensity_props),
                ("squidpy:summary", parsed.summary),
                ("squidpy:texture", parsed.texture),
                ("squidpy:histogram", parsed.histogram),
                ("cp_measure:granularity", parsed.granularity),
                ("cp_measure:radial", parsed.radial),
                ("cp_measure:correlation", parsed.correlation),
            )
            if on
        ]
        if pixel_flags:
            raise ValueError(
                f"Features {pixel_flags} require pixel data; pass `image_key` (or an image array)."
            )
        if channels is not None:
            raise ValueError("`channels` selection requires `image_key`.")
        if tuple(labels_translation) != (0, 0):
            raise ValueError("`labels_translation` requires `image_key` (it aligns labels to the image grid).")

    # multiscale label pyramid (mapping of scale -> array, or sequence of
    # arrays): featurize at the finest level, but take the centroid pass from
    # the coarsest (reference compute_cell_info_multiscale semantics,
    # /root/reference/src/squidpy/experimental/im/_tiling.py:115-155)
    pyramid = None
    if hasattr(labels, "keys"):
        keys = list(labels.keys())
        finest = max(keys, key=lambda k: int(np.prod(labels[k].shape[-2:])))
        pyramid, labels = labels, labels[finest]
        pyramid_target = finest
    elif isinstance(labels, (list, tuple)):
        levels = list(labels)
        finest_i = max(range(len(levels)), key=lambda i: int(np.prod(levels[i].shape[-2:])))
        pyramid, labels = levels, levels[finest_i]
        pyramid_target = finest_i

    if tuple(labels_translation) != (0, 0):
        if pyramid is not None:
            raise ValueError("labels_translation is not supported with a multiscale pyramid.")
        image, labels = align_to_image_grid(image, labels, labels_translation, align_mode)

    lab_shape = labels.shape[-2:]
    if pyramid is not None:
        start = logg.info("Computing cell centroids (multiscale pass on the coarsest level)")
        cell_info = compute_cell_info_multiscale(pyramid, target_scale=pyramid_target)
    else:
        start = logg.info("Computing cell centroids (streaming pass)")
        cell_info = compute_cell_info_tiled(labels, chunk_size=max(tile_size, 2048))
    logg.info(f"Found `{len(cell_info)}` cells", time=start)
    if not cell_info:
        raise ValueError("No cells found in the label image.")

    specs = build_tile_specs(lab_shape, cell_info, tile_size=tile_size, overlap_margin=overlap_margin)

    if image is None:
        n_channels = 0
    else:
        img_shape = image.shape
        if len(img_shape) == 2:
            n_channels = 1
        else:
            n_channels = img_shape[0] if img_shape[-2:] == tuple(lab_shape) else img_shape[-1]
    channel_names = None if image is None else _image_channel_names(image, n_channels)
    if channels is not None:
        idxs = _resolve_channel_selection(channels, channel_names, n_channels, names_only=from_sdata)
        if len(img_shape) == 3:
            image = image[idxs] if img_shape[-2:] == tuple(lab_shape) else image[..., idxs]
        channel_names = [channel_names[i] for i in idxs]
        n_channels = len(idxs)

    start = logg.info(f"Featurizing `{len(specs)}` tiles")
    frames = run_tiled(
        specs,
        _featurize_tile,
        n_jobs=n_jobs,
        scatter=(image, labels, parsed, n_channels, channel_names),
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
    if invalid_as_zero:
        adata.X = np.nan_to_num(adata.X, nan=0.0, posinf=0.0, neginf=0.0)
    if drop_constant_features and adata.n_obs > 1:
        # a single observation makes every column zero-variance; dropping all
        # features of a valid one-cell input would be silently destructive
        with np.errstate(invalid="ignore"):
            keep = np.nanstd(adata.X, axis=0) > 0
        if not keep.all():
            logg.info(f"Dropping `{int((~keep).sum())}` constant feature(s)")
            adata = adata[:, keep].copy()
    adata.obsm["spatial"] = df[["centroid_x", "centroid_y"]].to_numpy(dtype=np.float64)
    adata.uns["cell_features"] = {"tile_size": tile_size, "n_tiles": len(specs)}
    logg.info("Finish", time=start)

    if sdata is not None and inplace and hasattr(sdata, "tables"):
        sdata.tables[key_added] = adata
    return adata


def _rasterize_circles(shapes: Any, image_shape: tuple[int, ...]) -> np.ndarray:
    """Rasterize a circle table (columns ``x``/``y``/``radius``, e.g. Visium
    spots) into an integer label image — the stand-in for the reference's
    geopandas rasterization (``shapes_key`` path,
    /root/reference/src/squidpy/experimental/im/_calculate_image_features.py:635-716)."""
    import pandas as pd

    df = pd.DataFrame(shapes)
    cols = {c.lower(): c for c in df.columns}
    missing = [c for c in ("x", "y", "radius") if c not in cols]
    if missing:
        raise ValueError(
            f"Shapes table must provide columns x/y/radius to rasterize, missing {missing}. "
            "(Polygon geometries require the geopandas-backed reference path.)"
        )
    if len(image_shape) == 3:
        # the image may be channel-first (c, y, x) or channels-last
        # (y, x, c): the channel axis is the smaller of the two ends
        h, w = image_shape[1:] if image_shape[0] < image_shape[-1] else image_shape[:2]
    elif len(image_shape) == 2:
        h, w = image_shape
    else:
        raise ValueError(f"Cannot rasterize onto an image of shape {tuple(image_shape)}.")
    out = np.zeros((h, w), np.int32)
    for lid, row in enumerate(df.itertuples(index=False), start=1):
        x = float(getattr(row, cols["x"]))
        y = float(getattr(row, cols["y"]))
        r = float(getattr(row, cols["radius"]))
        y0, y1 = max(int(y - r), 0), min(int(y + r) + 1, h)
        x0, x1 = max(int(x - r), 0), min(int(x + r) + 1, w)
        if y1 <= y0 or x1 <= x0:
            continue
        yy, xx = np.mgrid[y0:y1, x0:x1]
        out[y0:y1, x0:x1][(yy - y) ** 2 + (xx - x) ** 2 <= r * r] = lid
    return out
