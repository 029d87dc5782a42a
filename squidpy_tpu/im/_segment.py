"""Image segmentation: watershed + custom models, with tiled execution.

API parity with /root/reference/src/squidpy/im/_segment.py:27-366. The
watershed itself is the framework's native C++ priority-flood kernel
(:mod:`squidpy_tpu.native`); Otsu thresholding, the euclidean distance
transform, and peak detection are scipy/numpy host ops. The reference's dask
``map_overlap`` + dask-image relabel pipeline is replaced by an explicit tile
grid with halo overlap whose boundary label equivalences are merged by the
native union-find relabel (:func:`squidpy_tpu.native.relabel_merge`).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from collections.abc import Callable, Sequence
from typing import Any

import numpy as np
from scipy import ndimage as ndi

from squidpy_tpu._constants._constants import SegmentationBackend
from squidpy_tpu._constants._pkg_constants import Key
from squidpy_tpu.im._container import ImageContainer
from squidpy_tpu.native import relabel_merge, watershed
from squidpy_tpu.utils import NDArrayA, logg

__all__ = ["SegmentationModel", "SegmentationWatershed", "SegmentationCustom", "segment"]

_SEG_DTYPE = np.uint32


def threshold_otsu(image: NDArrayA, nbins: int = 256) -> float:
    """Otsu's threshold (between-class variance maximization)."""
    counts, bin_edges = np.histogram(image.ravel(), bins=nbins)
    centers = (bin_edges[:-1] + bin_edges[1:]) / 2.0
    counts = counts.astype(float)
    w1 = np.cumsum(counts)
    w2 = np.cumsum(counts[::-1])[::-1]
    m1 = np.cumsum(counts * centers) / np.where(w1 == 0, 1, w1)
    m2 = (np.cumsum((counts * centers)[::-1]) / np.where(w2[::-1] == 0, 1, w2[::-1]))[::-1]
    var_between = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    return float(centers[:-1][np.argmax(var_between)])


def peak_local_max(image: NDArrayA, footprint: NDArrayA, labels: NDArrayA | None = None) -> NDArrayA:
    """Local-maximum coordinates (maximum-filter equality test), skimage-style."""
    maxed = ndi.maximum_filter(image, footprint=footprint, mode="constant")
    mask = (image == maxed) & (image > 0)
    if labels is not None:
        mask &= labels.astype(bool)
    return np.column_stack(np.nonzero(mask))


class SegmentationModel(ABC):
    """Base class for segmentation models (watershed, custom callables)."""

    def __init__(self, model: Any):
        self._model = model

    @abstractmethod
    def _segment(self, arr: NDArrayA, **kwargs: Any) -> NDArrayA:
        ...

    @staticmethod
    def _precondition(img: NDArrayA) -> NDArrayA:
        if img.ndim == 2:
            img = img[:, :, np.newaxis]
        if img.ndim != 3:
            raise ValueError(f"Expected `2` or `3` dimensions, found `{img.ndim}`.")
        return img

    @staticmethod
    def _postcondition(img: NDArrayA) -> NDArrayA:
        if img.ndim == 2:
            img = img[..., np.newaxis]
        if img.ndim != 3:
            raise ValueError(f"Expected segmentation to return `2` or `3` dimensional array, found `{img.ndim}`.")
        if not np.issubdtype(img.dtype, np.integer):
            raise TypeError(f"Expected segmentation to be of integer type, found `{img.dtype}`.")
        return img.astype(_SEG_DTYPE)

    def segment(self, img: NDArrayA | ImageContainer, **kwargs: Any) -> NDArrayA | ImageContainer:
        """Segment an array or every Z-slice of a container layer."""
        if isinstance(img, ImageContainer):
            layer = img._get_layer(kwargs.pop("layer", None))
            channel = kwargs.pop("channel", 0)
            library_id = kwargs.pop("library_id", None)
            fn_kwargs = kwargs.pop("fn_kwargs", {})
            copy = kwargs.pop("copy", True)
            kwargs.pop("chunks", None)
            kwargs.pop("drop", None)
            kwargs.pop("lazy", None)

            def _run(plane: NDArrayA, **kw: Any) -> NDArrayA:
                arr = plane if plane.ndim == 3 else plane[..., None]
                if channel is not None:
                    arr = arr[..., channel : channel + 1]
                return np.asarray(self.segment(arr, **fn_kwargs)).squeeze(-1)

            fn: Any = _run
            if library_id is not None:
                lids = img._get_library_ids(library_id)
                fn = dict.fromkeys(lids, _run)
            return img.apply(fn, layer=layer, copy=copy)

        chunks = kwargs.pop("chunks", None)
        img = SegmentationModel._precondition(np.asarray(img))
        if chunks is not None:
            out = self._segment_tiled(img, chunks=chunks, **kwargs)
        else:
            out = self._segment(img, **kwargs)
        return SegmentationModel._postcondition(np.asarray(out))

    def _segment_tiled(
        self,
        img: NDArrayA,
        chunks: int | tuple[int, int],
        depth: int = 30,
        **kwargs: Any,
    ) -> NDArrayA:
        """Tile-grid segmentation with halo overlap + native label reconciliation.

        Each tile is segmented with a ``depth``-pixel halo; per-tile labels are
        offset into disjoint ranges, equivalences are collected where core
        regions of adjacent tiles observe the same object in their shared
        halo, and the native union-find merge produces a consistent global
        labeling — the reference's map_overlap + dask-image relabel, without a
        scheduler (im/_segment.py:105-206).
        """
        if isinstance(chunks, int):
            chunks = (chunks, chunks)
        h, w = img.shape[:2]
        ty, tx = chunks
        canvas = np.zeros((h, w), dtype=np.int64)
        halo_canvas = np.zeros((h, w), dtype=np.int64)  # labels incl. halo overwrite
        offset = 0
        pairs: list[tuple[int, int]] = []

        tiles = [
            (y0, min(y0 + ty, h), x0, min(x0 + tx, w))
            for y0 in range(0, h, ty)
            for x0 in range(0, w, tx)
        ]
        for (y0, y1, x0, x1) in tiles:
            gy0, gy1 = max(y0 - depth, 0), min(y1 + depth, h)
            gx0, gx1 = max(x0 - depth, 0), min(x1 + depth, w)
            sub = img[gy0:gy1, gx0:gx1]
            lab = np.asarray(self._segment(sub, **kwargs)).squeeze()
            lab = lab.astype(np.int64)
            lab[lab > 0] += offset
            offset = max(offset, int(lab.max()))

            core = lab[y0 - gy0 : y1 - gy0, x0 - gx0 : x1 - gx0]
            # equivalences: where this tile's halo overlaps previously
            # written labels (canvas or halo), both nonzero
            prev = halo_canvas[gy0:gy1, gx0:gx1]
            both = (prev > 0) & (lab > 0)
            if both.any():
                pairs.extend({(int(a), int(b)) for a, b in zip(prev[both].ravel(), lab[both].ravel())})
            canvas[y0:y1, x0:x1] = core
            region = halo_canvas[gy0:gy1, gx0:gx1]
            region[lab > 0] = lab[lab > 0]

        if pairs:
            merged, _ = relabel_merge(canvas.ravel(), np.asarray(pairs, dtype=np.int64))
            canvas = merged.reshape(canvas.shape)
        else:
            merged, _ = relabel_merge(canvas.ravel(), np.empty((0, 2), dtype=np.int64))
            canvas = merged.reshape(canvas.shape)
        return canvas.astype(_SEG_DTYPE)[..., None]

    def __repr__(self) -> str:
        return self.__class__.__name__

    def __str__(self) -> str:
        return repr(self)


class SegmentationWatershed(SegmentationModel):
    """Watershed segmentation via the native priority-flood kernel."""

    def __init__(self) -> None:
        super().__init__(model=None)

    def _segment(
        self,
        arr: NDArrayA,
        thresh: float | None = None,
        geq: bool = True,
        **kwargs: Any,
    ) -> NDArrayA:
        arr = np.asarray(arr)
        if arr.ndim == 3:
            arr = arr.squeeze(-1)
        if thresh is None:
            thresh = threshold_otsu(arr)
        mask: NDArrayA = (arr >= thresh) if geq else (arr < thresh)
        distance = ndi.distance_transform_edt(mask)
        coords = peak_local_max(distance, footprint=np.ones((5, 5)), labels=mask)
        local_maxi = np.zeros(distance.shape, dtype=bool)
        local_maxi[tuple(coords.T)] = True
        markers, _ = ndi.label(local_maxi)
        return watershed(-distance.astype(np.float32), markers.astype(np.int32), mask=mask)


class SegmentationCustom(SegmentationModel):
    """Segmentation from a user-supplied callable
    ``(height, width, channels) -> (height, width[, 1])`` of integer dtype."""

    def __init__(self, func: Callable[..., NDArrayA]):
        if not callable(func):
            raise TypeError()
        super().__init__(model=func)

    def _segment(self, arr: NDArrayA, **kwargs: Any) -> NDArrayA:
        return np.asarray(self._model(arr, **kwargs))

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}[function={getattr(self._model, '__name__', None)}]"


def segment(
    img: ImageContainer,
    layer: str | None = None,
    library_id: str | Sequence[str] | None = None,
    method: str | SegmentationModel | Callable[..., NDArrayA] = "watershed",
    channel: int | None = 0,
    chunks: str | int | tuple[int, int] | None = None,
    lazy: bool = False,
    layer_added: str | None = None,
    copy: bool = False,
    **kwargs: Any,
) -> ImageContainer | None:
    """Segment an image layer; result lands in ``'segmented_{method}'``."""
    layer = img._get_layer(layer)
    kind = SegmentationBackend.CUSTOM if callable(method) else SegmentationBackend(method)
    layer_new = Key.img.segment(kind, layer_added=layer_added)
    if chunks is not None:
        kwargs["chunks"] = chunks
    library_id = img._get_library_ids(library_id)

    if not isinstance(method, SegmentationModel):
        if kind == SegmentationBackend.WATERSHED:
            if channel is None and img[layer].shape[-1] > 1:
                raise ValueError("Watershed segmentation does not work with multiple channels.")
            method = SegmentationWatershed()
        elif kind == SegmentationBackend.CUSTOM:
            if not callable(method):
                raise TypeError(f"Expected `method` to be a callable, found `{type(method)}`.")
            method = SegmentationCustom(func=method)
        else:
            raise NotImplementedError(f"Model `{kind}` is not yet implemented.")

    start = logg.info(f"Segmenting an image of shape `{img[layer].shape}` using `{method}`")
    res = method.segment(
        img,
        layer=layer,
        channel=channel,
        library_id=library_id,
        fn_kwargs=kwargs,
        copy=True,
    )
    # enforce integer segmentation dtype
    res._layers[layer] = res._layers[layer].astype(_SEG_DTYPE)
    logg.info("Finish", time=start)

    if copy:
        return res.rename(layer, layer_new)
    img._layers[layer_new] = res[layer]
    return None
