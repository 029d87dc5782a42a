"""Cell-aware tiling for large images.

Re-design of /root/reference/src/squidpy/experimental/im/_tiling.py:49-498 for
the TPU stack: tiles split a label image into overlapping crops such that
every cell is owned (by centroid) by exactly one tile, so downstream
featurization never double-counts. The reference's dask-backed lazy arrays
are replaced by anything sliceable (numpy, h5py/zarr datasets) and its
``dask.distributed`` engine by a thread pool that overlaps host tile reads
with device compute — the compute itself is one batched device kernel per
tile, so no process pool is needed.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Any, Literal

import numpy as np

from squidpy_tpu.utils import logg

__all__ = [
    "CellInfo",
    "TileSpec",
    "compute_cell_info",
    "compute_cell_info_tiled",
    "compute_cell_info_multiscale",
    "build_tile_specs",
    "extract_tile",
    "extract_labels_tile",
    "run_tiled",
]


def _as_2d(arr: np.ndarray) -> np.ndarray:
    return arr.squeeze() if arr.ndim > 2 else arr


@dataclass(frozen=True)
class CellInfo:
    """Centroid and bounding box of a single label."""

    label: int
    centroid_y: float
    centroid_x: float
    bbox_h: int
    bbox_w: int
    bbox_y0: int = 0
    bbox_x0: int = 0


@dataclass(frozen=True)
class TileSpec:
    """One tile: the non-overlapping ``base`` region used for centroid
    ownership, the halo-extended ``crop`` actually read, and the owned ids."""

    base: tuple[int, int, int, int]
    crop: tuple[int, int, int, int]
    owned_ids: frozenset[int]


def _accumulate_chunk(
    chunk: np.ndarray,
    y0: int,
    x0: int,
    acc: dict[int, list[float]],
) -> None:
    """Accumulate per-label area/coordinate sums/bbox from one chunk
    (vectorized bincount sweep; no per-label python loop over pixels)."""
    labels = chunk.ravel()
    if labels.size == 0:
        return
    present = np.unique(labels)
    present = present[present > 0]
    if not len(present):
        return
    h, w = chunk.shape
    yy = np.repeat(np.arange(h, dtype=np.float64), w) + y0
    xx = np.tile(np.arange(w, dtype=np.float64), h) + x0
    maxlab = int(present.max())
    area = np.bincount(labels, minlength=maxlab + 1)
    sumy = np.bincount(labels, weights=yy, minlength=maxlab + 1)
    sumx = np.bincount(labels, weights=xx, minlength=maxlab + 1)
    # bbox via per-label min/max of coordinates
    ys, xs = np.nonzero(chunk)
    labs_nz = chunk[ys, xs]
    order = np.argsort(labs_nz, kind="stable")
    labs_s = labs_nz[order]
    ys_s = ys[order] + y0
    xs_s = xs[order] + x0
    starts = np.searchsorted(labs_s, present)
    ends = np.searchsorted(labs_s, present, side="right")
    for lid, s, e in zip(present.tolist(), starts.tolist(), ends.tolist()):
        a = acc.setdefault(lid, [0.0, 0.0, 0.0, np.inf, -np.inf, np.inf, -np.inf])
        a[0] += float(area[lid])
        a[1] += float(sumy[lid])
        a[2] += float(sumx[lid])
        a[3] = min(a[3], float(ys_s[s:e].min()))
        a[4] = max(a[4], float(ys_s[s:e].max()) + 1)
        a[5] = min(a[5], float(xs_s[s:e].min()))
        a[6] = max(a[6], float(xs_s[s:e].max()) + 1)


def _acc_to_info(acc: dict[int, list[float]]) -> dict[int, CellInfo]:
    return {
        lid: CellInfo(
            label=lid,
            centroid_y=a[1] / a[0],
            centroid_x=a[2] / a[0],
            bbox_h=int(a[4] - a[3]),
            bbox_w=int(a[6] - a[5]),
            bbox_y0=int(a[3]),
            bbox_x0=int(a[5]),
        )
        for lid, a in acc.items()
    }


def compute_cell_info(labels: np.ndarray) -> dict[int, CellInfo]:
    """Centroid + bbox for every label of an in-memory 2D label image."""
    acc: dict[int, list[float]] = {}
    _accumulate_chunk(_as_2d(np.asarray(labels)), 0, 0, acc)
    return _acc_to_info(acc)


def compute_cell_info_tiled(labels_da: Any, chunk_size: int = 4096) -> dict[int, CellInfo]:
    """Streaming centroid pass over a sliceable (possibly on-disk) label array.

    A label spanning chunk boundaries is recovered by area-weighted merging of
    per-chunk partial sums (reference: _tiling.py:155-220).
    """
    height, width = labels_da.shape[-2], labels_da.shape[-1]
    acc: dict[int, list[float]] = {}
    for y0 in range(0, height, chunk_size):
        for x0 in range(0, width, chunk_size):
            chunk = _as_2d(np.asarray(labels_da[..., y0 : y0 + chunk_size, x0 : x0 + chunk_size]))
            _accumulate_chunk(chunk, y0, x0, acc)
    return _acc_to_info(acc)


def _yx_size(arr: Any) -> tuple[int, int]:
    shape = tuple(arr.shape)
    return int(shape[-2]), int(shape[-1])


def compute_cell_info_multiscale(
    labels_node: Any,
    target_scale: str | int = "scale0",
) -> dict[int, CellInfo]:
    """Centroids/bboxes from the COARSEST level of a multiscale label labels_node,
    rescaled to ``target_scale`` coordinates.

    Mirrors the reference's ``compute_cell_info_multiscale``
    (/root/reference/src/squidpy/experimental/im/_tiling.py:115-155) but
    duck-typed instead of xarray-DataTree-bound: ``labels_node`` is either a
    mapping of scale name → 2D sliceable label array or a sequence of such
    arrays (``target_scale`` then being an index). Only the smallest level is
    materialized — the cheap pass for WSI pyramids whose full resolution never
    fits in memory.

    Centroid coordinates scale exactly; bbox corners are floored and extents
    ceiled so the scaled box always covers the cell.
    """
    if hasattr(labels_node, "keys"):
        keys = list(labels_node.keys())
        if not keys:
            return {}
        get = labels_node.__getitem__
        target = get(target_scale)
        coarsest_key = min(keys, key=lambda k: int(np.prod(_yx_size(get(k)))))
        coarse = get(coarsest_key)
    else:
        levels = list(labels_node)
        if not levels:
            return {}
        if isinstance(target_scale, str):
            target_scale = int(target_scale.removeprefix("scale"))
        target = levels[target_scale]
        coarse = min(levels, key=lambda a: int(np.prod(_yx_size(a))))

    coarse_arr = _as_2d(np.asarray(coarse))
    if coarse_arr.ndim != 2:
        raise ValueError(f"Expected 2D labels at the coarsest scale, got shape {coarse_arr.shape}")
    target_h, target_w = _yx_size(target)
    coarse_h, coarse_w = coarse_arr.shape
    sy = target_h / coarse_h
    sx = target_w / coarse_w

    info = compute_cell_info(coarse_arr)
    return {
        lid: CellInfo(
            label=lid,
            centroid_y=c.centroid_y * sy,
            centroid_x=c.centroid_x * sx,
            # scale the box END up and the START down so the scaled box
            # always covers the cell (floor(y0*s)+ceil(h*s) can undercover
            # by a pixel when the two fractional parts sum past 1)
            bbox_h=int(np.ceil((c.bbox_y0 + c.bbox_h) * sy)) - int(np.floor(c.bbox_y0 * sy)),
            bbox_w=int(np.ceil((c.bbox_x0 + c.bbox_w) * sx)) - int(np.floor(c.bbox_x0 * sx)),
            bbox_y0=int(np.floor(c.bbox_y0 * sy)),
            bbox_x0=int(np.floor(c.bbox_x0 * sx)),
        )
        for lid, c in info.items()
    }


def _auto_margin(cell_info: dict[int, CellInfo]) -> int:
    """Minimum halo that covers the largest cell's half-extent (+1 pixel)."""
    if not cell_info:
        return 0
    max_extent = max(max(c.bbox_h, c.bbox_w) for c in cell_info.values())
    return int(np.ceil(max_extent / 2)) + 1


def build_tile_specs(
    grid_shape: tuple[int, int],
    cell_info: dict[int, CellInfo],
    tile_size: int = 2048,
    overlap_margin: int | Literal["auto"] = "auto",
) -> list[TileSpec]:
    """Partition the grid into base tiles + halo crops with centroid ownership.

    Tiles owning no cells are omitted (reference: _tiling.py:231-298).
    """
    height, width = grid_shape
    if tile_size <= 0:
        raise ValueError(f"tile_size must be positive, got {tile_size}")
    margin = _auto_margin(cell_info) if overlap_margin == "auto" else int(overlap_margin)
    if margin < 0:
        raise ValueError(f"overlap_margin must be non-negative, got {margin}")

    tile_to_cells: dict[tuple[int, int], set[int]] = {}
    for lid, cell in cell_info.items():
        row = min(int(cell.centroid_y) // tile_size, (height - 1) // tile_size)
        col = min(int(cell.centroid_x) // tile_size, (width - 1) // tile_size)
        tile_to_cells.setdefault((row, col), set()).add(lid)

    specs: list[TileSpec] = []
    for (row, col), owned in sorted(tile_to_cells.items()):
        by0, bx0 = row * tile_size, col * tile_size
        by1, bx1 = min(by0 + tile_size, height), min(bx0 + tile_size, width)
        specs.append(
            TileSpec(
                base=(by0, bx0, by1, bx1),
                crop=(max(by0 - margin, 0), max(bx0 - margin, 0), min(by1 + margin, height), min(bx1 + margin, width)),
                owned_ids=frozenset(owned),
            )
        )
    return specs


def extract_tile(image: Any, labels: Any, spec: TileSpec) -> tuple[np.ndarray, np.ndarray]:
    """Read one tile's image crop and ownership-masked labels.

    Handles both channel layouts: a 3D image whose LAST axis is small (≤ 8)
    is treated as channels-last ``(y, x, c)`` and sliced on the leading axes;
    anything else is channels-first ``(..., y, x)``. Slicing happens before
    materialization so lazy readers only load the tile.
    """
    cy0, cx0, cy1, cx1 = spec.crop
    if image is None:  # labels-only featurization (morphology without pixels)
        return None, extract_labels_tile(labels, spec)
    shape = getattr(image, "shape", None)
    if shape is not None and len(shape) == 3 and shape[-1] <= 8 < shape[0]:
        tile_image = np.asarray(image[cy0:cy1, cx0:cx1, :])
    else:
        tile_image = np.asarray(image[..., cy0:cy1, cx0:cx1])
    return tile_image, extract_labels_tile(labels, spec)


def extract_labels_tile(labels: Any, spec: TileSpec) -> np.ndarray:
    """Read one tile's labels with non-owned cells zeroed."""
    cy0, cx0, cy1, cx1 = spec.crop
    tile_labels = _as_2d(np.asarray(labels[..., cy0:cy1, cx0:cx1])).copy()
    _zero_non_owned(tile_labels, spec.owned_ids)
    return tile_labels


def _zero_non_owned(tile_labels: np.ndarray, owned_ids: frozenset[int]) -> None:
    """Zero labels outside ``owned_ids`` in place (LUT for dense ids,
    ``np.isin`` for sparse large id spaces)."""
    if tile_labels.size == 0:
        return
    if not owned_ids:
        tile_labels[:] = 0
        return
    max_id = int(tile_labels.max())
    if max_id < tile_labels.size:
        lut = np.zeros(max_id + 1, dtype=bool)
        for lid in owned_ids:
            if lid <= max_id:
                lut[lid] = True
        tile_labels[~lut[tile_labels]] = 0
    else:
        owned_arr = np.fromiter(owned_ids, dtype=tile_labels.dtype, count=len(owned_ids))
        tile_labels[~np.isin(tile_labels, owned_arr)] = 0


def run_tiled(
    specs: Sequence[TileSpec],
    process_fn: Callable[..., Any],
    *,
    n_jobs: int = 1,
    scatter: Sequence[Any] = (),
    desc: str = "tiles",
    devices: Literal["auto", "single"] | Sequence[Any] = "auto",
) -> list[Any]:
    """Run ``process_fn(spec, *scatter)`` over tiles, preserving spec order.

    With ``n_jobs > 1`` a thread pool overlaps host tile IO with device
    compute; there is no process pool or scheduler — per-tile numerics run as
    batched device kernels, so threads are the right concurrency primitive
    here (unlike the reference's GIL-bound per-tile python,
    _tiling.py:443-498).

    On a multi-device mesh, tiles are round-robined across the local devices
    (each worker thread runs its tile under ``jax.default_device``), so tile
    kernels execute on the whole mesh concurrently — the TPU counterpart of
    the reference's dask ``LocalCluster`` tile execution. Pass
    ``devices="single"`` to pin everything to the default device, or an
    explicit device sequence to control placement.
    """
    n = len(specs)
    if n == 0:
        return []
    if devices == "auto":
        import jax

        dev_list = jax.local_devices()
    elif devices == "single":
        dev_list = []
    else:
        dev_list = list(devices)

    def run_one(i: int, spec: TileSpec) -> Any:
        if len(dev_list) > 1:
            import jax

            with jax.default_device(dev_list[i % len(dev_list)]):
                return process_fn(spec, *scatter)
        return process_fn(spec, *scatter)

    logg.info(
        f"Processing `{n}` {desc} with `{max(n_jobs, 1)}` worker(s)"
        + (f" over `{len(dev_list)}` devices" if len(dev_list) > 1 else "")
    )
    if n_jobs <= 1 or n == 1:
        return [run_one(i, spec) for i, spec in enumerate(specs)]
    with ThreadPoolExecutor(max_workers=min(n_jobs, n)) as pool:
        return list(pool.map(run_one, range(n), specs))
