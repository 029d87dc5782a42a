"""Experimental image pipeline (tiled WSI processing)."""

from squidpy_tpu.experimental.im._calculate_image_features import calculate_image_features
from squidpy_tpu.experimental.im._detect_tissue import (
    BackgroundDetectionParams,
    FelzenszwalbParams,
    WekaParams,
    detect_tissue,
)
from squidpy_tpu.experimental.im._make_tiles import make_tiles, make_tiles_from_spots
from squidpy_tpu.experimental.im._qc import QCMetric, qc_image
from squidpy_tpu.experimental.im._stain import (
    apply_stain_normalization,
    MacenkoParams,
    ReinhardParams,
    StainFittingError,
    StainReference,
    VahadaneParams,
    decompose_stains,
    default_white_point,
    estimate_white_point,
    fit_stain_reference,
    normalize_stains,
    reinhard_normalize,
    validate_rgb_range,
    white_point_from_background,
)
from squidpy_tpu.experimental.im._stitched_labels import make_stitched_labels
from squidpy_tpu.experimental.im._tiling import (
    CellInfo,
    TileSpec,
    build_tile_specs,
    compute_cell_info,
    compute_cell_info_multiscale,
    compute_cell_info_tiled,
    extract_labels_tile,
    extract_tile,
    run_tiled,
)

__all__ = [
    "apply_stain_normalization",
    "BackgroundDetectionParams",
    "FelzenszwalbParams",
    "MacenkoParams",
    "ReinhardParams",
    "VahadaneParams",
    "WekaParams",
    "calculate_image_features",
    "detect_tissue",
    "qc_image",
    "QCMetric",
    "make_tiles",
    "make_tiles_from_spots",
    "make_stitched_labels",
    "normalize_stains",
    "decompose_stains",
    "fit_stain_reference",
    "estimate_white_point",
    "default_white_point",
    "validate_rgb_range",
    "white_point_from_background",
    "reinhard_normalize",
    "StainFittingError",
    "StainReference",
    "CellInfo",
    "TileSpec",
    "build_tile_specs",
    "compute_cell_info",
    "compute_cell_info_multiscale",
    "compute_cell_info_tiled",
    "extract_tile",
    "extract_labels_tile",
    "run_tiled",
]
