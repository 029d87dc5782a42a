"""The image module."""

from squidpy_tpu.im._container import ImageContainer
from squidpy_tpu.im._coords import CropCoords, CropPadding
from squidpy_tpu.im._feature import calculate_image_features
from squidpy_tpu.im._process import process
from squidpy_tpu.im._segment import (
    SegmentationCustom,
    SegmentationModel,
    SegmentationWatershed,
    segment,
)

__all__ = [
    "ImageContainer",
    "CropCoords",
    "CropPadding",
    "calculate_image_features",
    "process",
    "segment",
    "SegmentationModel",
    "SegmentationWatershed",
    "SegmentationCustom",
]
