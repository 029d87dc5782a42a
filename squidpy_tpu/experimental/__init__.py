"""Experimental subpackage: tiled whole-slide-image pipeline, stain
normalization, QC, tissue detection, stitching."""

from squidpy_tpu.experimental import im, pl, tl, utils

__all__ = ["im", "tl", "pl", "utils"]
