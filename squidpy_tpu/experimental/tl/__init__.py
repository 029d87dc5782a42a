"""Experimental tools."""

from squidpy_tpu.experimental.tl._tiling_qc import TilingQCParams, calculate_tiling_qc
from squidpy_tpu.experimental.tl._tiling_stitch import StitchParams, assign_stitch_groups

__all__ = ["StitchParams", "TilingQCParams", "calculate_tiling_qc", "assign_stitch_groups"]
