"""Experimental tools."""

from squidpy_tpu.experimental.tl._tiling_qc import calculate_tiling_qc
from squidpy_tpu.experimental.tl._tiling_stitch import assign_stitch_groups

__all__ = ["calculate_tiling_qc", "assign_stitch_groups"]
