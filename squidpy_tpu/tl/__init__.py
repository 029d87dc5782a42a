"""The tools module (design matrices, window assignments)."""

from squidpy_tpu.tl._sliding_window import sliding_window
from squidpy_tpu.tl._var_by_distance import var_by_distance

__all__ = ["sliding_window", "var_by_distance"]
