"""The tools module (design matrices, window assignments)."""

from squidpy_tpu.tl._sliding_window import _calculate_window_corners, sliding_window
from squidpy_tpu.tl._var_by_distance import var_by_distance

# _calculate_window_corners is exported for parity with the reference
# (/root/reference/src/squidpy/tl/__init__.py exposes it in __all__)
__all__ = ["_calculate_window_corners", "sliding_window", "var_by_distance"]
