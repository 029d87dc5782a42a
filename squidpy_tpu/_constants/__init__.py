from squidpy_tpu._constants import _constants as constants
from squidpy_tpu._constants._pkg_constants import Key

__all__ = ["Key", "constants"]
