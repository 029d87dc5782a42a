"""Lightweight timing-through-logging.

The reference times every public call by logging a start sentinel and printing
elapsed time on finish (e.g. /root/reference/src/squidpy/gr/_ppatterns.py:219,250).
This module reproduces that surface (``logg.info`` returning a start time,
``time=`` kwarg printing the delta) without depending on scanpy.
"""

from __future__ import annotations

import logging
import sys
import time as _time
from contextlib import contextmanager
from datetime import datetime

__all__ = ["logg", "verbosity"]

_logger = logging.getLogger("squidpy_tpu")
if not _logger.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter("%(message)s"))
    _logger.addHandler(_h)
    _logger.setLevel(logging.INFO)


class _Logg:
    """scanpy-logging-compatible facade: ``info`` returns a start timestamp."""

    def _emit(self, level: int, msg: str, time: datetime | float | None = None, deep: str | None = None) -> float:
        now = _time.monotonic()
        if time is not None:
            elapsed = now - (time if isinstance(time, float) else 0.0)
            msg = f"{msg} ({elapsed:.2f}s)"
        if deep:
            msg = f"{msg} — {deep}"
        _logger.log(level, msg)
        return now

    def info(self, msg: str, *, time: float | None = None, deep: str | None = None) -> float:
        return self._emit(logging.INFO, msg, time=time, deep=deep)

    def debug(self, msg: str, *, time: float | None = None, deep: str | None = None) -> float:
        return self._emit(logging.DEBUG, msg, time=time, deep=deep)

    def warning(self, msg: str) -> float:
        return self._emit(logging.WARNING, msg)

    def error(self, msg: str) -> float:
        return self._emit(logging.ERROR, msg)


logg = _Logg()


@contextmanager
def verbosity(level: int):  # noqa: ANN201
    """Temporarily set the logger level (0=errors … 4=debug), scanpy-style."""
    mapping = {0: logging.ERROR, 1: logging.WARNING, 2: logging.INFO, 3: logging.INFO, 4: logging.DEBUG}
    old = _logger.level
    _logger.setLevel(mapping.get(level, logging.INFO))
    try:
        yield
    finally:
        _logger.setLevel(old)
