"""Deprecated napari interactive visualization module.

Parity with the reference's removal stub
(/root/reference/src/squidpy/pl/_interactive/__init__.py:1-14): the napari
plugin was deprecated upstream in favor of napari-spatialdata, and importing
this module raises with the same guidance.
"""

from __future__ import annotations

raise ImportError(
    "The squidpy napari plugin has been deprecated and removed. "
    "Please use napari-spatialdata instead: "
    "https://github.com/scverse/napari-spatialdata"
)
