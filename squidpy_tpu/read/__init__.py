"""Spatial omics dataset readers."""

from squidpy_tpu.read._read import nanostring, visium, vizgen
from squidpy_tpu.read._utils import read_10x_h5, read_10x_mtx

__all__ = ["visium", "vizgen", "nanostring", "read_10x_h5", "read_10x_mtx"]
