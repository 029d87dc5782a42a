"""Pure-Python zarr v2 store (im/_zarr.py) and ImageContainer .zarr persistence.

The reference persists ImageContainer through xarray's zarr writer
(/root/reference/src/squidpy/im/_container.py:179-223); these tests lock the
on-disk format this build emits (zarr v2 JSON metadata + chunk files with
xarray _ARRAY_DIMENSIONS) so stores interoperate with real zarr/xarray.
"""

from __future__ import annotations

import json
import zlib
from pathlib import Path

import numpy as np
import pytest

from squidpy_tpu.im._zarr import is_zarr_store, read_group, write_group


class TestFormat:
    def test_group_layout_and_metadata(self, tmp_path):
        root = tmp_path / "g.zarr"
        arr = np.arange(24, dtype=np.uint16).reshape(4, 6)
        write_group(root, {"a": arr}, group_attrs={"k": 1}, dims={"a": ("y", "x")})
        assert json.loads((root / ".zgroup").read_text()) == {"zarr_format": 2}
        meta = json.loads((root / "a" / ".zarray").read_text())
        assert meta["shape"] == [4, 6]
        assert meta["dtype"] == "<u2"
        assert meta["order"] == "C" and meta["filters"] is None
        assert meta["compressor"]["id"] == "zlib"
        attrs = json.loads((root / "a" / ".zattrs").read_text())
        assert attrs["_ARRAY_DIMENSIONS"] == ["y", "x"]

    def test_chunk_bytes_decode_by_spec(self, tmp_path):
        """A chunk file is exactly zlib(C-order bytes) — decodable by any
        zarr v2 reader without this library."""
        root = tmp_path / "g.zarr"
        arr = np.arange(12, dtype=np.int32).reshape(3, 4)
        write_group(root, {"a": arr})
        meta = json.loads((root / "a" / ".zarray").read_text())
        raw = zlib.decompress((root / "a" / "0.0").read_bytes())
        got = np.frombuffer(raw, dtype=meta["dtype"]).reshape(meta["chunks"])
        np.testing.assert_array_equal(got[: arr.shape[0], : arr.shape[1]], arr)

    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int32, np.float32, np.float64, np.bool_])
    def test_dtype_roundtrip(self, tmp_path, dtype):
        rng = np.random.default_rng(0)
        arr = (rng.random((7, 5)) * 100).astype(dtype)
        write_group(tmp_path / "d.zarr", {"x": arr})
        back, _ = read_group(tmp_path / "d.zarr")
        np.testing.assert_array_equal(back["x"], arr)
        assert back["x"].dtype == arr.dtype

    def test_multi_chunk_edges(self, tmp_path):
        from squidpy_tpu.im._zarr import read_array, write_array

        root = tmp_path / "g.zarr"
        root.mkdir()
        arr = np.arange(37 * 23, dtype=np.float32).reshape(37, 23)
        write_array(root, "a", arr, chunks=(16, 16))
        back, _ = read_array(root / "a")
        np.testing.assert_array_equal(back, arr)
        # edge chunks exist and are padded to full chunk shape
        raw = zlib.decompress((root / "a" / "2.1").read_bytes())
        assert len(raw) == 16 * 16 * 4

    def test_is_zarr_store(self, tmp_path):
        write_group(tmp_path / "y.zarr", {"a": np.zeros((2, 2))})
        assert is_zarr_store(tmp_path / "y.zarr")
        assert not is_zarr_store(tmp_path)
        assert not is_zarr_store(tmp_path / "missing")


class TestContainerZarr:
    def test_save_load_roundtrip(self, tmp_path):
        import squidpy_tpu as sq

        rng = np.random.default_rng(0)
        cont = sq.im.ImageContainer(rng.integers(0, 255, (60, 40, 3)).astype(np.uint8))
        cont.add_img(rng.random((60, 40)).astype(np.float32), layer="mask")
        path = tmp_path / "cont.zarr"
        cont.save(path)
        back = sq.im.ImageContainer.load(path)
        assert set(back._layers) == {"image", "mask"}
        np.testing.assert_array_equal(np.asarray(back["image"]), np.asarray(cont["image"]))
        np.testing.assert_array_equal(np.asarray(back["mask"]), np.asarray(cont["mask"]))
        assert back.library_ids == cont.library_ids

    def test_crop_attrs_survive(self, tmp_path):
        import squidpy_tpu as sq
        from squidpy_tpu._constants._pkg_constants import Key

        rng = np.random.default_rng(0)
        cont = sq.im.ImageContainer(rng.integers(0, 255, (80, 80, 3)).astype(np.uint8))
        crop = cont.crop_corner(10, 20, size=30)
        path = tmp_path / "crop.zarr"
        crop.save(path)
        back = sq.im.ImageContainer.load(path)
        assert back.attrs[Key.img.coords] == crop.attrs[Key.img.coords]
        assert back.attrs[Key.img.padding] == crop.attrs[Key.img.padding]

    def test_hdf5_path_still_works(self, tmp_path):
        import squidpy_tpu as sq

        rng = np.random.default_rng(0)
        cont = sq.im.ImageContainer(rng.integers(0, 255, (20, 20, 3)).astype(np.uint8))
        path = tmp_path / "cont.h5"
        cont.save(path)
        back = sq.im.ImageContainer.load(path)
        np.testing.assert_array_equal(np.asarray(back["image"]), np.asarray(cont["image"]))

    def test_xarray_dims_written_per_layer(self, tmp_path):
        import squidpy_tpu as sq

        cont = sq.im.ImageContainer(np.zeros((8, 8, 3), np.uint8))
        path = tmp_path / "c.zarr"
        cont.save(path)
        attrs = json.loads((Path(path) / "image" / ".zattrs").read_text())
        assert attrs["_ARRAY_DIMENSIONS"] == ["y", "x", "z", "channels"]
