"""Deep container-geometry behaviors, ported concept-for-concept from the
reference's tests/image/test_container.py (cropping extras, fractional sizes,
spot-crop variants, z-stack apply, library-id contract). All assertions are
written against this build's ImageContainer; fixtures are original."""

from __future__ import annotations

import numpy as np
import pytest

import squidpy_tpu as sq
from squidpy_tpu._constants._pkg_constants import Key
from squidpy_tpu.im import ImageContainer


@pytest.fixture()
def cont() -> ImageContainer:
    rng = np.random.default_rng(7)
    return ImageContainer(rng.integers(0, 255, size=(100, 120, 3), dtype=np.uint8), layer="image")


@pytest.fixture()
def cont_dot() -> ImageContainer:
    """All-zero image with a single bright dot at (y=20, x=30) — lets crop
    tests assert positions by value, the reference's TestCroppingExtra trick."""
    img = np.zeros((60, 80, 1), dtype=np.uint8)
    img[20, 30, 0] = 255
    return ImageContainer(img, layer="image")


def _visium_adata(coords, diameter=20, lib="lib"):
    adata = sq.AnnData(X=np.zeros((len(coords), 1)))
    adata.obsm["spatial"] = np.asarray(coords, dtype=float)
    adata.uns["spatial"] = {lib: {"scalefactors": {"spot_diameter_fullres": diameter}}}
    return adata


class TestFractionalSizes:
    def test_fractional_crop_size(self, cont):
        crop = cont.crop_corner(0, 0, size=0.5)
        assert crop.shape == (50, 60)

    def test_fractional_tuple(self, cont):
        crop = cont.crop_corner(0, 0, size=(0.5, 0.25))
        assert crop.shape == (50, 30)

    def test_none_size_is_full_image(self, cont):
        crop = cont.crop_corner(0, 0, size=None)
        assert crop.shape == cont.shape

    def test_mixed_none_and_int(self, cont):
        crop = cont.crop_corner(0, 0, size=(None, 40))
        assert crop.shape == (100, 40)

    def test_fractional_position(self, cont):
        # float <= 1 positions are fractions of the image size
        a = cont.crop_corner(0.5, 0.5, size=(10, 10))
        b = cont.crop_corner(50, 60, size=(10, 10))
        np.testing.assert_array_equal(a["image"], b["image"])

    def test_float_above_one_is_pixels(self, cont):
        crop = cont.crop_corner(0, 0, size=40.0)
        assert crop.shape == (40, 40)


class TestCvalAndDtypes:
    def test_int_cval_on_uint8_falls_back_to_zero(self, cont):
        # NEP-50 contract the reference pins: np.can_cast(int64, uint8) is
        # False, so a python-int fill on a uint8 layer pads with 0
        crop = cont.crop_corner(-10, -10, size=(20, 20), cval=42)
        assert crop.shape == (20, 20)
        assert (crop["image"][:10, :10] == 0).all()

    @pytest.mark.parametrize("cval", [0.5, 2.0])
    def test_float_cval_on_float_image(self, cval):
        # float64 image: a python-float fill casts safely and is kept
        c = ImageContainer(np.ones((20, 20), dtype=np.float64))
        crop = c.crop_corner(10, 10, size=(20, 20), cval=cval)
        assert (np.asarray(crop["image"])[-10:, -10:] == cval).all()

    def test_float_cval_on_float32_falls_back(self):
        # float64 scalar -> float32 layer is not a safe cast; same 0 fallback
        c = ImageContainer(np.ones((20, 20), dtype=np.float32))
        crop = c.crop_corner(10, 10, size=(20, 20), cval=2.0)
        assert (np.asarray(crop["image"])[-10:, -10:] == 0).all()

    def test_preserve_dtypes_true_keeps_uint8(self, cont):
        crop = cont.crop_corner(-5, 0, size=(10, 10), cval=1.5, preserve_dtypes=True)
        assert crop["image"].dtype == np.uint8
        # 1.5 cannot be cast safely into uint8 -> falls back to 0
        assert (crop["image"][:5] == 0).all()

    def test_preserve_dtypes_false_promotes(self, cont):
        crop = cont.crop_corner(-5, 0, size=(10, 10), cval=1.5, preserve_dtypes=False)
        assert np.issubdtype(crop["image"].dtype, np.floating)
        assert (crop["image"][:5] == 1.5).all()

    def test_mask_circle_uses_cval(self, cont):
        crop = cont.crop_corner(0, 0, size=(50, 50), mask_circle=True, cval=9)
        assert crop["image"][0, 0, 0, 0] == 9
        assert crop["image"][49, 49, 0, 0] == 9


class TestCroppingByValue:
    def test_dot_survives_crop(self, cont_dot):
        crop = cont_dot.crop_corner(10, 20, size=(30, 30))
        assert crop["image"][10, 10, 0, 0] == 255
        assert int(crop["image"].sum()) == 255

    def test_big_crop_pads_all_sides(self, cont_dot):
        crop = cont_dot.crop_corner(-20, -20, size=(120, 140))
        assert crop.shape == (120, 140)
        assert crop["image"][40, 50, 0, 0] == 255
        assert int(crop["image"].sum()) == 255

    def test_crop_center_equivalence(self, cont_dot):
        a = cont_dot.crop_center(20, 30, radius=10)
        b = cont_dot.crop_corner(10, 20, size=(21, 21))
        np.testing.assert_array_equal(a["image"], b["image"])

    def test_crop_center_asymmetric_radius(self, cont_dot):
        crop = cont_dot.crop_center(20, 30, radius=(5, 10))
        assert crop.shape == (11, 21)
        assert crop["image"][5, 10, 0, 0] == 255

    def test_crop_scale_halves(self, cont_dot):
        crop = cont_dot.crop_corner(0, 0, size=(60, 80), scale=0.5)
        assert crop.shape == (30, 40)
        assert crop.attrs[Key.img.scale] == 0.5

    def test_scale_then_mask_applied_to_scaled_shape(self, cont):
        crop = cont.crop_corner(0, 0, size=(50, 50), scale=2.0, mask_circle=True)
        assert crop.shape == (100, 100)

    def test_crop_multiple_layers_consistent(self, cont_dot):
        cont_dot.add_img(np.full((60, 80), 3, dtype=np.uint8), layer="second")
        crop = cont_dot.crop_corner(10, 20, size=(30, 30))
        assert set(crop) == {"image", "second"}
        assert (crop["second"] == 3).all()


class TestEqualCrops:
    def test_uneven_grid_pads_edges(self, cont):
        crops = list(cont.generate_equal_crops(size=50))
        # 100x120 with 50px tiles -> 2 rows x 3 cols, last col half-padded
        assert len(crops) == 6
        assert all(c.shape == (50, 50) for c in crops)

    def test_as_array_layer_name(self, cont):
        crops = list(cont.generate_equal_crops(size=50, as_array="image"))
        assert all(isinstance(c, np.ndarray) for c in crops)
        assert crops[0].shape == (50, 50, 3)  # squeezed z

    def test_as_array_true_gives_dict(self, cont):
        crops = list(cont.generate_equal_crops(size=50, as_array=True))
        assert all(isinstance(c, dict) and "image" in c for c in crops)

    def test_no_squeeze_keeps_z(self, cont):
        crops = list(cont.generate_equal_crops(size=50, as_array="image", squeeze=False))
        assert crops[0].shape == (50, 50, 1, 3)

    def test_uncrop_restores_exactly(self, cont):
        crops = list(cont.generate_equal_crops(size=(50, 50)))
        merged = ImageContainer.uncrop(crops, shape=cont.shape)
        np.testing.assert_array_equal(merged["image"], cont["image"])

    def test_uncrop_mixed_scales_raises(self, cont):
        a = cont.crop_corner(0, 0, size=(50, 50))
        b = cont.crop_corner(50, 0, size=(50, 50), scale=0.5)
        with pytest.raises(ValueError, match="different scales"):
            ImageContainer.uncrop([a, b])


class TestSpotCropVariants:
    def test_obs_names_subset(self, cont):
        adata = _visium_adata([[30, 30], [60, 50], [90, 70]])
        crops = list(cont.generate_spot_crops(adata, obs_names=adata.obs_names[:2]))
        assert len(crops) == 2

    def test_empty_obs_names_raises(self, cont):
        adata = _visium_adata([[30, 30]])
        with pytest.raises(ValueError, match="No observations"):
            list(cont.generate_spot_crops(adata, obs_names=[]))

    def test_return_obs_pairs(self, cont):
        adata = _visium_adata([[30, 30], [60, 50]])
        out = list(cont.generate_spot_crops(adata, return_obs=True, as_array="image"))
        assert [obs for _, obs in out] == list(adata.obs_names)
        assert all(isinstance(arr, np.ndarray) for arr, _ in out)

    @pytest.mark.parametrize("spot_scale", [1.0, 2.0, 0.5])
    def test_spot_scale_scales_radius(self, cont, spot_scale):
        adata = _visium_adata([[60, 50]], diameter=20)
        (crop,) = cont.generate_spot_crops(adata, spot_scale=spot_scale)
        r = int(round(10 * spot_scale))
        assert crop.shape == (2 * r + 1, 2 * r + 1)

    def test_on_scaled_container_coords_follow(self, cont_dot):
        # dot at (20, 30); a 0.5-scaled container must pick it up at (10, 15)
        scaled = cont_dot.crop_corner(0, 0, size=None, scale=0.5)
        adata = _visium_adata([[30, 20]], diameter=16)  # (x, y) order
        (crop,) = scaled.generate_spot_crops(adata)
        # diameter scales too: 16*0.5=8 -> radius 4 -> 9x9 crop
        assert crop.shape == (9, 9)
        assert crop["image"].max() > 0

    def test_on_cropped_container_coords_are_relative(self, cont_dot):
        sub = cont_dot.crop_corner(10, 20, size=(40, 50))
        adata = _visium_adata([[30, 20]], diameter=10)  # absolute (x, y)
        (crop,) = sub.generate_spot_crops(adata)
        assert crop.shape == (11, 11)
        assert crop["image"][5, 5, 0, 0] == 255

    def test_missing_spatial_key_raises(self, cont):
        adata = sq.AnnData(X=np.zeros((1, 1)))
        adata.obsm["notspatial"] = np.array([[1.0, 1.0]])
        with pytest.raises(KeyError, match="Spatial basis"):
            list(cont.generate_spot_crops(adata))

    def test_crop_attrs_record_obs(self, cont):
        adata = _visium_adata([[30, 30]])
        (crop,) = cont.generate_spot_crops(adata)
        assert crop.attrs[Key.img.obs] == adata.obs_names[0]


class TestApplyDepth:
    def test_apply_channel_slice_only(self, cont):
        out = cont.apply(lambda a: a * 0 + 7, channel=1, new_layer="res")
        assert out["res"].shape == (100, 120, 1, 1)
        assert (out["res"] == 7).all()

    def test_apply_inplace_adds_layer(self, cont):
        res = cont.apply(lambda a: a.astype(np.float32) / 255.0, new_layer="norm", copy=False)
        assert res is None
        assert "norm" in cont
        assert cont["norm"].dtype == np.float32

    def test_apply_mapping_unselected_passthrough(self):
        c = ImageContainer(np.ones((10, 10, 2, 1), dtype=np.float32), library_id=["a", "b"])
        out = c.apply({"a": lambda a: a * 5}, new_layer="res")
        assert out.library_ids == ["a", "b"]
        assert (out["res"][:, :, 0] == 5).all()
        assert (out["res"][:, :, 1] == 1).all()

    def test_apply_mapping_drop_keeps_selected(self):
        c = ImageContainer(np.ones((10, 10, 2, 1), dtype=np.float32), library_id=["a", "b"])
        out = c.apply({"b": lambda a: a + 1}, drop=True, new_layer="res")
        assert out.library_ids == ["b"]
        assert out["res"].shape[2] == 1

    def test_apply_unknown_library_raises(self):
        c = ImageContainer(np.ones((10, 10, 2, 1)), library_id=["a", "b"])
        with pytest.raises(KeyError, match="not found"):
            c.apply({"zz": lambda a: a}, new_layer="res")

    def test_apply_inconsistent_shapes_raise(self):
        c = ImageContainer(np.ones((10, 10, 2, 1)), library_id=["a", "b"])
        with pytest.raises(ValueError, match="inconsistent shapes"):
            c.apply({"a": lambda a: a, "b": lambda a: a[:5]}, new_layer="res")


class TestLibraryIdContract:
    def test_setter_wrong_length_raises(self):
        c = ImageContainer(np.zeros((5, 5, 2, 1)), library_id=["a", "b"])
        with pytest.raises(ValueError, match="library ids"):
            c.library_ids = ["only-one"]

    def test_setter_duplicates_raise(self):
        c = ImageContainer(np.zeros((5, 5, 2, 1)), library_id=["a", "b"])
        with pytest.raises(ValueError, match="unique"):
            c.library_ids = ["x", "x"]

    def test_setter_mapping_partial(self):
        c = ImageContainer(np.zeros((5, 5, 3, 1)), library_id=["a", "b", "c"])
        c.library_ids = {"b": "B"}
        assert c.library_ids == ["a", "B", "c"]

    def test_crop_selects_single_library(self):
        arr = np.stack([np.zeros((8, 8, 1)), np.ones((8, 8, 1))], axis=2)
        c = ImageContainer(arr, library_id=["lo", "hi"])
        crop = c.crop_corner(0, 0, size=(4, 4), library_id="hi")
        assert crop.library_ids == ["hi"]
        assert (crop["image"] == 1).all()


class TestContainerProtocol:
    def test_setitem_adds_layer(self, cont):
        cont["mask"] = np.zeros((100, 120), dtype=np.uint8)
        assert "mask" in cont
        assert len(cont) == 2

    def test_delitem(self, cont):
        cont["extra"] = np.zeros((100, 120))
        del cont["extra"]
        assert "extra" not in cont

    def test_iter_yields_layer_names(self, cont):
        cont["m2"] = np.zeros((100, 120))
        assert sorted(cont) == ["image", "m2"]

    def test_compute_is_identity(self, cont):
        assert cont.compute() is cont

    def test_empty_container_shape_and_crop(self):
        c = ImageContainer()
        assert c.shape == (0, 0)
        with pytest.raises(ValueError, match="empty"):
            c.crop_corner(0, 0, size=(2, 2))

    def test_mismatched_layer_shape_raises(self, cont):
        with pytest.raises(ValueError):
            cont["bad"] = np.zeros((10, 10))

    def test_repr_lists_every_layer(self, cont):
        cont["seg"] = np.zeros((100, 120))
        r = repr(cont)
        assert "image" in r and "seg" in r and "2 layer" in r


class TestNotebookErgonomics:
    """_repr_html_ + _ipython_key_completions_ (reference
    im/_container.py:1524-1545; VERDICT r3 missing #3)."""

    def test_key_completions(self):
        import numpy as np

        import squidpy_tpu as sq

        img = sq.im.ImageContainer(np.zeros((8, 8, 3), np.uint8), layer="b")
        img.add_img(np.zeros((8, 8, 1), np.uint8), layer="a")
        assert img._ipython_key_completions_() == ["a", "b"]

    def test_repr_html(self):
        import numpy as np

        import squidpy_tpu as sq

        img = sq.im.ImageContainer()
        assert "0 layers" in img._repr_html_()
        img.add_img(np.zeros((8, 6, 3), np.uint8), layer="image")
        h = img._repr_html_()
        assert "<strong>image</strong>" in h
        assert "<em>y</em> (8)" in h and "<em>x</em> (6)" in h
        assert "1 layer:" in h

    def test_repr_html_truncates_at_ten(self):
        import numpy as np

        import squidpy_tpu as sq

        img = sq.im.ImageContainer()
        for i in range(12):
            img.add_img(np.zeros((4, 4, 1), np.uint8), layer=f"l{i:02d}")
        h = img._repr_html_()
        assert "and 2 more layer(s)" in h
        assert "l10" not in h
