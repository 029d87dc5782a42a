"""Featurization call-surface contracts, ported concept-for-concept from the
reference's tests/experimental/test_calculate_image_features.py (optional
image, feature-flag parsing, channel selection, output identity). Fixtures
and assertions are written against this build's kernels."""

from __future__ import annotations

import numpy as np
import pytest

import squidpy_tpu as sq
from squidpy_tpu.experimental import im as exp_im


def _cells(size=160, boxes=((10, 40, 10, 40), (60, 110, 60, 100), (120, 150, 20, 70))):
    labels = np.zeros((size, size), np.int32)
    for i, (y0, y1, x0, x1) in enumerate(boxes, start=1):
        labels[y0:y1, x0:x1] = i
    rng = np.random.default_rng(3)
    img = rng.integers(10, 250, size=(size, size, 3)).astype(np.uint8)
    return img, labels


@pytest.fixture()
def img_labels():
    return _cells()


@pytest.fixture()
def sdata(img_labels):
    img, labels = img_labels
    return sq.SpatialData(images={"img": img}, labels={"cells": labels})


class TestOptionalImage:
    def test_morphology_only_without_image_sdata(self, sdata):
        res = exp_im.calculate_image_features(
            sdata, labels_key="cells", features=["skimage:morphology:area"], inplace=False
        )
        assert res.n_obs == 3
        assert list(res.var_names) == ["area"]

    def test_morphology_only_without_image_direct(self, img_labels):
        _, labels = img_labels
        res = exp_im.calculate_image_features(None, labels, features=["skimage:morphology:area"])
        assert res.n_obs == 3

    def test_no_image_parallel_tiles(self, img_labels):
        _, labels = img_labels
        res = exp_im.calculate_image_features(
            None, labels, features=["skimage:morphology:area"], tile_size=80, n_jobs=2
        )
        assert res.n_obs == 3

    def test_zernike_runs_from_mask_alone(self, img_labels):
        _, labels = img_labels
        res = exp_im.calculate_image_features(None, labels, features=["cp_measure:zernike"])
        assert res.n_obs == 3
        assert any(v.startswith("zernike") for v in res.var_names)

    @pytest.mark.parametrize(
        ("features", "match"),
        [
            (["skimage:intensity"], r"require pixel data"),
            (["skimage:morphology", "skimage:intensity"], "skimage:intensity"),
            (["squidpy:summary"], "squidpy:summary"),
            (None, "require pixel data"),
        ],
    )
    def test_pixel_features_without_image_raise(self, sdata, features, match):
        with pytest.raises(ValueError, match=match):
            exp_im.calculate_image_features(sdata, labels_key="cells", features=features, inplace=False)

    def test_channels_without_image_raises(self, sdata):
        with pytest.raises(ValueError, match="`channels` selection requires `image_key`"):
            exp_im.calculate_image_features(
                sdata, labels_key="cells", features=["skimage:morphology:area"], channels=["0"], inplace=False
            )

    def test_shapes_without_image_raises(self):
        import pandas as pd

        shapes = pd.DataFrame({"x": [20.0], "y": [20.0], "radius": [8.0]})
        sd = sq.SpatialData(images={"img": np.zeros((50, 50, 3), np.uint8)}, shapes={"spots": shapes})
        with pytest.raises(ValueError, match="`shapes_key` requires `image_key`"):
            exp_im.calculate_image_features(
                sd, shapes_key="spots", features=["skimage:morphology:area"], inplace=False
            )


class TestFeatureParsing:
    def test_mixed_group_and_fine_grained_raises(self, img_labels):
        img, labels = img_labels
        with pytest.raises(ValueError, match="Ambiguous"):
            exp_im.calculate_image_features(
                img, labels, features=["skimage:morphology", "skimage:morphology:area"]
            )

    def test_fine_then_group_also_raises(self):
        from squidpy_tpu.experimental.im._calculate_image_features import parse_features

        with pytest.raises(ValueError, match="Ambiguous"):
            parse_features(["skimage:intensity:intensity_mean", "skimage:intensity"])

    def test_cp_sizeshape_plus_fine_morphology_allowed(self):
        # cp_measure:sizeshape implies all morphology; skimage fine flags on
        # top are NOT ambiguous (only skimage group vs fine is)
        from squidpy_tpu.experimental.im._calculate_image_features import parse_features

        parsed = parse_features(["cp_measure:sizeshape", "skimage:morphology:area"])
        assert "area" in parsed.morphology_props

    def test_empty_features_raises(self, img_labels):
        img, labels = img_labels
        with pytest.raises(ValueError, match="No features requested"):
            exp_im.calculate_image_features(img, labels, features=[])

    def test_unknown_feature_error_advertises_groups(self, img_labels):
        img, labels = img_labels
        with pytest.raises(ValueError) as excinfo:
            exp_im.calculate_image_features(img, labels, features=["bogus:thing"])
        msg = str(excinfo.value)
        assert "cp_measure:intensity" in msg
        assert "squidpy:summary" in msg

    def test_bare_string_equals_single_flag(self, img_labels):
        img, labels = img_labels
        a = exp_im.calculate_image_features(img, labels, features="squidpy:summary")
        b = exp_im.calculate_image_features(img, labels, features=["squidpy:summary"])
        assert list(a.var_names) == list(b.var_names)
        np.testing.assert_allclose(a.X, b.X)


class TestChannelSelection:
    def test_sdata_form_rejects_int_channels(self, sdata):
        with pytest.raises(TypeError, match="channels must contain strings"):
            exp_im.calculate_image_features(
                sdata, image_key="img", labels_key="cells",
                features=["squidpy:summary"], channels=[0], inplace=False,
            )

    def test_unknown_channel_name_raises(self, sdata):
        with pytest.raises(ValueError, match="Channel 'DAPI' not found"):
            exp_im.calculate_image_features(
                sdata, image_key="img", labels_key="cells",
                features=["squidpy:summary"], channels=["DAPI"], inplace=False,
            )

    def test_digit_string_selects_position(self, sdata):
        res_all = exp_im.calculate_image_features(
            sdata, image_key="img", labels_key="cells", features=["skimage:intensity:intensity_mean"],
            inplace=False,
        )
        res_one = exp_im.calculate_image_features(
            sdata, image_key="img", labels_key="cells", features=["skimage:intensity:intensity_mean"],
            channels=["1"], inplace=False,
        )
        assert res_all.n_vars == 3
        assert res_one.n_vars == 1
        # the column keeps the ORIGINAL channel identity, not its position
        # within the subset
        assert list(res_one.var_names) == ["intensity_mean__ch1"]
        np.testing.assert_allclose(
            np.asarray(res_one.X[:, 0]), np.asarray(res_all[:, "intensity_mean__ch1"].X).ravel()
        )

    def test_named_channels_attribute(self, img_labels):
        img, labels = img_labels

        class Named(np.ndarray):
            pass

        arr = img.view(Named)
        arr.channel_names = ["R", "G", "B"]
        res = exp_im.calculate_image_features(
            arr, labels, features=["skimage:intensity:intensity_mean"], channels=["G"]
        )
        assert list(res.var_names) == ["intensity_mean__G"]

    def test_direct_form_accepts_int_indices(self, img_labels):
        img, labels = img_labels
        res = exp_im.calculate_image_features(img, labels, features=["squidpy:summary"], channels=[2])
        assert all(v.endswith("__ch2") for v in res.var_names)

    def test_direct_form_int_out_of_range(self, img_labels):
        img, labels = img_labels
        with pytest.raises(ValueError, match="out of range"):
            exp_im.calculate_image_features(img, labels, features=["squidpy:summary"], channels=[5])


class TestOutputIdentity:
    def test_obs_names_are_label_ids(self, img_labels):
        img, labels = img_labels
        res = exp_im.calculate_image_features(img, labels, features=["skimage:morphology:area"])
        assert list(res.obs_names) == ["cell_1", "cell_2", "cell_3"]
        assert list(res.obs["label"]) == [1, 2, 3]

    def test_non_contiguous_label_ids(self):
        labels = np.zeros((100, 100), np.int32)
        labels[5:25, 5:25] = 10
        labels[40:80, 40:70] = 907
        res = exp_im.calculate_image_features(None, labels, features=["skimage:morphology:area"])
        assert list(res.obs["label"]) == [10, 907]
        areas = dict(zip(res.obs["label"], np.asarray(res.X).ravel()))
        assert areas[10] == 400.0
        assert areas[907] == 1200.0

    def test_all_zero_labels_raises(self):
        with pytest.raises(ValueError, match="No cells found"):
            exp_im.calculate_image_features(None, np.zeros((60, 60), np.int32), features=["skimage:morphology:area"])

    def test_texture_on_constant_channel_is_finite(self):
        labels = np.zeros((80, 80), np.int32)
        labels[10:40, 10:40] = 1
        img = np.full((80, 80), 128, np.uint8)
        res = exp_im.calculate_image_features(img, labels, features=["squidpy:texture"])
        assert np.isfinite(np.asarray(res.X)).all()

    def test_drop_constant_features_removes_zero_variance(self, img_labels):
        img, labels = img_labels
        img = img.copy()
        img[..., 2] = 0  # constant channel -> constant summary columns
        a = exp_im.calculate_image_features(img, labels, features=["squidpy:summary"])
        b = exp_im.calculate_image_features(
            img, labels, features=["squidpy:summary"], drop_constant_features=True
        )
        assert b.n_vars < a.n_vars
        assert b.n_obs == a.n_obs

    def test_inplace_attaches_table(self, sdata):
        res = exp_im.calculate_image_features(
            sdata, image_key="img", labels_key="cells", features=["squidpy:summary"],
            key_added="feats", inplace=True,
        )
        assert "feats" in sdata.tables
        assert sdata.tables["feats"] is res

    def test_not_inplace_does_not_attach(self, sdata):
        res = exp_im.calculate_image_features(
            sdata, image_key="img", labels_key="cells", features=["squidpy:summary"],
            key_added="feats2", inplace=False,
        )
        assert "feats2" not in sdata.tables
        assert res.n_obs == 3

    def test_tiled_matches_single_tile(self, img_labels):
        img, labels = img_labels
        a = exp_im.calculate_image_features(img, labels, features=["squidpy:summary"], tile_size=4096)
        b = exp_im.calculate_image_features(img, labels, features=["squidpy:summary"], tile_size=64)
        assert list(a.var_names) == list(b.var_names)
        np.testing.assert_allclose(np.asarray(a.X), np.asarray(b.X), rtol=1e-5)

    def test_n_jobs_equivalence(self, img_labels):
        img, labels = img_labels
        a = exp_im.calculate_image_features(img, labels, features=["skimage:morphology:area"], tile_size=64)
        b = exp_im.calculate_image_features(
            img, labels, features=["skimage:morphology:area"], tile_size=64, n_jobs=3
        )
        np.testing.assert_array_equal(np.asarray(a.X), np.asarray(b.X))
