"""Classic image-layer parameter surface, ported concept-for-concept from the
reference's tests/image/{test_features,test_processing,test_segmentation}.py:
feature kwargs (quantiles/bins/texture params/seg props), layer naming
conventions, channel handling and error contracts."""

from __future__ import annotations

import numpy as np
import pytest

import squidpy_tpu as sq
from squidpy_tpu.im import ImageContainer


@pytest.fixture()
def cont() -> ImageContainer:
    rng = np.random.default_rng(11)
    return ImageContainer(rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8), layer="image")


@pytest.fixture()
def cont_seg(cont) -> ImageContainer:
    labels = np.zeros((64, 64), np.int32)
    labels[5:25, 5:25] = 1
    labels[35:60, 30:55] = 2
    cont.add_img(labels, layer="segmented")
    return cont


class TestSummaryParams:
    @pytest.mark.parametrize("quantiles", [(0.5,), (0.1, 0.9), (0.9, 0.5, 0.1)])
    def test_quantile_count_drives_columns(self, cont, quantiles):
        feats = cont.features_summary("image", quantiles=quantiles)
        q_cols = [k for k in feats if "quantile" in k]
        assert len(q_cols) == len(quantiles) * 3  # per channel

    def test_quantile_values_match_numpy(self, cont):
        feats = cont.features_summary("image", quantiles=(0.5,), channels=[0])
        plane = np.asarray(cont["image"][:, :, 0, 0])
        np.testing.assert_allclose(
            feats["summary_ch-0_quantile-0.5"], np.quantile(plane, 0.5), atol=1.0
        )

    def test_empty_quantiles_raises(self, cont):
        with pytest.raises(ValueError):
            cont.features_summary("image", quantiles=())

    def test_feature_name_prefix(self, cont):
        feats = cont.features_summary("image", feature_name="custom")
        assert all(k.startswith("custom_") for k in feats)


class TestHistogramParams:
    @pytest.mark.parametrize("bins", [2, 5, 20])
    def test_bin_count_drives_columns(self, cont, bins):
        feats = cont.features_histogram("image", bins=bins, channels=[0])
        assert len(feats) == bins

    def test_counts_sum_to_pixels(self, cont):
        feats = cont.features_histogram("image", bins=8, channels=[1])
        assert sum(feats.values()) == 64 * 64

    def test_v_range_restricts(self, cont):
        feats = cont.features_histogram("image", bins=4, channels=[0], v_range=(0, 50))
        plane = np.asarray(cont["image"][:, :, 0, 0])
        assert sum(feats.values()) == int((plane <= 50).sum())


class TestTextureParams:
    def test_props_subset(self, cont):
        feats = cont.features_texture("image", props=("contrast",), channels=[0])
        assert all("contrast" in k for k in feats)
        assert len(feats) == 4  # one per default angle

    @pytest.mark.parametrize("distances", [(1,), (1, 2, 4)])
    def test_distances_drive_columns(self, cont, distances):
        feats = cont.features_texture(
            "image", props=("ASM",), channels=[0], distances=distances, angles=(0,)
        )
        assert len(feats) == len(distances)

    @pytest.mark.parametrize("angles", [(0,), (0, np.pi / 2)])
    def test_angles_drive_columns(self, cont, angles):
        feats = cont.features_texture(
            "image", props=("energy",), channels=[0], distances=(1,), angles=angles
        )
        assert len(feats) == len(angles)


class TestSegmentationFeatureParams:
    def test_invalid_prop_raises(self, cont_seg):
        with pytest.raises(ValueError, match="Invalid property"):
            cont_seg.features_segmentation("segmented", props=("bogus",))

    def test_label_prop_is_count(self, cont_seg):
        feats = cont_seg.features_segmentation("segmented", props=("label",))
        assert feats["segmentation_label"] == 2

    def test_centroid_prop_full_image_coords(self, cont_seg):
        # reference semantics: label centroids are min-max normalized then
        # rescaled to the crop's extent in full-image coordinates
        feats = cont_seg.features_segmentation("segmented", props=("centroid",))
        cent = np.asarray(feats["segmentation_centroid"])
        assert cent.ndim == 2 and cent.shape == (2, 2)
        h, w = cont_seg.shape
        assert (cent[:, 0] >= 0).all() and (cent[:, 0] <= w).all()
        assert (cent[:, 1] >= 0).all() and (cent[:, 1] <= h).all()

    def test_intensity_needs_layer(self, cont_seg):
        with pytest.raises(ValueError, match="intensity_layer"):
            cont_seg.features_segmentation("segmented", props=("mean_intensity",))

    def test_area_mean_std_emitted(self, cont_seg):
        feats = cont_seg.features_segmentation("segmented", props=("area",))
        assert "segmentation_area_mean" in feats and "segmentation_area_std" in feats
        np.testing.assert_allclose(feats["segmentation_area_mean"], (400 + 625) / 2)


class TestProcessContracts:
    def test_layer_naming_convention(self, cont):
        sq.im.process(cont, method="smooth")
        assert "image_smooth" in cont

    def test_layer_added_overrides(self, cont):
        sq.im.process(cont, method="gray", layer_added="lum")
        assert "lum" in cont

    def test_invalid_layer_raises(self, cont):
        with pytest.raises(KeyError):
            sq.im.process(cont, layer="nope")

    def test_gray_needs_three_channels(self):
        c = ImageContainer(np.zeros((16, 16), np.float32))
        with pytest.raises(ValueError):
            sq.im.process(c, method="gray")

    def test_copy_leaves_original(self, cont):
        out = sq.im.process(cont, method="smooth", copy=True)
        assert "image_smooth" in out and "image_smooth" not in cont

    def test_callable_method_name(self, cont):
        out = sq.im.process(cont, method=lambda a: a * 0, copy=True)
        custom = [k for k in out if k != "image"]
        assert len(custom) == 1


class TestSegmentContracts:
    @pytest.fixture()
    def blobs(self):
        img = np.zeros((64, 64), np.float32)
        yy, xx = np.mgrid[0:64, 0:64]
        for cy, cx in [(16, 16), (48, 48)]:
            img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 20.0)
        return ImageContainer((img / img.max() * 255).astype(np.uint8), layer="image")

    def test_layer_naming(self, blobs):
        sq.im.segment(blobs, method="watershed", thresh=60)
        assert "segmented_watershed" in blobs

    def test_layer_added(self, blobs):
        sq.im.segment(blobs, method="watershed", layer_added="mylab", thresh=60)
        assert "mylab" in blobs

    def test_segmentation_is_integer_labels(self, blobs):
        sq.im.segment(blobs, method="watershed", thresh=60)
        lab = blobs["segmented_watershed"]
        assert np.issubdtype(lab.dtype, np.integer)
        assert lab.max() >= 2

    def test_custom_callable(self, blobs):
        sq.im.segment(blobs, method=lambda a: (np.asarray(a).squeeze() > 100).astype(np.int32))
        custom = [k for k in blobs if k.startswith("segmented")]
        assert custom

    def test_copy_returns_container(self, blobs):
        out = sq.im.segment(blobs, method="watershed", thresh=60, copy=True)
        assert "segmented_watershed" in out
        assert "segmented_watershed" not in blobs


class TestCalculateImageFeaturesParams:
    def _adata(self):
        adata = sq.AnnData(X=np.zeros((3, 1)))
        adata.obsm["spatial"] = np.array([[20, 20], [40, 30], [50, 50]], dtype=float)
        adata.uns["spatial"] = {"lib": {"scalefactors": {"spot_diameter_fullres": 10}}}
        return adata

    def test_key_added(self, cont):
        adata = self._adata()
        sq.im.calculate_image_features(adata, cont, features=["summary"], key_added="my_feats")
        assert "my_feats" in adata.obsm

    def test_copy_returns_frame(self, cont):
        adata = self._adata()
        df = sq.im.calculate_image_features(adata, cont, features=["summary"], copy=True)
        assert df is not None and len(df) == 3
        assert "img_features" not in adata.obsm

    def test_feature_kwargs_forwarded(self, cont):
        adata = self._adata()
        sq.im.calculate_image_features(
            adata, cont, features=["summary"],
            features_kwargs={"summary": {"quantiles": (0.5,)}},
        )
        cols = adata.obsm["img_features"].columns
        assert any("quantile-0.5" in c for c in cols)
        assert not any("quantile-0.9" in c for c in cols)

    def test_invalid_feature_raises(self, cont):
        adata = self._adata()
        with pytest.raises((ValueError, KeyError)):
            sq.im.calculate_image_features(adata, cont, features=["bogus"])

    def test_n_jobs_invariance(self, cont):
        adata1, adata2 = self._adata(), self._adata()
        sq.im.calculate_image_features(adata1, cont, features=["summary"], n_jobs=1)
        sq.im.calculate_image_features(adata2, cont, features=["summary"], n_jobs=2)
        np.testing.assert_allclose(
            adata1.obsm["img_features"].to_numpy(dtype=float),
            adata2.obsm["img_features"].to_numpy(dtype=float),
        )
