"""SpatialData-native call surface for the experimental API.

The reference's experimental functions take ``(sdata, image_key, *,
scale=..., inplace=...)``; this build is array-first but accepts any
SpatialData-LIKE object (duck-typed on .images/.labels/.shapes/.tables —
including a real spatialdata.SpatialData) through the same signatures
(reference anchors: experimental/im/_detect_tissue.py:208-226,
_qc_image.py:45-59, _make_tiles.py:163-180,
_calculate_image_features.py:874-887).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from squidpy_tpu.experimental import im as exp_im
from squidpy_tpu.experimental import tl as exp_tl


class FakeSpatialData:
    """Minimal duck-typed SpatialData: four element mappings."""

    def __init__(self, images=None, labels=None, shapes=None, tables=None):
        self.images = dict(images or {})
        self.labels = dict(labels or {})
        self.shapes = dict(shapes or {})
        self.tables = dict(tables or {})


@pytest.fixture()
def he_sdata():
    rng = np.random.default_rng(0)
    img = np.full((256, 256, 3), 240, np.float64)
    yy, xx = np.mgrid[:256, :256]
    img[(yy - 128) ** 2 + (xx - 128) ** 2 <= 80**2] = [170, 100, 140]
    img += rng.normal(0, 4, img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    seg = np.zeros((256, 256), np.int32)
    seg[40:80, 40:80] = 1
    seg[120:200, 100:180] = 2
    return FakeSpatialData(images={"he": img}, labels={"seg": seg})


class TestResolveHelpers:
    def test_is_sdata(self, he_sdata):
        from squidpy_tpu.experimental._sdata import is_sdata

        assert is_sdata(he_sdata)
        assert not is_sdata(np.zeros((4, 4)))
        assert not is_sdata(pd.DataFrame())

    def test_multiscale_resolution(self):
        from squidpy_tpu.experimental._sdata import resolve_scale

        levels = {"scale0": np.zeros((100, 100)), "scale1": np.zeros((50, 50)), "scale2": np.zeros((25, 25))}
        assert resolve_scale(levels, "auto").shape == (25, 25)
        assert resolve_scale(levels, "full").shape == (100, 100)
        assert resolve_scale(levels, "scale1").shape == (50, 50)
        with pytest.raises(KeyError, match="Scale"):
            resolve_scale(levels, "scale9")

    def test_single_element_key_optional(self, he_sdata):
        from squidpy_tpu.experimental._sdata import resolve_element

        img = resolve_element(he_sdata, None, tree="images", what="image")
        assert img.shape == (256, 256, 3)
        he_sdata.images["other"] = np.zeros((4, 4))
        with pytest.raises(ValueError, match="image_key"):
            resolve_element(he_sdata, None, tree="images", what="image")


class TestDetectTissueSdata:
    def test_sdata_call_and_store(self, he_sdata):
        mask = exp_im.detect_tissue(he_sdata, image_key="he", new_labels_key="tissue", downscale_to=128)
        assert "tissue" in he_sdata.labels
        stored = he_sdata.labels["tissue"]
        assert stored.dtype == np.int32  # labeled mask when stored
        assert stored.max() >= 1
        assert mask.shape == (256, 256)

    def test_inplace_false_no_store(self, he_sdata):
        exp_im.detect_tissue(he_sdata, image_key="he", new_labels_key="t2", inplace=False, downscale_to=128)
        assert "t2" not in he_sdata.labels

    def test_reference_kwarg_aliases(self, he_sdata):
        m1 = exp_im.detect_tissue(
            he_sdata, image_key="he", border_margin_px=10,
            min_specimen_area_frac=1e-3, auto_max_pixels=128 * 128, inplace=False,
        )
        assert not m1[:5].any()  # border margin applied
        # corners_are_background=False disables the corner prior
        m2 = exp_im.detect_tissue(
            he_sdata, image_key="he", corners_are_background=False, downscale_to=128, inplace=False
        )
        assert m2.shape == (256, 256)

    def test_multiscale_image(self, he_sdata):
        full = he_sdata.images["he"]
        he_sdata.images["he"] = {"scale0": full, "scale1": full[::2, ::2]}
        small = exp_im.detect_tissue(he_sdata, image_key="he", scale="auto", inplace=False)
        assert small.shape == (128, 128)
        big = exp_im.detect_tissue(he_sdata, image_key="he", scale="full", inplace=False)
        assert big.shape == (256, 256)


class TestQcImageSdata:
    def test_sdata_call_stores_table(self, he_sdata):
        qc = exp_im.qc_image(he_sdata, image_key="he", tile_size=128, key_added="qc")
        assert "qc" in he_sdata.tables
        assert he_sdata.tables["qc"] is qc

    def test_outlier_threshold_fraction(self, he_sdata):
        qc = exp_im.qc_image(he_sdata, image_key="he", tile_size=64, outlier_threshold=0.25)
        flags = [c for c in qc.obs.columns if c.endswith("_outlier_low")]
        assert flags and qc.obs[flags[0]].sum() >= 1  # generous cut flags something

    def test_is_hne_adds_stain_metrics(self, he_sdata):
        qc = exp_im.qc_image(he_sdata, image_key="he", tile_size=128, is_hne=True)
        assert "qc_hematoxylin_mean" in list(qc.var_names)

    def test_tissue_mask_key(self, he_sdata):
        mask = np.zeros((256, 256), np.int32)
        mask[:, :128] = 1  # left half is tissue
        he_sdata.labels["tm"] = mask
        qc = exp_im.qc_image(he_sdata, image_key="he", tile_size=128, tissue_mask_key="tm")
        left = qc.obs["tile_col"].to_numpy() == 0
        assert (qc.obs.loc[left, "is_tissue"] == "True").all()
        assert (qc.obs.loc[~left, "is_tissue"] == "False").all()

    def test_auto_tile_size(self, he_sdata):
        qc = exp_im.qc_image(he_sdata, image_key="he", tile_size="auto")
        ty, tx = qc.uns["qc_image"]["tile_size"]
        assert ty >= 32 and tx >= 32

    def test_default_table_key_matches_reference(self, he_sdata):
        """Reference table-key contract: sdata.tables[f"qc_img_{image_key}"]
        (_qc_image.py:109,316)."""
        exp_im.qc_image(he_sdata, image_key="he", tile_size=128)
        assert "qc_img_he" in he_sdata.tables

    def test_pl_qc_image_sdata_form(self, he_sdata, tmp_path):
        """Reference pl surface (pl/_qc_image.py:14-56): qc_image(sdata,
        image_key) resolves the stored table; missing table raises."""
        from squidpy_tpu.experimental import pl as exp_pl

        with pytest.raises(ValueError, match="No QC data found"):
            exp_pl.qc_image(he_sdata, "he")
        exp_im.qc_image(he_sdata, image_key="he", tile_size=128)
        axes = exp_pl.qc_image(he_sdata, "he", return_ax=True,
                               save=str(tmp_path / "qc.png"))
        assert axes is not None and (tmp_path / "qc.png").exists()


class TestMakeTilesSdata:
    def test_tissue_mask_key(self, he_sdata):
        mask = np.zeros((256, 256), np.int32)
        mask[64:192, 64:192] = 1
        he_sdata.labels["tm"] = mask
        df = exp_im.make_tiles(
            he_sdata, image_key="he", tissue_mask_key="tm",
            tile_size=(64, 64), min_tissue_fraction=0.9,
        )
        assert (df["tile_classification"] == "tissue").sum() >= 1
        assert f"he_tiles" in he_sdata.shapes

    def test_from_spots_sdata(self, he_sdata):
        he_sdata.shapes["spots"] = pd.DataFrame({"x": [64.0, 192.0], "y": [64.0, 192.0]})
        df = exp_im.make_tiles_from_spots(he_sdata, tile_size=32)
        assert len(df) == 2
        assert "spots_tiles" in he_sdata.shapes


class TestFeaturizationSdata:
    def test_labels_key_resolution(self, he_sdata):
        adata = exp_im.calculate_image_features(
            he_sdata, image_key="he", labels_key="seg", tile_size=256,
            features=["skimage:morphology:area"],
        )
        assert adata.n_obs == 2
        assert "cell_features" in he_sdata.tables

    def test_inplace_false(self, he_sdata):
        exp_im.calculate_image_features(
            he_sdata, image_key="he", labels_key="seg", tile_size=256,
            features=["skimage:morphology:area"], inplace=False, key_added="nf",
        )
        assert "nf" not in he_sdata.tables

    def test_shapes_key_rasterizes_circles(self, he_sdata):
        he_sdata.shapes["spots"] = pd.DataFrame(
            {"x": [60.0, 180.0], "y": [60.0, 180.0], "radius": [20.0, 25.0]}
        )
        adata = exp_im.calculate_image_features(
            he_sdata, image_key="he", shapes_key="spots", tile_size=256,
            features=["skimage:morphology:area"],
        )
        assert adata.n_obs == 2
        areas = np.sort(adata.obs_vector("area"))
        np.testing.assert_allclose(areas, [np.pi * 400, np.pi * 625], rtol=0.05)


class TestTilingQcStitchSdata:
    def _cut_sdata(self):
        labels = np.zeros((120, 120), np.int32)
        yy, xx = np.mgrid[:120, :120]
        disk = (yy - 60) ** 2 + (xx - 60) ** 2 <= 25**2
        labels[disk & (yy < 60)] = 1
        labels[disk & (yy >= 60)] = 2
        return FakeSpatialData(labels={"seg": labels})

    def test_qc_then_stitch_through_sdata(self):
        sdata = self._cut_sdata()
        qc = exp_tl.calculate_tiling_qc(sdata, labels_key="seg", tile_size=60)
        assert "seg_qc" in sdata.tables
        obs = exp_tl.assign_stitch_groups(sdata, labels_key="seg", min_confidence=0.3)
        assert "stitch_group_id" in obs.columns
        res = exp_im.make_stitched_labels(sdata, labels_key="seg")
        assert "seg_stitched" in sdata.labels
        assert len(np.unique(res["labels"])) <= len(np.unique(sdata.labels["seg"]))

    def test_downsample(self):
        sdata = self._cut_sdata()
        qc = exp_tl.calculate_tiling_qc(sdata, labels_key="seg", tile_size=60, downsample=2, inplace=False)
        assert qc.n_obs == 2
        assert "seg_qc" not in sdata.tables

    def test_reference_score_columns(self):
        """All five reference scores exist per cell (tl/_tiling_qc.py:515-523)."""
        sdata = self._cut_sdata()
        qc = exp_tl.calculate_tiling_qc(sdata, labels_key="seg", tile_size=60, inplace=False)
        for col in ("max_straight_edge_ratio", "cardinal_alignment_score",
                    "cut_score", "smoothed_cut_score", "is_outlier",
                    "nhood_outlier_fraction"):
            assert col in qc.obs.columns, col
        ratio = qc.obs["max_straight_edge_ratio"].to_numpy(dtype=float)
        assert np.isfinite(ratio).all() and (ratio >= 0).all()
        # a straight run exists on the cut cells, so alignment is 1 there
        assert qc.obs["cardinal_alignment_score"].to_numpy(dtype=float).max() == 1.0

    def test_pl_tiling_qc_sdata_form(self, tmp_path):
        """Reference pl surface (pl/_tiling_qc.py:12-26): tiling_qc(sdata,
        labels_key, qc_key, score_col, cmap)."""
        from squidpy_tpu.experimental import pl as exp_pl

        sdata = self._cut_sdata()
        with pytest.raises(ValueError, match="No tiling-QC table"):
            exp_pl.tiling_qc(sdata, "seg")
        exp_tl.calculate_tiling_qc(sdata, labels_key="seg", tile_size=60)
        exp_pl.tiling_qc(sdata, "seg", score_col="nhood_outlier_fraction",
                         cmap="RdYlGn_r", save=str(tmp_path / "tq.png"))
        assert (tmp_path / "tq.png").exists()
        with pytest.raises(ValueError, match="Score column"):
            exp_pl.tiling_qc(sdata, "seg", score_col="bogus")


class TestSpatialDataContainer:
    """The in-repo minimal SpatialData (sq.SpatialData): element trees +
    zarr persistence; drop-in for the duck-typed experimental surface."""

    def _build(self):
        import squidpy_tpu as sq

        rng = np.random.default_rng(0)
        sd = sq.SpatialData(
            images={"he": rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)},
            labels={"seg": np.repeat(np.arange(4, dtype=np.int32), 1024).reshape(64, 64)},
            shapes={"spots": pd.DataFrame({"x": [10.0, 50.0], "y": [10.0, 50.0], "radius": [5.0, 5.0]})},
        )
        sd.tables["t"] = sq.AnnData(
            X=np.eye(2), obs=pd.DataFrame(index=["a", "b"]), var=pd.DataFrame(index=["g1", "g2"])
        )
        return sd

    def test_write_read_roundtrip(self, tmp_path):
        import squidpy_tpu as sq

        sd = self._build()
        sd.write(tmp_path / "sd.zarr")
        back = sq.SpatialData.read(tmp_path / "sd.zarr")
        np.testing.assert_array_equal(back.images["he"], sd.images["he"])
        np.testing.assert_array_equal(back.labels["seg"], sd.labels["seg"])
        pd.testing.assert_frame_equal(
            back.shapes["spots"].reset_index(drop=True), sd.shapes["spots"]
        )
        assert back.tables["t"].shape == (2, 2)

    def test_multiscale_roundtrip(self, tmp_path):
        import squidpy_tpu as sq

        sd = sq.SpatialData(images={"pyr": {"scale0": np.ones((16, 16), np.float32),
                                            "scale1": np.ones((8, 8), np.float32)}})
        sd.write(tmp_path / "p.zarr")
        back = sq.SpatialData.read(tmp_path / "p.zarr")
        assert back.images["pyr"]["scale1"].shape == (8, 8)

    def test_works_with_experimental_api(self):
        sd = self._build()
        adata = exp_im.calculate_image_features(
            sd, image_key="he", labels_key="seg", tile_size=64,
            features=["skimage:morphology:area"],
        )
        assert adata.n_obs == 3  # labels 1..3 (0 = background)
        assert "cell_features" in sd.tables

    def test_repr(self):
        sd = self._build()
        assert "images" in repr(sd) and "he" in repr(sd)


class TestSdataKeywordForm:
    """The reference signs detect_tissue/qc_image with a literal ``sdata``
    first parameter — keyword call sites must work."""

    def _sdata(self):
        import numpy as np

        import squidpy_tpu as sq

        img = np.full((120, 120, 3), 240, np.uint8)
        img[30:90, 30:90] = 60  # dark tissue blob
        return sq.SpatialData(images={"img": img})

    def test_detect_tissue_sdata_keyword(self):
        sd = self._sdata()
        mask = exp_im.detect_tissue(sdata=sd, image_key="img")
        assert mask.shape == (120, 120)
        assert mask[60, 60] and not mask[5, 5]

    def test_qc_image_sdata_keyword(self):
        sd = self._sdata()
        res = exp_im.qc_image(sdata=sd, image_key="img", tile_size=60)
        assert res.n_obs == 4

    def test_detect_tissue_no_args_raises(self):
        import pytest as _pytest

        with _pytest.raises(TypeError, match="needs an image"):
            exp_im.detect_tissue()

    def test_qc_image_no_args_raises(self):
        import pytest as _pytest

        with _pytest.raises(TypeError, match="needs an image"):
            exp_im.qc_image()
