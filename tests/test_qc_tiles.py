"""qc_image + make_tiles behaviors (reference suites:
/root/reference/tests/experimental/test_qc_image.py and test_make_tiles.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from squidpy_tpu.experimental import im as exp_im


@pytest.fixture()
def he_like():
    """Synthetic H&E-ish slide: pink tissue blob on white, one blurry region."""
    rng = np.random.default_rng(0)
    img = np.full((512, 512, 3), 245, np.float64)
    yy, xx = np.mgrid[:512, :512]
    blob = (yy - 256) ** 2 + (xx - 220) ** 2 <= 180**2
    img[blob] = [200, 120, 160]
    img += rng.normal(0, 6, img.shape)
    # a smooth (out-of-focus) tissue quadrant: kill the noise there
    img[256:, 256:] = np.array([200.0, 120.0, 160.0]) + 0.5
    return np.clip(img, 0, 255).astype(np.uint8)


class TestQcImage:
    def test_grid_geometry(self, he_like):
        qc = exp_im.qc_image(he_like, tile_size=128)
        assert qc.n_obs == 16  # 4x4 grid
        for col in ("tile_row", "tile_col", "y0", "x0", "y1", "x1"):
            assert col in qc.obs.columns
        assert qc.obsm["spatial"].shape == (16, 2)
        # pixel bounds tile the image exactly
        assert qc.obs["y1"].max() == 512 and qc.obs["x1"].max() == 512

    def test_default_metric_columns(self, he_like):
        qc = exp_im.qc_image(he_like, tile_size=128)
        for m in ("tenengrad", "var_of_laplacian", "brightness_mean", "entropy"):
            assert f"qc_{m}" in list(qc.var_names)

    def test_metric_values_finite_and_ordered(self, he_like):
        qc = exp_im.qc_image(he_like, tile_size=128, metrics=["tenengrad", "brightness_mean"])
        X = np.asarray(qc.X, float)
        assert np.isfinite(X).all()
        # background tiles are brighter than the tissue-blob tiles
        bm = qc.obs_vector("qc_brightness_mean")
        assert bm.max() > bm.min()

    def test_blurry_region_scores_lower_sharpness(self, he_like):
        qc = exp_im.qc_image(he_like, tile_size=256, metrics=["tenengrad"])
        ten = qc.obs_vector("qc_tenengrad")
        rows = qc.obs["tile_row"].to_numpy()
        cols = qc.obs["tile_col"].to_numpy()
        blurry = ten[(rows == 1) & (cols == 1)][0]
        sharp = ten[(rows == 0) & (cols == 0)][0]
        assert blurry < sharp

    def test_outlier_flags_and_unfocus(self, he_like):
        qc = exp_im.qc_image(he_like, tile_size=128, outlier_percentile=10.0)
        assert "unfocus_score" in qc.obs.columns
        flag_cols = [c for c in qc.obs.columns if c.endswith("_outlier_low") or c.endswith("_outlier_high")]
        assert flag_cols
        assert qc.obs["unfocus_score"].between(0, 1).all()

    def test_detect_tissue_classification(self, he_like):
        qc = exp_im.qc_image(he_like, tile_size=128, detect_tissue=True)
        assert {"is_tissue", "is_background"} <= set(qc.obs.columns)
        # reference convention: "True"/"False" string categoricals
        assert (qc.obs["is_tissue"] == "True").sum() >= 1
        assert (qc.obs["is_tissue"].astype(str) != qc.obs["is_background"].astype(str)).all()
        # background tiles get NaN unfocus
        bg = qc.obs.loc[(qc.obs["is_background"] == "True").to_numpy(), "unfocus_score"]
        assert bg.isna().all()

    def test_he_metrics_need_rgb(self):
        gray = np.random.default_rng(0).random((128, 128)).astype(np.float32)
        with pytest.raises(ValueError, match="RGB"):
            exp_im.qc_image(gray, tile_size=64, metrics=["hematoxylin_mean"])

    def test_unknown_metric_raises(self, he_like):
        with pytest.raises(ValueError):
            exp_im.qc_image(he_like, tile_size=128, metrics=["not_a_metric"])

    def test_hematoxylin_responds_to_stain(self):
        # pure-ish hematoxylin patch scores higher H than eosin patch
        img = np.full((256, 256, 3), 245, np.uint8)
        img[:128] = [120, 80, 160]   # purple-ish (H-rich)
        img[128:] = [230, 140, 160]  # pink-ish (E-rich)
        qc = exp_im.qc_image(img, tile_size=128, metrics=["hematoxylin_mean", "eosin_mean"])
        hmean = qc.obs_vector("qc_hematoxylin_mean")
        top = qc.obs["tile_row"].to_numpy() == 0
        assert hmean[top].mean() > hmean[~top].mean()


class TestMakeTiles:
    def _mask(self):
        mask = np.zeros((400, 400), bool)
        mask[50:350, 100:300] = True
        return mask

    def test_grid_covers_image(self):
        df = exp_im.make_tiles(np.zeros((400, 400)), tissue_mask=self._mask(),
                               tile_size=(100, 100), min_tissue_fraction=0.0)
        assert len(df) == 16
        assert df["pixel_y1"].max() == 400
        assert {"tile_row", "tile_col", "tissue_fraction", "tile_classification"} <= set(df.columns)

    def test_tissue_fraction_literal(self):
        df = exp_im.make_tiles(np.zeros((400, 400)), tissue_mask=self._mask(),
                               tile_size=(100, 100), min_tissue_fraction=0.0)
        # tile at rows 100-200, cols 100-200 is fully inside the mask
        full = df[(df.pixel_y0 == 100) & (df.pixel_x0 == 100)]
        assert full["tissue_fraction"].iloc[0] == pytest.approx(1.0)
        empty = df[(df.pixel_y0 == 0) & (df.pixel_x0 == 0)]
        assert empty["tissue_fraction"].iloc[0] == pytest.approx(0.5 * 0.5, abs=0.3)

    def test_min_tissue_fraction_classifies(self):
        df = exp_im.make_tiles(np.zeros((400, 400)), tissue_mask=self._mask(),
                               tile_size=(100, 100), min_tissue_fraction=1.0)
        kept = df[df["tile_classification"] == "tissue"]
        assert 1 <= len(kept) < len(df)
        assert (kept["tissue_fraction"] >= 1.0).all()

    def test_center_grid_on_tissue_shifts_origin(self):
        a = exp_im.make_tiles(np.zeros((400, 400)), tissue_mask=self._mask(),
                              tile_size=(96, 96), min_tissue_fraction=0.0)
        b = exp_im.make_tiles(np.zeros((400, 400)), tissue_mask=self._mask(),
                              tile_size=(96, 96), min_tissue_fraction=0.0,
                              center_grid_on_tissue=True)
        assert not np.array_equal(a["pixel_y0"].to_numpy(), b["pixel_y0"].to_numpy()) or not np.array_equal(
            a["pixel_x0"].to_numpy(), b["pixel_x0"].to_numpy()
        )

    def test_from_spots_size_inferred_from_spacing(self):
        # hex-ish Visium lattice with 20px vertical pitch
        xs, ys = np.meshgrid(np.arange(5) * 24.0, np.arange(5) * 20.0)
        spots = np.column_stack([xs.ravel(), ys.ravel()])
        df = exp_im.make_tiles_from_spots(spots)
        assert len(df) == 25
        side_y = (df["pixel_y1"] - df["pixel_y0"]).iloc[0]
        assert side_y == pytest.approx(20, abs=2)

    def test_from_spots_explicit_size_and_mask(self):
        spots = np.array([[50.0, 50.0], [150.0, 50.0]])
        mask = np.zeros((200, 200), bool)
        mask[:, :100] = True  # only the first spot's tile is tissue
        df = exp_im.make_tiles_from_spots(spots, tissue_mask=mask, tile_size=40,
                                          min_tissue_fraction=0.9)
        assert len(df) == 2
        cls = df["tile_classification"].tolist()
        assert cls.count("tissue") == 1


class TestQCTileSizeForms:
    """tile_size accepts the reference's (ty, tx) tuple form
    (/root/reference/src/squidpy/experimental/im/_qc_image.py:51) and
    degrades gracefully when tiles exceed the image."""

    def _img(self, h=64, w=96):
        rng = np.random.default_rng(0)
        return rng.integers(0, 255, (h, w, 3)).astype(np.uint8)

    def test_rectangular_tuple(self):
        qc = exp_im.qc_image(self._img(), tile_size=(32, 48))
        assert qc.uns["qc_image"]["grid_shape"] == (2, 2)
        assert qc.uns["qc_image"]["tile_size"] == (32, 48)
        assert qc.uns["qc_image"]["tile_size_y"] == 32
        assert qc.uns["qc_image"]["tile_size_x"] == 48
        # pixel bounds reflect the rectangular pitch
        assert qc.obs["x0"].max() == 48
        assert qc.obs["y0"].max() == 32

    def test_tile_larger_than_image_single_tile(self):
        qc = exp_im.qc_image(self._img(), tile_size=(128, 128))
        assert qc.uns["qc_image"]["grid_shape"] == (1, 1)
        assert qc.uns["qc_image"]["tile_size"] == (64, 96)
        assert qc.n_obs == 1

    def test_int_and_tuple_agree_when_square(self):
        a = exp_im.qc_image(self._img(), tile_size=32)
        b = exp_im.qc_image(self._img(), tile_size=(32, 32))
        np.testing.assert_allclose(a.X, b.X)

    def test_invalid_tile_size(self):
        with pytest.raises(ValueError, match="positive tile sizes"):
            exp_im.qc_image(self._img(), tile_size=(0, 32))
        with pytest.raises(ValueError, match="int, \\(ty, tx\\) tuple or 'auto'"):
            exp_im.qc_image(self._img(), tile_size="bogus")


class TestQcReferenceSchema:
    """Output-schema contract from the reference's tests/experimental/
    test_qc_image.py:156-216 (qc_ prefixes, categorical flags, centroids)."""

    def _img(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (256, 256)).astype(np.float32)
        img[:, :128] *= 0.2
        return img

    def test_compute_only_schema(self):
        qc = exp_im.qc_image(
            self._img(), tile_size=128, metrics=["tenengrad", "brightness_mean"],
            detect_outliers=False, detect_tissue=False, progress=False,
        )
        assert set(qc.var_names) == {"qc_tenengrad", "qc_brightness_mean"}
        assert "qc_outlier" not in qc.obs.columns
        assert "unfocus_score" not in qc.obs.columns
        assert "centroid_y" in qc.obs.columns and "centroid_x" in qc.obs.columns
        assert "spatial" in qc.obsm

    def test_outlier_columns_with_tissue(self):
        qc = exp_im.qc_image(
            self._img(), tile_size=64, metrics=["tenengrad"],
            detect_outliers=True, detect_tissue=True, progress=False,
        )
        for col in ("qc_outlier", "is_tissue", "is_background", "unfocus_score"):
            assert col in qc.obs.columns
        assert set(qc.obs["qc_outlier"].cat.categories) == {"False", "True"}
        assert (qc.obs["is_tissue"] == "True").any()

    def test_outlier_columns_without_tissue(self):
        qc = exp_im.qc_image(
            self._img(), tile_size=64, metrics=["tenengrad"],
            detect_outliers=True, detect_tissue=False, progress=False,
        )
        assert "qc_outlier" in qc.obs.columns
        assert "is_tissue" not in qc.obs.columns
        assert not np.any(np.isnan(qc.obs["unfocus_score"].to_numpy(dtype=float)))

    def test_outlier_threshold_fraction_form(self):
        # reference expresses the cut as a fraction in (0, 1)
        qc = exp_im.qc_image(
            self._img(), tile_size=64, metrics=["tenengrad"], outlier_threshold=0.25,
            progress=False,
        )
        flagged = (qc.obs["qc_outlier"] == "True").sum()
        assert 0 < flagged < qc.n_obs

    def test_table_key_contract(self):
        import squidpy_tpu as sq

        sd = sq.SpatialData(images={"hne": (self._img() * 255).astype(np.uint8)})
        exp_im.qc_image(sd, image_key="hne", tile_size=128, metrics=["tenengrad"], progress=False)
        assert "qc_img_hne" in sd.tables

    def test_plot_accepts_bare_metric_names(self, tmp_path):
        from squidpy_tpu.experimental import pl as exp_pl

        qc = exp_im.qc_image(self._img(), tile_size=128, metrics=["tenengrad"], progress=False)
        exp_pl.qc_image(qc, metrics=["tenengrad"], save=str(tmp_path / "bare.png"))
        assert (tmp_path / "bare.png").exists()
