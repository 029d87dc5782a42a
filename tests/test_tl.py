"""Tools (sliding_window, var_by_distance) — reference tests/tools suite."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import squidpy_tpu as sq


class TestSlidingWindow:
    @pytest.fixture()
    def grid_adata(self) -> sq.AnnData:
        xx, yy = np.meshgrid(np.arange(20), np.arange(20))
        coords = np.c_[xx.ravel(), yy.ravel()].astype(float)
        adata = sq.AnnData(X=np.zeros((400, 1)))
        adata.obsm["spatial"] = coords
        return adata

    def test_non_overlapping(self, grid_adata):
        sq.tl.sliding_window(grid_adata, window_size=10)
        col = grid_adata.obs["sliding_window_assignment"]
        assert isinstance(col.dtype, pd.CategoricalDtype)
        assert col.notna().all()
        # 2x2 windows of 10x10 on a 0..19 grid -> 4 windows
        assert col.nunique() == 4

    def test_overlapping_boolean_columns(self, grid_adata):
        df = sq.tl.sliding_window(grid_adata, window_size=10, overlap=5, copy=True)
        win_cols = [c for c in df.columns if c.startswith("sliding_window_assignment_")]
        assert len(win_cols) > 4
        assert all(df[c].dtype == bool for c in win_cols)
        # every obs belongs to at least one window
        assert df[win_cols].any(axis=1).all()

    def test_library_key(self, grid_adata):
        grid_adata.obs["lib"] = pd.Categorical(["a"] * 200 + ["b"] * 200)
        df = sq.tl.sliding_window(grid_adata, window_size=10, library_key="lib", copy=True)
        labels = df["sliding_window_assignment"].astype(str)
        assert labels.str.startswith(("a_", "b_")).all()

    def test_invalid_overlap(self, grid_adata):
        with pytest.raises(ValueError, match="non-negative"):
            sq.tl.sliding_window(grid_adata, window_size=10, overlap=-1)

    def test_window_size_inferred(self, grid_adata):
        sq.tl.sliding_window(grid_adata)
        assert "sliding_window_assignment" in grid_adata.obs


class TestVarByDistance:
    @pytest.fixture()
    def anchor_adata(self) -> sq.AnnData:
        rng = np.random.default_rng(0)
        n = 100
        adata = sq.AnnData(X=rng.normal(size=(n, 5)))
        adata.obsm["spatial"] = rng.uniform(0, 100, (n, 2))
        labels = ["anchor"] * 10 + ["other"] * (n - 10)
        adata.obs["ct"] = pd.Categorical(labels)
        return adata

    def test_basic(self, anchor_adata):
        sq.tl.var_by_distance(anchor_adata, groups="anchor", cluster_key="ct")
        df = anchor_adata.obsm["design_matrix"]
        assert "anchor" in df.columns and "anchor_raw" in df.columns
        # anchor cells have raw distance 0 and NaN normalized distance
        anchors = anchor_adata.obs["ct"] == "anchor"
        assert (df.loc[np.asarray(anchors), "anchor_raw"] == 0).all()
        assert df.loc[np.asarray(anchors), "anchor"].isna().all()
        valid = df["anchor"].dropna()
        assert valid.min() == 0.0 and valid.max() == 1.0

    def test_raw_distance_correct(self, anchor_adata):
        df = sq.tl.var_by_distance(anchor_adata, groups="anchor", cluster_key="ct", copy=True)
        coords = anchor_adata.obsm["spatial"]
        anchors = coords[:10]
        j = 50  # a non-anchor cell
        want = np.min(np.linalg.norm(anchors - coords[j], axis=1))
        np.testing.assert_allclose(df["anchor_raw"].iloc[j], want, rtol=1e-6)

    def test_custom_coordinate_anchor(self, anchor_adata):
        df = sq.tl.var_by_distance(anchor_adata, groups=np.array([50.0, 50.0]), copy=True)
        assert "custom_anchor" in df.columns

    def test_covariates(self, anchor_adata):
        anchor_adata.obs["cov"] = np.arange(100)
        df = sq.tl.var_by_distance(
            anchor_adata, groups="anchor", cluster_key="ct", covariates="cov", copy=True
        )
        assert "cov" in df.columns

    def test_library_key(self, anchor_adata):
        anchor_adata.obs["lib"] = pd.Categorical(["s1"] * 50 + ["s2"] * 50)
        anchor_adata.obs["ct"] = pd.Categorical(["anchor"] * 5 + ["other"] * 45 + ["anchor"] * 5 + ["other"] * 45)
        df = sq.tl.var_by_distance(
            anchor_adata, groups="anchor", cluster_key="ct", library_key="lib", copy=True
        )
        for lib in ("s1", "s2"):
            sub = df[np.asarray(anchor_adata.obs["lib"] == lib)]["anchor"].dropna()
            assert sub.max() == 1.0


class TestWindowCornersGroundTruth:
    """Literal expected corners from reference
    tests/tools/test_sliding_window.py:113-185."""

    @pytest.mark.parametrize(
        "overlap,drop,shape,first,last",
        [
            (20, False, (9, 4), [0, 100, 0, 100], [160, 200, 160, 200]),
            (0, False, (4, 4), [0, 100, 0, 100], [100, 200, 100, 200]),
            (20, True, (4, 4), [0, 100, 0, 100], [80, 180, 80, 180]),
        ],
    )
    def test_corners(self, overlap, drop, shape, first, last):
        from squidpy_tpu.tl._sliding_window import _calculate_window_corners

        w = _calculate_window_corners(
            min_x=0, max_x=200, min_y=0, max_y=200,
            window_size=100, overlap=overlap, drop_partial_windows=drop,
        )
        assert w.shape == shape
        assert w.iloc[0].values.tolist() == first
        assert w.iloc[-1].values.tolist() == last


def test_profile_context_produces_trace(tmp_path, dummy_adata):
    import glob

    import squidpy_tpu as sq

    with sq.utils.profile(str(tmp_path)):
        with sq.utils.annotate("phase"):
            sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=4)
    assert glob.glob(str(tmp_path) + "/**/*.xplane.pb", recursive=True)



class TestSlidingWindowDepth:
    @pytest.fixture()
    def grid_adata(self) -> sq.AnnData:
        xx, yy = np.meshgrid(np.arange(20), np.arange(20))
        coords = np.c_[xx.ravel(), yy.ravel()].astype(float)
        adata = sq.AnnData(X=np.zeros((400, 1)))
        adata.obsm["spatial"] = coords
        return adata

    def test_obs_coord_columns_win_over_obsm(self, grid_adata):
        # explicit obs columns take precedence over obsm['spatial']
        grid_adata.obs["globalX"] = np.repeat(np.arange(20.0), 20)
        grid_adata.obs["globalY"] = np.tile(np.arange(20.0), 20)
        sq.tl.sliding_window(grid_adata, window_size=10)
        assert grid_adata.obs["sliding_window_assignment"].nunique() == 4

    def test_missing_coords_raises(self):
        adata = sq.AnnData(X=np.zeros((5, 1)))
        with pytest.raises(ValueError, match="Coordinates not found"):
            sq.tl.sliding_window(adata, window_size=10, spatial_key="nope")

    def test_auto_window_size_literal(self):
        from squidpy_tpu.tl._sliding_window import _auto_window_size

        xy = np.array([[0.0, 0.0], [100.0, 40.0]])
        # extent 100 -> int(100 / 3.95) = 25
        assert _auto_window_size(xy) == 25
        assert _auto_window_size(np.array([[1.0, 1.0]])) == 1  # degenerate

    def test_window_membership_is_exhaustive_and_exact(self, grid_adata):
        sq.tl.sliding_window(grid_adata, window_size=10)
        col = grid_adata.obs["sliding_window_assignment"]
        coords = grid_adata.obsm["spatial"]
        # a cell at (3, 17) belongs to the x<=10, y>10 window
        i = int(np.flatnonzero((coords[:, 0] == 3) & (coords[:, 1] == 17))[0])
        winners = col.astype(str).unique()
        assert col.astype(str).iloc[i] in set(winners)
        # all four windows non-empty on the uniform grid
        assert (col.value_counts() > 0).all()

    def test_overwrite_warns(self, grid_adata):
        sq.tl.sliding_window(grid_adata, window_size=10)
        # second call overwrites the column without error
        sq.tl.sliding_window(grid_adata, window_size=20)
        assert grid_adata.obs["sliding_window_assignment"].nunique() == 1

    def test_drop_partial_windows_drops_border(self):
        from squidpy_tpu.tl._sliding_window import _calculate_window_corners

        full = _calculate_window_corners(
            min_x=0, max_x=95, min_y=0, max_y=95, window_size=50, overlap=0,
            drop_partial_windows=False,
        )
        dropped = _calculate_window_corners(
            min_x=0, max_x=95, min_y=0, max_y=95, window_size=50, overlap=0,
            drop_partial_windows=True,
        )
        assert len(dropped) < len(full)
        assert (dropped["x_end"] - dropped["x_start"] == 50).all()

    def test_categories_naturally_ordered(self, grid_adata):
        sq.tl.sliding_window(grid_adata, window_size=5)
        cats = list(grid_adata.obs["sliding_window_assignment"].cat.categories)
        nums = [int(c.split("_")[-1]) for c in cats]
        assert nums == sorted(nums)


class TestVarByDistanceDepth:
    @pytest.fixture()
    def anchor_adata(self) -> sq.AnnData:
        rng = np.random.default_rng(0)
        n = 60
        adata = sq.AnnData(X=rng.normal(size=(n, 3)))
        adata.obsm["spatial"] = rng.uniform(0, 100, (n, 2))
        adata.obs["ct"] = pd.Categorical(["anchor"] * 6 + ["other"] * (n - 6))
        return adata

    def test_multiple_anchor_groups(self, anchor_adata):
        anchor_adata.obs["ct"] = pd.Categorical(
            ["a"] * 6 + ["b"] * 6 + ["other"] * 48
        )
        df = sq.tl.var_by_distance(anchor_adata, groups=["a", "b"], cluster_key="ct", copy=True)
        assert {"a", "a_raw", "b", "b_raw"} <= set(df.columns)

    def test_unknown_group_raises(self, anchor_adata):
        with pytest.raises((KeyError, ValueError)):
            sq.tl.var_by_distance(anchor_adata, groups="missing", cluster_key="ct", copy=True)

    def test_design_matrix_written_to_obsm(self, anchor_adata):
        sq.tl.var_by_distance(anchor_adata, groups="anchor", cluster_key="ct")
        assert "design_matrix" in anchor_adata.obsm

    def test_metric_is_euclidean_min_distance(self, anchor_adata):
        df = sq.tl.var_by_distance(anchor_adata, groups="anchor", cluster_key="ct", copy=True)
        coords = anchor_adata.obsm["spatial"]
        anchors = coords[:6]
        raw = df["anchor_raw"].to_numpy(float)
        for j in (20, 35, 59):
            want = np.min(np.linalg.norm(anchors - coords[j], axis=1))
            np.testing.assert_allclose(raw[j], want, rtol=1e-6)
