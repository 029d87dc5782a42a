"""Ripley F/G/L and sepal tests: naive-numpy parity for the kernels, shape and
semantics checks for the public APIs (modeled on the reference's
tests/graph/test_ripley.py and test_sepal.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import squidpy_tpu as sq


class TestPairCounts:
    def test_matches_naive(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 10, size=(60, 2))
        support = np.linspace(0, 5, 8)
        from squidpy_tpu.ops.ripley import pair_counts_cumulative

        got = pair_counts_cumulative(pts, support)
        d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
        np.fill_diagonal(d, np.inf)
        want = np.array([(d <= s).sum() for s in support], dtype=float)
        np.testing.assert_array_equal(got, want)


class TestEcdfRows:
    def test_matches_rowwise_histogram(self):
        """The batched envelope ECDF must reproduce np.histogram bin
        semantics exactly (right-open bins, closed last bin, out-of-range
        dropped) — including values landing ON bin edges."""
        from squidpy_tpu.gr._ripley import _ecdf, _ecdf_rows

        rng = np.random.default_rng(0)
        support = np.linspace(0, 5.0, 11)
        for _ in range(100):
            m = int(rng.integers(3, 40))
            d = rng.uniform(-0.5, 6.5, size=(4, m))
            d[0, :3] = [0.0, 5.0, 2.5]  # lo edge, closed hi edge, interior
            d[1, 0] = 0.5  # exactly on an interior edge
            got = _ecdf_rows(d, support)
            want = np.stack([_ecdf(row, support) for row in d])
            np.testing.assert_allclose(got, want, rtol=1e-12, atol=0)


class TestBatchedEnvelopeKernels:
    def test_batched_nn_matches_cross_knn(self):
        from squidpy_tpu.ops.knn import cross_knn
        from squidpy_tpu.ops.ripley import batched_nn_distances

        rng = np.random.default_rng(3)
        q = rng.uniform(0, 20, size=(150, 2)).astype(np.float32)
        clouds = rng.uniform(0, 20, size=(5, 200, 2)).astype(np.float32)
        got = batched_nn_distances(q, clouds)
        for s in range(5):
            want, _ = cross_knn(q, clouds[s], 1)
            np.testing.assert_allclose(got[s], want.squeeze(), rtol=1e-6, atol=1e-6)

    def test_batched_pairs_matches_serial(self):
        from squidpy_tpu.ops.ripley import batched_pair_counts, pair_counts_cumulative

        rng = np.random.default_rng(4)
        clouds = rng.uniform(0, 10, size=(4, 120, 2)).astype(np.float32)
        support = np.linspace(0, 6, 9)
        got = batched_pair_counts(clouds, support)
        for s in range(4):
            want = pair_counts_cumulative(clouds[s], support)
            np.testing.assert_array_equal(got[s], want)


class TestPPP:
    def test_points_inside_hull(self):
        from scipy.spatial import ConvexHull, Delaunay

        from squidpy_tpu.ops.ripley import ppp_sample

        rng = np.random.default_rng(1)
        coords = rng.uniform(0, 50, size=(100, 2))
        hull = ConvexHull(coords)
        pts = ppp_sample(hull, 1, 500, np.random.default_rng(0))
        assert pts.shape == (500, 2)
        deln = Delaunay(hull.points[hull.vertices])
        assert (deln.find_simplex(pts) >= 0).all()

    def test_deterministic_given_rng(self):
        from scipy.spatial import ConvexHull

        from squidpy_tpu.ops.ripley import ppp_sample

        coords = np.random.default_rng(1).uniform(0, 50, size=(60, 2))
        hull = ConvexHull(coords)
        a = ppp_sample(hull, 1, 100, np.random.default_rng(7))
        b = ppp_sample(hull, 1, 100, np.random.default_rng(7))
        np.testing.assert_array_equal(a, b)


class TestRipley:
    @pytest.mark.parametrize("mode", ["F", "G", "L"])
    def test_modes_shapes(self, dummy_adata, mode):
        res = sq.gr.ripley(
            dummy_adata, cluster_key="leiden", mode=mode,
            n_simulations=5, n_observations=100, n_steps=20, seed=0, copy=True,
        )
        assert set(res.keys()) == {f"{mode}_stat", "sims_stat", "bins", "pvalues"}
        assert res["pvalues"].shape == (5, 20)
        assert len(res["bins"]) == 20
        stat = res[f"{mode}_stat"]
        assert {"bins", "leiden", "stats"} <= set(stat.columns)
        assert ((res["pvalues"] >= 0) & (res["pvalues"] <= 0.5 + 1e-9)).all()

    def test_writes_uns(self, dummy_adata):
        sq.gr.ripley(dummy_adata, cluster_key="leiden", mode="G",
                     n_simulations=3, n_observations=50, n_steps=10, seed=0)
        assert "leiden_ripley_G" in dummy_adata.uns

    def test_clustered_process_l_above_random(self):
        # clustered point pattern: L(t) of clustered points exceeds Poisson
        rng = np.random.default_rng(2)
        centers = rng.uniform(10, 90, size=(8, 2))
        pts = (centers[rng.integers(0, 8, 400)] + rng.normal(0, 1.5, (400, 2)))
        adata = sq.AnnData(X=np.zeros((400, 1)))
        adata.obsm["spatial"] = pts
        adata.obs["cl"] = pd.Categorical(["a"] * 400)
        res = sq.gr.ripley(adata, cluster_key="cl", mode="L",
                           n_simulations=10, n_observations=400, seed=0, copy=True)
        obs = res["L_stat"]["stats"].to_numpy()
        sims = res["sims_stat"].groupby("bins", observed=True)["stats"].mean().to_numpy()
        # in the clustered regime the observed L dominates the CSR envelope mid-support
        assert obs[10:30].mean() > sims[10:30].mean()

    def test_unsupported_metric(self, dummy_adata):
        with pytest.raises(ValueError, match="Unsupported metric"):
            sq.gr.ripley(dummy_adata, cluster_key="leiden", metric="manhattan", copy=True)


def _grid_adata(n_side: int = 12, n_genes: int = 6) -> sq.AnnData:
    rng = np.random.default_rng(0)
    xx, yy = np.meshgrid(np.arange(n_side), np.arange(n_side))
    coords = np.c_[xx.ravel(), yy.ravel()].astype(float)
    n = len(coords)
    X = rng.poisson(5.0, size=(n, n_genes)).astype(float)
    # gene 0: strong spatial gradient (diffuses slowly -> high sepal score)
    X[:, 0] = np.exp(-((coords[:, 0] - n_side / 2) ** 2 + (coords[:, 1] - n_side / 2) ** 2) / 4.0) * 50
    adata = sq.AnnData(X=X, var=pd.DataFrame(index=[f"g{i}" for i in range(n_genes)]))
    adata.obsm["spatial"] = coords
    return adata


class TestSepal:
    def test_square_grid_scores(self):
        adata = _grid_adata()
        sq.gr.spatial_neighbors_grid(adata, n_neighs=4)
        df = sq.gr.sepal(adata, max_neighs=4, n_iter=30000, copy=True)
        assert list(df.columns) == ["sepal_score"]
        assert len(df) == 6
        # the structured gene converges and diffuses longest among converged
        assert df["sepal_score"].notna().any()
        converged = df["sepal_score"].dropna()
        assert converged.index[0] == "g0"

    def test_matches_naive_diffusion(self):
        """Device while_loop must reproduce a pure-numpy port of the reference
        scalar diffusion loop, iteration for iteration."""
        adata = _grid_adata(n_side=8, n_genes=3)
        sq.gr.spatial_neighbors_grid(adata, n_neighs=4)
        from squidpy_tpu.gr._sepal import _compute_idxs

        g = adata.obsp["spatial_connectivities"].tocsr()
        spatial = np.asarray(adata.obsm["spatial"], dtype=float)
        sat, sat_idx, unsat, nearest = _compute_idxs(g, spatial, 4)
        pos = np.searchsorted(sat, nearest)

        def naive_diffusion(conc, n_iter=5000, dt=0.001, thresh=1e-8):
            conc = conc.copy()
            prev_ent = 1.0
            for i in range(n_iter):
                nhood = conc[sat_idx].sum(axis=1)
                d2 = nhood - 4 * conc[sat]
                dcdt = np.zeros_like(conc)
                dcdt[sat] = d2
                conc[sat] += d2 * dt
                conc[unsat] += dcdt[sat[pos]] * dt
                conc[conc < 0] = 0
                xnz = conc[sat][conc[sat] > 0]
                xs = xnz.sum()
                if xs < np.finfo(float).eps:
                    ent = 0.0
                else:
                    xn = xnz / xs
                    ent = float(-(xn * np.log(np.maximum(xn, np.finfo(float).eps))).sum())
                ent = ent / len(sat)
                if abs(ent - prev_ent) <= thresh:
                    return float(i)
                prev_ent = ent
            return np.nan

        X = np.asarray(adata.X, dtype=float)
        want = np.array([naive_diffusion(X[:, j]) for j in range(3)])

        import jax.numpy as jnp

        from squidpy_tpu.ops.sepal import sepal_diffusion

        got = np.asarray(
            sepal_diffusion(
                jnp.asarray(X), jnp.asarray(sat), jnp.asarray(sat_idx), jnp.asarray(unsat),
                jnp.asarray(pos.astype(np.int32)), False, 5000, 0.001, 1e-8,
            )
        )
        np.testing.assert_array_equal(got, want)

    def test_wrong_max_neighs(self, dummy_adata):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6)
        with pytest.raises(ValueError, match="max_neighs"):
            sq.gr.sepal(dummy_adata, max_neighs=5, copy=True)

    def test_writes_uns(self):
        adata = _grid_adata(n_side=8, n_genes=3)
        sq.gr.spatial_neighbors_grid(adata, n_neighs=4)
        sq.gr.sepal(adata, max_neighs=4, n_iter=3000)
        assert "sepal_score" in adata.uns


def test_ripley_G_single_present_category(dummy_adata):
    """G mode with one present category queries an empty 'other points' set;
    must degrade to a NaN curve (sklearn-like), not crash."""
    import pandas as pd

    dummy_adata.obs["one"] = pd.Categorical(["a"] * dummy_adata.n_obs, categories=["a", "zz"])
    with np.errstate(invalid="ignore"):
        res = sq.gr.ripley(dummy_adata, "one", mode="G", n_simulations=2,
                           n_observations=30, n_steps=5, seed=0, copy=True)
    stats = res["G_stat"]["stats"].to_numpy()
    assert np.isnan(stats[1:]).all() and stats[0] == 0


class TestRipleyReferenceContract:
    """Result-shape and seed contracts from the reference suite
    (/root/reference/tests/graph/test_ripley.py:45-131)."""

    @pytest.mark.parametrize("mode", ["F", "G", "L"])
    @pytest.mark.parametrize("n_steps", [2, 50])
    @pytest.mark.parametrize("max_dist", [None, 1000])
    def test_result_shapes(self, dummy_adata, mode, n_steps, max_dist):
        n_sims, n_obs = 10, 50
        n_clusters = len(dummy_adata.obs["leiden"].cat.categories)
        res = sq.gr.ripley(
            dummy_adata, cluster_key="leiden", mode=mode,
            n_simulations=n_sims, n_observations=n_obs,
            max_dist=max_dist, n_steps=n_steps, seed=0, copy=True,
        )
        obs_df, sims_df = res[f"{mode}_stat"], res["sims_stat"]
        assert obs_df.shape == (n_steps * n_clusters, 3)
        assert sims_df.shape == (n_steps * n_sims, 3)
        assert res["bins"].shape == (n_steps,)
        assert res["pvalues"].shape == (n_clusters, n_steps)
        # first bin is zero for both observed and simulated curves
        assert sims_df["bins"].values[0] == 0.0 == obs_df["bins"].values[0]
        assert sims_df["stats"].values[0] == 0.0 == obs_df["stats"].values[0]
        # each cluster's curve starts at the zero bin
        idx = np.nonzero(obs_df["bins"].values)[0]
        assert idx.shape[0] == n_steps * n_clusters - n_clusters

    @pytest.mark.parametrize("mode", ["F", "G", "L"])
    def test_seed_reproducibility(self, dummy_adata, mode):
        kw = dict(cluster_key="leiden", mode=mode, n_simulations=10,
                  n_observations=50, n_steps=20, copy=True)
        res1 = sq.gr.ripley(dummy_adata, seed=42, **kw)
        res2 = sq.gr.ripley(dummy_adata, seed=42, **kw)
        res3 = sq.gr.ripley(dummy_adata, seed=43, **kw)
        np.testing.assert_allclose(
            res1["sims_stat"]["stats"].values, res2["sims_stat"]["stats"].values
        )
        assert not np.allclose(
            res1["sims_stat"]["stats"].values, res3["sims_stat"]["stats"].values
        )
        # individual simulations differ from each other
        sims = res1["sims_stat"]
        curves = {tuple(g["stats"].values) for _, g in sims.groupby(sims.index // 20)}
        assert len(curves) > 1

    def test_observed_equals_category_counts(self, dummy_adata):
        res = sq.gr.ripley(
            dummy_adata, cluster_key="leiden", mode="G",
            n_simulations=3, n_observations=50, n_steps=10, seed=0, copy=True,
        )
        obs_df = res["G_stat"]
        assert set(obs_df["leiden"].unique()) <= set(dummy_adata.obs["leiden"].cat.categories)


class TestPairCountsBuckets:
    """Triangular sweep internals: shape bucketing + exact large counts."""

    def test_padded_bucket_matches_naive(self):
        from scipy.spatial.distance import pdist

        from squidpy_tpu.ops.ripley import pair_counts_cumulative

        rng = np.random.default_rng(3)
        pts = rng.uniform(0, 100, (1500, 2))  # pads 1500 -> 2048 at tile 1024
        sup = np.linspace(0, 80, 9)
        got = pair_counts_cumulative(pts, sup, row_tile=1024)
        d = pdist(pts)
        want = np.array([2 * (d <= s).sum() for s in sup], dtype=float)
        np.testing.assert_array_equal(got, want)

    def test_bucketed_shapes_share_one_executable(self):
        from squidpy_tpu.ops.ripley import _pair_counts_device

        rng = np.random.default_rng(4)
        sizes_before = _pair_counts_device._cache_size()
        for m in (1100, 1400, 1900):  # all bucket to 2048
            pts = rng.uniform(0, 100, (m, 2))
            pair_counts_cumulative_ = __import__(
                "squidpy_tpu.ops.ripley", fromlist=["pair_counts_cumulative"]
            ).pair_counts_cumulative
            pair_counts_cumulative_(pts, np.linspace(0, 50, 5), row_tile=1024)
        assert _pair_counts_device._cache_size() - sizes_before <= 1
