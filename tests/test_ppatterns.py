"""spatial_autocorr / co_occurrence parity tests against naive float64 numpy
implementations of the published formulas (the reference delegates to scanpy's
numba kernels computing exactly these)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from scipy import sparse as sp

import squidpy_tpu as sq


def naive_moran(g: sp.csr_matrix, x: np.ndarray) -> float:
    n = g.shape[0]
    z = x - x.mean()
    return n / g.sum() * float(z @ (g @ z)) / float(z @ z)


def naive_geary(g: sp.csr_matrix, x: np.ndarray) -> float:
    n = g.shape[0]
    coo = g.tocoo()
    num = float(np.sum(coo.data * (x[coo.row] - x[coo.col]) ** 2))
    z = x - x.mean()
    return (n - 1) / (2 * g.sum()) * num / float(z @ z)


def row_normalize(g: sp.csr_matrix) -> sp.csr_matrix:
    rs = np.asarray(g.sum(axis=1)).ravel()
    scale = np.divide(1.0, rs, out=np.zeros_like(rs), where=rs != 0)
    return sp.csr_matrix(sp.diags(scale) @ g)


@pytest.fixture()
def graph_adata(dummy_adata):
    sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6)
    return dummy_adata


class TestSpatialAutocorr:
    def test_moran_matches_naive(self, graph_adata):
        df = sq.gr.spatial_autocorr(graph_adata, mode="moran", copy=True, transformation=True)
        g = row_normalize(sp.csr_matrix(graph_adata.obsp["spatial_connectivities"], dtype=float))
        X = np.asarray(graph_adata.X, dtype=float)
        for gene in ["gene_0", "gene_7", "gene_29"]:
            j = list(graph_adata.var_names).index(gene)
            want = naive_moran(g, X[:, j])
            np.testing.assert_allclose(df.loc[gene, "I"], want, rtol=1e-10)

    def test_geary_matches_naive(self, graph_adata):
        df = sq.gr.spatial_autocorr(graph_adata, mode="geary", copy=True, transformation=False)
        g = sp.csr_matrix(graph_adata.obsp["spatial_connectivities"], dtype=float)
        X = np.asarray(graph_adata.X, dtype=float)
        for gene in ["gene_0", "gene_15"]:
            j = list(graph_adata.var_names).index(gene)
            want = naive_geary(g, X[:, j])
            np.testing.assert_allclose(df.loc[gene, "C"], want, rtol=1e-10)

    def test_moran_perm_identity(self, graph_adata):
        """Permutation scores must equal naive scoring of the row-permuted W."""
        import jax.numpy as jnp

        from squidpy_tpu._core.graph import SpatialGraph
        from squidpy_tpu.ops.autocorr import moran_perm_scores, spmv_genes

        g = row_normalize(sp.csr_matrix(graph_adata.obsp["spatial_connectivities"], dtype=float))
        X = np.asarray(graph_adata.X, dtype=float)[:, :5]
        graph = SpatialGraph.from_csr(g)
        z = X - X.mean(axis=0, keepdims=True)
        u = spmv_genes(graph.indices, graph.weights, jnp.asarray(z))
        rng = np.random.default_rng(0)
        perms = np.stack([rng.permutation(X.shape[0]) for _ in range(4)])
        got = np.asarray(moran_perm_scores(jnp.asarray(z), u, jnp.asarray(perms), g.sum()))
        for p in range(4):
            gp = g[perms[p], :]
            for j in range(5):
                want = naive_moran(sp.csr_matrix(gp), X[:, j])
                np.testing.assert_allclose(got[p, j], want, rtol=1e-9)

    def test_geary_perm_identity(self, graph_adata):
        import jax.numpy as jnp

        from squidpy_tpu._core.graph import SpatialGraph
        from squidpy_tpu.ops.autocorr import geary_perm_scores, spmv_genes

        g = row_normalize(sp.csr_matrix(graph_adata.obsp["spatial_connectivities"], dtype=float))
        X = np.asarray(graph_adata.X, dtype=float)[:, :3]
        graph = SpatialGraph.from_csr(g)
        z = X - X.mean(axis=0, keepdims=True)
        zj = jnp.asarray(z)
        u = spmv_genes(graph.indices, graph.weights, zj)
        r = jnp.asarray(np.asarray(g.sum(axis=1)).ravel())
        c = jnp.asarray(np.asarray(g.sum(axis=0)).ravel())
        cg = jnp.sum(c[:, None] * (zj * zj), axis=0)
        rng = np.random.default_rng(1)
        perms = np.stack([rng.permutation(X.shape[0]) for _ in range(3)])
        got = np.asarray(geary_perm_scores(zj, u, r, cg, jnp.asarray(perms), g.sum()))
        for p in range(3):
            gp = sp.csr_matrix(g[perms[p], :])
            for j in range(3):
                want = naive_geary(gp, X[:, j])
                np.testing.assert_allclose(got[p, j], want, rtol=1e-9)

    def test_full_run_with_perms_columns(self, graph_adata):
        df = sq.gr.spatial_autocorr(graph_adata, mode="moran", n_perms=50, seed=0, copy=True)
        for col in ["I", "pval_norm", "var_norm", "pval_z_sim", "pval_sim", "var_sim",
                    "pval_norm_fdr_bh", "pval_z_sim_fdr_bh", "pval_sim_fdr_bh"]:
            assert col in df.columns, col
        assert df["I"].is_monotonic_decreasing
        assert ((df["pval_sim"] > 0) & (df["pval_sim"] <= 1)).all()

    def test_full_run_geary_perms(self, graph_adata):
        """Geary + n_perms via the public API (regressed in round 4: the
        perms branch freed xb then scored from it)."""
        df = sq.gr.spatial_autocorr(graph_adata, mode="geary", n_perms=20, seed=0, copy=True)
        for col in ["C", "pval_norm", "pval_z_sim", "pval_sim", "var_sim"]:
            assert col in df.columns, col
        assert ((df["pval_sim"] > 0) & (df["pval_sim"] <= 1)).all()
        # the observed score must match the no-perm path exactly (it is
        # derived from z/u, not recomputed from x)
        df0 = sq.gr.spatial_autocorr(graph_adata, mode="geary", copy=True)
        np.testing.assert_allclose(
            df["C"].sort_index().to_numpy(), df0["C"].sort_index().to_numpy(), rtol=1e-10
        )

    def test_writes_uns_key(self, graph_adata):
        sq.gr.spatial_autocorr(graph_adata, mode="moran")
        assert "moranI" in graph_adata.uns
        sq.gr.spatial_autocorr(graph_adata, mode="geary")
        assert "gearyC" in graph_adata.uns

    def test_attr_obs(self, graph_adata):
        graph_adata.obs["signal"] = np.asarray(graph_adata.X, dtype=float)[:, 0]
        df = sq.gr.spatial_autocorr(graph_adata, attr="obs", genes="signal", copy=True)
        assert list(df.index) == ["signal"]

    def test_attr_obsm(self, graph_adata):
        graph_adata.obsm["X_pca"] = np.asarray(graph_adata.X, dtype=float)[:, :4]
        df = sq.gr.spatial_autocorr(graph_adata, attr="obsm", layer="X_pca", genes=[0, 2], copy=True)
        assert len(df) == 2

    def test_highly_variable_default(self, graph_adata):
        graph_adata.var["highly_variable"] = np.array([True] * 10 + [False] * 20)
        df = sq.gr.spatial_autocorr(graph_adata, copy=True)
        assert len(df) == 10

    def test_spatially_structured_signal_detected(self, graph_adata):
        coords = graph_adata.obsm["spatial"]
        graph_adata.obs["structured"] = np.sin(coords[:, 0] / 15.0)
        df = sq.gr.spatial_autocorr(graph_adata, attr="obs", genes="structured", copy=True)
        assert df.loc["structured", "I"] > 0.3
        assert df.loc["structured", "pval_norm"] < 1e-6

    def test_analytic_pval_moran_formula(self, graph_adata):
        """var_norm must equal the Cliff&Ord moran variance computed by hand."""
        df = sq.gr.spatial_autocorr(graph_adata, mode="moran", copy=True)
        g = row_normalize(sp.csr_matrix(graph_adata.obsp["spatial_connectivities"], dtype=float))
        n = g.shape[0]
        s0 = g.sum()
        t = g.T + g
        s1 = (t.multiply(t)).sum() / 2
        s2 = (np.asarray(g.sum(1)) + np.asarray(g.sum(0)).T).ravel() ** 2
        s2 = s2.sum()
        v = (n * n * s1 - n * s2 + 3 * s0 * s0) / ((n - 1) * (n + 1) * s0 * s0) - (1 / (n - 1)) ** 2
        np.testing.assert_allclose(df["var_norm"].iloc[0], v, rtol=1e-12)

    def test_sparse_X(self, graph_adata):
        graph_adata.X = sp.csr_matrix(np.abs(np.asarray(graph_adata.X)))
        df = sq.gr.spatial_autocorr(graph_adata, mode="moran", copy=True)
        assert np.isfinite(df["I"]).all()

    def test_gene_blocking_invariance(self, graph_adata):
        df1 = sq.gr.spatial_autocorr(graph_adata, copy=True, gene_block_size=7)
        df2 = sq.gr.spatial_autocorr(graph_adata, copy=True, gene_block_size=2048)
        np.testing.assert_allclose(df1["I"].values, df2["I"].values, rtol=1e-12)


def naive_cooccur_counts(coords, labs, thresholds_sq, k):
    n = len(coords)
    L = len(thresholds_sq)
    counts = np.zeros((k, k, L), dtype=np.int64)
    for i in range(n):
        d2 = np.sum((coords - coords[i]) ** 2, axis=1)
        d2[i] = np.inf
        for r, t in enumerate(thresholds_sq):
            close = d2 <= t
            np.add.at(counts[labs[i]], (labs[close], np.full(close.sum(), r)), 1)
    return counts


class TestCoOccurrence:
    def test_counts_match_naive(self):
        rng = np.random.default_rng(5)
        coords = rng.uniform(0, 20, size=(80, 2)).astype(np.float32)
        labs = rng.integers(0, 3, size=80).astype(np.int32)
        thresholds = np.array([3.0, 6.0, 12.0], dtype=np.float32) ** 2
        from squidpy_tpu.ops.cooccur import co_occurrence_counts

        got = co_occurrence_counts(coords, labs, thresholds, 3)
        want = naive_cooccur_counts(coords.astype(np.float64), labs, thresholds.astype(np.float64), 3)
        np.testing.assert_array_equal(got, want)

    def test_full_run(self, dummy_adata):
        occ, interval = sq.gr.co_occurrence(dummy_adata, cluster_key="leiden", interval=20, copy=True)
        assert occ.shape == (5, 5, 19)
        assert len(interval) == 20
        assert np.isfinite(occ).all()
        # at the largest radius nearly all cells co-occur -> ratio ~ 1
        np.testing.assert_allclose(occ[:, :, -1][occ[:, :, -1] > 0], 1.0, atol=0.35)

    def test_custom_interval(self, dummy_adata):
        occ, interval = sq.gr.co_occurrence(dummy_adata, cluster_key="leiden", interval=np.array([10.0, 30.0, 60.0]), copy=True)
        assert occ.shape == (5, 5, 2)
        np.testing.assert_allclose(interval, [10.0, 30.0, 60.0])

    def test_writes_uns(self, dummy_adata):
        sq.gr.co_occurrence(dummy_adata, cluster_key="leiden", interval=10)
        out = dummy_adata.uns["leiden_co_occurrence"]
        assert out["occ"].shape[2] == 9

    def test_interval_too_short(self, dummy_adata):
        with pytest.raises(ValueError, match="interval"):
            sq.gr.co_occurrence(dummy_adata, cluster_key="leiden", interval=np.array([5.0]))


class TestMultipletests:
    def test_fdr_bh_known_values(self):
        from squidpy_tpu.utils._stats import multipletests

        pvals = np.array([0.01, 0.04, 0.03, 0.005])
        _, adj, _, _ = multipletests(pvals, method="fdr_bh")
        # hand-computed BH: sorted [.005,.01,.03,.04] -> [.02,.02,.04,.04]
        np.testing.assert_allclose(adj, [0.02, 0.04, 0.04, 0.02])

    def test_bonferroni(self):
        from squidpy_tpu.utils._stats import multipletests

        _, adj, _, _ = multipletests(np.array([0.01, 0.2, 0.5]), method="bonferroni")
        np.testing.assert_allclose(adj, [0.03, 0.6, 1.0])


class TestPallasCooccur:
    def test_pallas_matches_xla(self):
        """Fused Pallas kernel (interpret mode on the CPU mesh) must produce
        identical counts to the XLA path."""
        from squidpy_tpu.ops.cooccur import co_occurrence_counts
        from squidpy_tpu.ops.pallas_pairs import cooccur_counts_pallas

        rng = np.random.default_rng(11)
        coords = rng.uniform(0, 30, size=(150, 2)).astype(np.float32)
        labs = rng.integers(0, 4, size=150).astype(np.int32)
        thresholds = (np.array([4.0, 9.0, 20.0], dtype=np.float32)) ** 2
        got = cooccur_counts_pallas(coords, labs, thresholds, 4)
        want = co_occurrence_counts(coords, labs, thresholds, 4)
        np.testing.assert_array_equal(got, want)

    def test_public_api_use_pallas(self, dummy_adata):
        occ1, _ = sq.gr.co_occurrence(dummy_adata, cluster_key="leiden", interval=5, copy=True, use_pallas=True)
        occ2, _ = sq.gr.co_occurrence(dummy_adata, cluster_key="leiden", interval=5, copy=True)
        # the two formulations round d² differently; a handful of
        # threshold-boundary pairs may flip (measured: 1 pair in 1.9M)
        np.testing.assert_allclose(occ1, occ2, rtol=1e-5, atol=0.02)


class TestVarNormGeary:
    def test_geary_var_norm_distinct_formula(self, graph_adata):
        """Geary's C uses its own Cliff&Ord normality variance, not Moran's
        (reference regression for issue #1183,
        tests/graph/test_ppatterns.py:109-137)."""
        df = sq.gr.spatial_autocorr(graph_adata, mode="geary", copy=True)
        g = row_normalize(sp.csr_matrix(graph_adata.obsp["spatial_connectivities"], dtype=float))
        n = g.shape[0]
        s0 = g.sum()
        t = g.T + g
        s1 = (t.multiply(t)).sum() / 2
        s2 = ((np.asarray(g.sum(1)) + np.asarray(g.sum(0)).T).ravel() ** 2).sum()
        s02 = s0 * s0
        geary_var = ((2 * s1 + s2) * (n - 1) - 4 * s02) / (2 * (n + 1) * s02)
        moran_var = (n * n * s1 - n * s2 + 3 * s02) / ((n - 1) * (n + 1) * s02) - (1 / (n - 1)) ** 2
        np.testing.assert_allclose(df["var_norm"].iloc[0], geary_var, rtol=1e-10)
        assert not np.isclose(geary_var, moran_var, rtol=1e-3)


class TestUseRaw:
    def test_use_raw(self, graph_adata):
        """use_raw=True scores raw expression (reference
        tests/graph/test_ppatterns.py:210)."""
        from squidpy_tpu._core.anndata import Raw

        raw_X = np.asarray(graph_adata.X).copy()
        graph_adata.raw = Raw(graph_adata)
        graph_adata.X = np.asarray(graph_adata.X) * 0  # destroy X
        df = sq.gr.spatial_autocorr(graph_adata, mode="moran", use_raw=True, copy=True)
        assert np.isfinite(df["I"]).all()
        graph_adata.X = raw_X
        df2 = sq.gr.spatial_autocorr(graph_adata, mode="moran", use_raw=False, copy=True)
        np.testing.assert_allclose(
            df["I"].sort_index().to_numpy(), df2["I"].sort_index().to_numpy(), rtol=1e-6
        )


class TestCooccurExactCounts:
    def test_bucket_past_2pow24_is_exact(self):
        """One class, all-pairs threshold: n(n-1) = 67.1M pairs in one bucket —
        far past f32's 2^24 exact-integer limit; digit accumulation must be
        exact to the pair."""
        from squidpy_tpu.ops.cooccur import co_occurrence_counts

        rng = np.random.default_rng(11)
        n = 8192
        coords = rng.uniform(0, 1, size=(n, 2)).astype(np.float32)
        labs = np.zeros(n, dtype=np.int32)
        thresholds = np.array([1e9], dtype=np.float32)
        counts = co_occurrence_counts(coords, labs, thresholds, 1)
        assert counts.shape == (1, 1, 1)
        assert int(counts[0, 0, 0]) == n * (n - 1)


class TestCoOccurrenceLiteral:
    def test_hand_computed_four_points(self):
        """Literal ground truth, worked by hand.

        Points on a line at x = 0, 1, 2, 10 with labels a, a, b, b and one
        distance bin d <= 1.5. Qualifying ordered pairs: (0,1), (1,0), (1,2),
        (2,1) -> counts[a,a]=2, counts[a,b]=1, counts[b,a]=1, counts[b,b]=0.
        Second-label totals: a: 3, b: 1 (of 4) -> P(a)=3/4, P(b)=1/4.
        occ[i, c] = (counts[c,i]/rowsum[c]) / P(i):
          occ[a,a] = (2/3)/(3/4) = 8/9     occ[a,b] = (1/1)/(3/4) = 4/3
          occ[b,a] = (1/3)/(1/4) = 4/3     occ[b,b] = 0
        (reference semantics: _occur_count + _co_occurrence_helper,
        /root/reference/src/squidpy/gr/_ppatterns.py:283-358)
        """
        import pandas as pd

        from squidpy_tpu._core.anndata import AnnData

        adata = AnnData(
            X=np.zeros((4, 1)),
            obs=pd.DataFrame(
                {"cl": pd.Categorical(["a", "a", "b", "b"])},
                index=[f"c{i}" for i in range(4)],
            ),
        )
        adata.obsm["spatial"] = np.array([[0.0, 0], [1.0, 0], [2.0, 0], [10.0, 0]])
        occ, interval = sq.gr.co_occurrence(
            adata, cluster_key="cl", interval=np.array([0.0, 1.5]), copy=True
        )
        assert occ.shape == (2, 2, 1)
        np.testing.assert_allclose(
            occ[:, :, 0], np.array([[8 / 9, 4 / 3], [4 / 3, 0.0]]), rtol=1e-6
        )


def _skewed_graph(n: int = 400, seed: int = 0) -> sp.csr_matrix:
    """Radius-graph-like adjacency with a dense hub core: most rows have ~6
    neighbors, a few have ~10x that — the degree skew that makes padded ELL
    wasteful."""
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for i in range(n):
        k = 60 if i < n // 20 else 6
        nbrs = rng.choice(n - 1, size=k, replace=False)
        nbrs = nbrs + (nbrs >= i)  # no self loops
        rows += [i] * k
        cols += list(nbrs)
    g = sp.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    g.sum_duplicates()
    return g


class TestDegreeBuckets:
    """Degree-bucketed ELL passes (skewed radius graphs)."""

    def test_knn_graph_has_no_buckets(self, graph_adata):
        from squidpy_tpu._core.graph import SpatialGraph

        g = SpatialGraph.from_csr(sp.csr_matrix(graph_adata.obsp["spatial_connectivities"]))
        assert g.degree_buckets() is None

    def test_buckets_partition_rows(self):
        from squidpy_tpu._core.graph import SpatialGraph

        g = SpatialGraph.from_csr(_skewed_graph())
        buckets = g.degree_buckets()
        assert buckets is not None and len(buckets) > 1
        all_rows = np.concatenate([np.asarray(r) for r, _, _ in buckets])
        assert sorted(all_rows.tolist()) == list(range(g.n_nodes))
        # every bucket's slice is strictly narrower than or equal to k_max,
        # and at least one is strictly narrower (that's the saving)
        widths = [int(i.shape[1]) for _, i, _ in buckets]
        assert max(widths) <= g.k_max and min(widths) < g.k_max

    def test_bucketed_kernels_match_plain(self):
        import jax.numpy as jnp

        from squidpy_tpu._core.graph import SpatialGraph
        from squidpy_tpu.ops.autocorr import (
            geary_scores,
            geary_scores_bucketed,
            moran_scores,
            moran_scores_bucketed,
            spmv_genes,
            spmv_genes_bucketed,
        )

        csr = _skewed_graph()
        g = SpatialGraph.from_csr(csr)
        buckets = g.degree_buckets()
        assert buckets is not None
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(csr.shape[0], 5)))
        s0 = jnp.asarray(float(csr.sum()))

        np.testing.assert_allclose(
            np.asarray(spmv_genes_bucketed(buckets, x)),
            np.asarray(spmv_genes(g.indices, g.weights, x)),
            rtol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(moran_scores_bucketed(buckets, x, s0)),
            np.asarray(moran_scores(g.indices, g.weights, x, s0)),
            rtol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(geary_scores_bucketed(buckets, x, s0)),
            np.asarray(geary_scores(g.indices, g.weights, x, s0)),
            rtol=1e-10,
        )

    @pytest.mark.parametrize("mode", ["moran", "geary"])
    def test_public_autocorr_on_skewed_graph(self, dummy_adata, mode):
        """spatial_autocorr silently takes the bucketed path on a skewed
        radius-like graph and still matches the naive float64 statistic."""
        n = dummy_adata.n_obs
        g = _skewed_graph(n)
        dummy_adata.obsp["spatial_connectivities"] = g
        dummy_adata.uns["spatial_neighbors"] = {"connectivities_key": "spatial_connectivities"}
        df = sq.gr.spatial_autocorr(dummy_adata, mode=mode, copy=True, transformation=False)
        X = np.asarray(dummy_adata.X, dtype=float)
        naive = naive_moran if mode == "moran" else naive_geary
        col = "I" if mode == "moran" else "C"
        for gene in ["gene_0", "gene_11"]:
            j = list(dummy_adata.var_names).index(gene)
            np.testing.assert_allclose(df.loc[gene, col], naive(sp.csr_matrix(g, dtype=float), X[:, j]), rtol=1e-8)

    def test_perm_mode_on_skewed_graph(self, dummy_adata):
        """The permutation path (bucketed u = Wz) stays consistent with the
        score path on the same graph."""
        n = dummy_adata.n_obs
        g = _skewed_graph(n)
        dummy_adata.obsp["spatial_connectivities"] = g
        dummy_adata.uns["spatial_neighbors"] = {"connectivities_key": "spatial_connectivities"}
        scores_only = sq.gr.spatial_autocorr(dummy_adata, mode="moran", copy=True, transformation=True)
        with_perms = sq.gr.spatial_autocorr(
            dummy_adata, mode="moran", n_perms=20, seed=0, copy=True, transformation=True
        )
        np.testing.assert_allclose(
            with_perms["I"].to_numpy(), scores_only["I"].to_numpy(), rtol=1e-10
        )
        assert np.isfinite(with_perms["pval_sim"].to_numpy()).all()


class TestEdgelessGraph:
    """An edgeless spatial graph yields NaN autocorrelation (not a raised
    ZeroDivisionError) — matching the reference's 0/0 → NaN numpy behavior."""

    @pytest.mark.parametrize("mode", ["moran", "geary"])
    def test_edgeless_graph_nan_scores(self, dummy_adata, mode):
        n = dummy_adata.n_obs
        dummy_adata.obsp["spatial_connectivities"] = sp.csr_matrix((n, n))
        dummy_adata.uns["spatial_neighbors"] = {"connectivities_key": "spatial_connectivities"}
        df = sq.gr.spatial_autocorr(dummy_adata, mode=mode, copy=True)
        col = "I" if mode == "moran" else "C"
        assert np.isnan(df[col].to_numpy()).all()
        assert np.isnan(df["pval_norm"].to_numpy()).all()
