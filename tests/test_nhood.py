"""Neighborhood enrichment / interaction matrix tests, modeled on the
reference's (/root/reference/tests/graph/test_nhood.py): exact counts against
a naive numpy implementation, seed reproducibility, and the literal 5-node
interaction-matrix ground truth from the reference's conftest."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import squidpy_tpu as sq


def naive_pair_counts(adj, labels, n_cls):
    """Naive CSR walk — the semantics of the reference's numba ``_nenrich``."""
    counts = np.zeros((n_cls, n_cls), dtype=np.int64)
    indptr, indices = adj.indptr, adj.indices
    for i in range(adj.shape[0]):
        for j in indices[indptr[i] : indptr[i + 1]]:
            counts[labels[i], labels[j]] += 1
    return counts


class TestNhoodEnrichment:
    def test_observed_counts_exact(self, dummy_adata):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6)
        res = sq.gr.nhood_enrichment(dummy_adata, cluster_key="leiden", n_perms=10, seed=0, copy=True)
        labels = dummy_adata.obs["leiden"].cat.codes.to_numpy()
        want = naive_pair_counts(dummy_adata.obsp["spatial_connectivities"], labels, 5)
        np.testing.assert_array_equal(res.counts, want)

    def test_seed_reproducibility(self, dummy_adata):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6)
        r1 = sq.gr.nhood_enrichment(dummy_adata, "leiden", n_perms=50, seed=42, copy=True)
        r2 = sq.gr.nhood_enrichment(dummy_adata, "leiden", n_perms=50, seed=42, copy=True)
        np.testing.assert_array_equal(r1.zscore, r2.zscore)
        r3 = sq.gr.nhood_enrichment(dummy_adata, "leiden", n_perms=50, seed=43, copy=True)
        assert not np.allclose(r1.zscore, r3.zscore)
        np.testing.assert_array_equal(r1.counts, r3.counts)

    def test_writes_uns(self, dummy_adata):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6)
        sq.gr.nhood_enrichment(dummy_adata, "leiden", n_perms=20, seed=0)
        out = dummy_adata.uns["leiden_nhood_enrichment"]
        assert out["zscore"].shape == (5, 5)
        assert out["count"].shape == (5, 5)

    def test_library_key(self, dummy_adata):
        dummy_adata.obs["library"] = pd.Categorical(["a"] * 100 + ["b"] * 100)
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6, library_key="library")
        res = sq.gr.nhood_enrichment(
            dummy_adata, "leiden", library_key="library", n_perms=50, seed=1, copy=True
        )
        assert np.isfinite(res.zscore).all()

    def test_zscore_statistics_sane(self, dummy_adata):
        # random labels: z-scores should be small in magnitude
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6)
        res = sq.gr.nhood_enrichment(dummy_adata, "leiden", n_perms=200, seed=7, copy=True)
        assert np.abs(res.zscore).max() < 6.0

    def test_enriched_structure_detected(self):
        # two spatial blobs with distinct labels -> strong diagonal enrichment
        rng = np.random.default_rng(0)
        c1 = rng.normal(0, 1, size=(100, 2))
        c2 = rng.normal(10, 1, size=(100, 2))
        adata = sq.AnnData(X=np.zeros((200, 1)))
        adata.obsm["spatial"] = np.vstack([c1, c2])
        adata.obs["cl"] = pd.Categorical(["a"] * 100 + ["b"] * 100)
        sq.gr.spatial_neighbors_knn(adata, n_neighs=6)
        res = sq.gr.nhood_enrichment(adata, "cl", n_perms=200, seed=0, copy=True)
        assert res.zscore[0, 0] > 5
        assert res.zscore[1, 1] > 5
        assert res.zscore[0, 1] < -5


class TestInteractionMatrix:
    def test_literal_ground_truth(self, adata_intmat):
        """Reference ground truth
        (tests/graph/test_nhood.py::test_interaction_matrix_values)."""
        got_w = sq.gr.interaction_matrix(adata_intmat, "cat", weights=True, copy=True)
        got_u = sq.gr.interaction_matrix(adata_intmat, "cat", weights=False, copy=True)
        np.testing.assert_array_equal(got_w, np.array([[5, 1], [2, 3]]))
        np.testing.assert_array_equal(got_u, np.array([[4, 1], [2, 2]]))

    def test_normalized(self, adata_intmat):
        got = sq.gr.interaction_matrix(adata_intmat, "cat", normalized=True, copy=True)
        np.testing.assert_allclose(got.sum(axis=1), 1.0)

    def test_nan_category_dropped(self, adata_intmat):
        """Reference: test_interaction_matrix_nan_values."""
        adata_intmat.obs.loc["0", "cat"] = np.nan
        got_w = sq.gr.interaction_matrix(adata_intmat, "cat", weights=True, copy=True)
        got_u = sq.gr.interaction_matrix(adata_intmat, "cat", weights=False, copy=True)
        np.testing.assert_array_equal(got_w, np.array([[2, 1], [2, 3]]))
        np.testing.assert_array_equal(got_u, np.array([[1, 1], [2, 2]]))

    def test_writes_uns(self, adata_intmat):
        sq.gr.interaction_matrix(adata_intmat, "cat")
        assert "cat_interactions" in adata_intmat.uns


class TestCentralityScores:
    def test_basic(self, dummy_adata):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6)
        df = sq.gr.centrality_scores(dummy_adata, "leiden", copy=True)
        assert set(df.columns) == {"degree_centrality", "average_clustering", "closeness_centrality"}
        assert len(df) == 5
        assert np.isfinite(df.values).all()

    def test_single_score(self, dummy_adata):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6)
        df = sq.gr.centrality_scores(dummy_adata, "leiden", score="degree_centrality", copy=True)
        assert list(df.columns) == ["degree_centrality"]

    def test_matches_networkx(self, dummy_adata):
        """Value parity with the reference's networkx oracle
        (/root/reference/src/squidpy/gr/_nhood.py:292-335)."""
        import networkx as nx

        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=4)
        df = sq.gr.centrality_scores(dummy_adata, "leiden", copy=True)

        graph = nx.Graph(dummy_adata.obsp["spatial_connectivities"])
        clusters = dummy_adata.obs["leiden"].values
        for cat in dummy_adata.obs["leiden"].cat.categories:
            idx = np.where(clusters == cat)[0]
            np.testing.assert_allclose(
                df.loc[cat, "closeness_centrality"],
                nx.algorithms.centrality.group_closeness_centrality(graph, idx),
                rtol=1e-12,
            )
            np.testing.assert_allclose(
                df.loc[cat, "degree_centrality"],
                nx.algorithms.centrality.group_degree_centrality(graph, idx),
                rtol=1e-12,
            )
            np.testing.assert_allclose(
                df.loc[cat, "average_clustering"],
                nx.algorithms.cluster.average_clustering(graph, idx),
                rtol=1e-12,
            )

    def test_scales_to_100k_cells(self):
        """The vectorized path must handle ≥100k cells in seconds (the old
        nx.Graph materialization was prohibitive at this size)."""
        import time

        import pandas as pd

        rng = np.random.default_rng(0)
        n = 100_000
        ad = sq.AnnData(
            X=np.zeros((n, 1), dtype=np.float32),
            obs=pd.DataFrame(
                {"cl": pd.Categorical(rng.integers(0, 12, size=n).astype(str))},
                index=[str(i) for i in range(n)],
            ),
        )
        ad.obsm["spatial"] = rng.uniform(0, 1000, size=(n, 2))
        sq.gr.spatial_neighbors_knn(ad, n_neighs=6)
        t0 = time.time()
        df = sq.gr.centrality_scores(ad, "cl", copy=True)
        elapsed = time.time() - t0
        assert np.isfinite(df.values).all()
        assert (df["degree_centrality"] > 0).all()
        assert elapsed < 60.0, f"centrality_scores took {elapsed:.1f}s at 100k cells"


class TestPermutationCache:
    """Optional on-disk memoization of permutation batches (SURVEY §5
    checkpoint/resume: deterministic keyed RNG makes cached batches exact)."""

    def test_cache_roundtrip_exact(self, dummy_adata, tmp_path):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6)
        r1 = sq.gr.nhood_enrichment(dummy_adata, "leiden", n_perms=20, seed=7, cache=str(tmp_path), copy=True)
        r2 = sq.gr.nhood_enrichment(dummy_adata, "leiden", n_perms=20, seed=7, cache=str(tmp_path), copy=True)
        r3 = sq.gr.nhood_enrichment(dummy_adata, "leiden", n_perms=20, seed=7, copy=True)
        np.testing.assert_array_equal(r1.zscore, r2.zscore)
        np.testing.assert_array_equal(r1.zscore, r3.zscore)
        assert len(list((tmp_path / "nhood_enrichment").glob("*.npz"))) == 1

    def test_cache_key_sensitivity(self, dummy_adata, tmp_path):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6)
        sq.gr.nhood_enrichment(dummy_adata, "leiden", n_perms=20, seed=7, cache=str(tmp_path), copy=True)
        sq.gr.nhood_enrichment(dummy_adata, "leiden", n_perms=20, seed=8, cache=str(tmp_path), copy=True)
        sq.gr.nhood_enrichment(dummy_adata, "leiden", n_perms=21, seed=7, cache=str(tmp_path), copy=True)
        assert len(list((tmp_path / "nhood_enrichment").glob("*.npz"))) == 3

    def test_cache_corrupt_entry_recomputed(self, dummy_adata, tmp_path):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6)
        r1 = sq.gr.nhood_enrichment(dummy_adata, "leiden", n_perms=20, seed=7, cache=str(tmp_path), copy=True)
        entry = next((tmp_path / "nhood_enrichment").glob("*.npz"))
        entry.write_bytes(b"garbage")
        r2 = sq.gr.nhood_enrichment(dummy_adata, "leiden", n_perms=20, seed=7, cache=str(tmp_path), copy=True)
        np.testing.assert_array_equal(r1.zscore, r2.zscore)

    def test_cache_requires_seed(self, dummy_adata, tmp_path):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6)
        res = sq.gr.nhood_enrichment(dummy_adata, "leiden", n_perms=10, cache=str(tmp_path), copy=True)
        assert res is not None
        assert not (tmp_path / "nhood_enrichment").exists()

    def test_autocorr_cache_roundtrip(self, dummy_adata, tmp_path):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6)
        d1 = sq.gr.spatial_autocorr(dummy_adata, mode="moran", n_perms=10, seed=3, cache=str(tmp_path), copy=True)
        d2 = sq.gr.spatial_autocorr(dummy_adata, mode="moran", n_perms=10, seed=3, cache=str(tmp_path), copy=True)
        pd.testing.assert_frame_equal(d1, d2)


class TestExactCountsAtScale:
    """Counts must stay exact past 2^24 edges per bucket (f32 saturates there;
    reference semantics are exact integers, gr/_nhood.py:53-140)."""

    def test_pair_counts_exact_past_2pow24(self):
        import jax.numpy as jnp

        from squidpy_tpu.ops.nhood import cluster_pair_counts

        n, k = 1 << 21, 10  # 20.97M edges, all into bucket (0, 0)
        indices = jnp.zeros((n, k), jnp.int32)
        mask = jnp.ones((n, k), bool)
        labels = jnp.zeros((n,), jnp.int32)
        got = np.asarray(cluster_pair_counts(indices, mask, labels, 2))
        assert got.dtype == np.int32
        assert int(got[0, 0]) == n * k  # > 2^24: f32 would have saturated at 16777216
        assert int(got.sum()) == n * k

    def test_chunked_path_matches_naive_bincount(self):
        import jax.numpy as jnp

        from squidpy_tpu.ops.nhood import cluster_pair_counts

        rng = np.random.default_rng(5)
        n, k, n_cls = 1 << 20, 9, 3  # 9.4M edges -> chunked path, mixed labels
        indices = rng.integers(0, n, size=(n, k), dtype=np.int32)
        mask = rng.random((n, k)) < 0.9
        labels = rng.integers(0, n_cls, size=n, dtype=np.int32)
        got = np.asarray(cluster_pair_counts(jnp.asarray(indices), jnp.asarray(mask), jnp.asarray(labels), n_cls))
        pair_ids = labels[:, None] * n_cls + labels[indices]
        want = np.bincount(pair_ids[mask].ravel(), minlength=n_cls * n_cls).reshape(n_cls, n_cls)
        np.testing.assert_array_equal(got.astype(np.int64), want)


class TestColumnLayoutKernels:
    """The column-layout permutation pipeline (perm axis minor): shuffle
    generation as payload-carrying sorts and counting as shared-index row
    gathers + batched one-hot contractions (ops/nhood.py, _core/rng.py)."""

    def test_cols_kernel_matches_naive(self):
        import jax.numpy as jnp

        from squidpy_tpu.ops.nhood import permuted_pair_counts_cols

        rng = np.random.default_rng(3)
        n, k, n_cls, n_perms = 300, 5, 4, 7
        indices = rng.integers(0, n, size=(n, k), dtype=np.int32)
        mask = rng.random((n, k)) < 0.8
        cols = rng.integers(0, n_cls, size=(n, n_perms), dtype=np.int32)
        got = np.asarray(
            permuted_pair_counts_cols(jnp.asarray(indices), jnp.asarray(mask), jnp.asarray(cols), n_cls)
        )
        assert got.shape == (n_perms, n_cls, n_cls)
        for p in range(n_perms):
            lab = cols[:, p]
            pair_ids = lab[:, None] * n_cls + lab[indices]
            want = np.bincount(pair_ids[mask].ravel(), minlength=n_cls * n_cls).reshape(n_cls, n_cls)
            np.testing.assert_array_equal(got[p].astype(np.int64), want)

    def test_cols_kernel_column_chunking_invariant(self):
        import jax.numpy as jnp

        from squidpy_tpu.ops.nhood import permuted_pair_counts_cols

        rng = np.random.default_rng(4)
        n, k, n_cls, n_perms = 200, 4, 3, 11
        indices = jnp.asarray(rng.integers(0, n, size=(n, k), dtype=np.int32))
        mask = jnp.ones((n, k), bool)
        cols = jnp.asarray(rng.integers(0, n_cls, size=(n, n_perms), dtype=np.int32))
        whole = np.asarray(permuted_pair_counts_cols(indices, mask, cols, n_cls))
        chunked = np.asarray(permuted_pair_counts_cols(indices, mask, cols, n_cls, chunk_size=4))
        np.testing.assert_array_equal(whole, chunked)  # tail chunk padded + sliced

    def test_cols_kernel_row_chunked_exact_past_2pow24(self):
        import jax.numpy as jnp

        from squidpy_tpu.ops.nhood import permuted_pair_counts_cols

        n, k = 1 << 21, 10  # 20.97M edges, all into bucket (0, 0)
        indices = jnp.zeros((n, k), jnp.int32)
        mask = jnp.ones((n, k), bool)
        cols = jnp.zeros((n, 2), jnp.int32)
        got = np.asarray(permuted_pair_counts_cols(indices, mask, cols, 2))
        assert got.dtype == np.int32
        assert (got[:, 0, 0] == n * k).all()  # f32 would have saturated at 2^24

    def test_permutation_columns_are_permutations(self):
        import jax.numpy as jnp

        from squidpy_tpu._core.rng import permutation_columns, spawn_keys

        values = jnp.asarray(np.arange(500, dtype=np.int32))
        keys = spawn_keys(0, 6)
        cols = np.asarray(permutation_columns(keys, values))
        assert cols.shape == (500, 6)
        for p in range(6):
            np.testing.assert_array_equal(np.sort(cols[:, p]), np.arange(500))
        assert not np.array_equal(cols[:, 0], cols[:, 1])  # independent draws

    def test_permutation_columns_chunk_invariant(self):
        """Column p depends only on keys[p] — the spawn_generators contract."""
        import jax.numpy as jnp

        from squidpy_tpu._core.rng import permutation_columns, spawn_keys

        values = jnp.asarray(np.arange(300, dtype=np.int32))
        keys = spawn_keys(7, 8)
        whole = np.asarray(permutation_columns(keys, values))
        first = np.asarray(permutation_columns(keys[:3], values))
        rest = np.asarray(permutation_columns(keys[3:], values))
        np.testing.assert_array_equal(whole, np.concatenate([first, rest], axis=1))

    def test_shuffle_group_columns_stratified(self):
        import jax.numpy as jnp

        from squidpy_tpu._core.rng import shuffle_group_columns, spawn_keys

        rng = np.random.default_rng(0)
        groups = rng.integers(0, 3, size=400)
        values = jnp.asarray(np.arange(400, dtype=np.int32))
        cols = np.asarray(shuffle_group_columns(spawn_keys(1, 5), values, groups))
        assert cols.shape == (400, 5)
        for p in range(5):
            for g in range(3):
                sel = groups == g
                # values only move within their group segment
                np.testing.assert_array_equal(np.sort(cols[sel, p]), np.sort(np.arange(400)[sel]))
            assert not np.array_equal(cols[:, p], np.arange(400))  # actually shuffled


class TestAnalyticNhood:
    """Closed-form permutation moments (join counts; ops/nhood.py
    analytic_pair_count_moments)."""

    @pytest.fixture()
    def graph_adata(self, dummy_adata):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6)
        return dummy_adata

    def test_moments_match_exhaustive_enumeration(self):
        """Exact mean/var over ALL 5040 label permutations of a 7-node graph."""
        from itertools import permutations

        import scipy.sparse as sp

        from squidpy_tpu.ops.nhood import analytic_pair_count_moments

        rng = np.random.default_rng(1)
        n, C = 7, 3
        A = sp.random(n, n, density=0.35, random_state=3,
                      data_rvs=lambda k: np.ones(k)).tocsr()
        A.setdiag(0)
        A.eliminate_zeros()
        labels = np.array([0, 0, 0, 1, 1, 2, 2])
        src, dst = A.nonzero()
        counts = []
        for perm in permutations(range(n)):
            lab = labels[list(perm)]
            cnt = np.zeros((C, C))
            np.add.at(cnt, (lab[src], lab[dst]), 1)
            counts.append(cnt)
        counts = np.asarray(counts)
        mean, var = analytic_pair_count_moments(A, np.bincount(labels, minlength=C))
        np.testing.assert_allclose(mean, counts.mean(0), atol=1e-10)
        np.testing.assert_allclose(var, counts.var(0), atol=1e-10)

    def test_analytic_z_matches_perm_z(self, graph_adata):
        """The analytic z is the infinite-permutation limit of the perm z."""
        res_a = sq.gr.nhood_enrichment(graph_adata, cluster_key="leiden",
                                       mode="analytic", copy=True)
        res_p = sq.gr.nhood_enrichment(graph_adata, cluster_key="leiden",
                                       n_perms=4000, seed=0, copy=True)
        ok = np.isfinite(res_p.zscore) & np.isfinite(res_a.zscore)
        assert ok.sum() >= 4
        # MC error of a z-score at 4000 perms is a few percent; allow generous slack
        np.testing.assert_allclose(res_a.zscore[ok], res_p.zscore[ok], atol=0.35)
        np.testing.assert_array_equal(res_a.counts, res_p.counts)

    def test_analytic_writes_same_uns_contract(self, graph_adata):
        sq.gr.nhood_enrichment(graph_adata, cluster_key="leiden", mode="analytic")
        data = graph_adata.uns["leiden_nhood_enrichment"]
        assert set(data.keys()) == {"zscore", "count"}

    def test_analytic_rejects_library_key(self, graph_adata):
        graph_adata.obs["lib"] = pd.Categorical(["a"] * graph_adata.n_obs)
        with pytest.raises(ValueError, match="mode='perm'"):
            sq.gr.nhood_enrichment(graph_adata, cluster_key="leiden",
                                   library_key="lib", mode="analytic")

    def test_invalid_mode(self, graph_adata):
        with pytest.raises(ValueError, match="one of"):
            sq.gr.nhood_enrichment(graph_adata, cluster_key="leiden", mode="bogus")


class TestDeviceBFS:
    """Batched multi-source hop distances (ops/bfs.py) behind group
    closeness at scale."""

    def test_matches_scipy_dijkstra(self):
        from scipy import sparse as sp_
        from scipy.sparse.csgraph import dijkstra

        from squidpy_tpu.ops.bfs import _INF, hop_distances

        rng = np.random.default_rng(0)
        n, k = 300, 4
        nbrs = rng.integers(0, n, (n, k))
        rows = np.repeat(np.arange(n), k)
        adj = sp_.csr_matrix((np.ones(n * k), (rows, nbrs.ravel())), shape=(n, n))
        und = ((adj + adj.T) > 0).astype(np.float64).tocsr()
        seeds = np.zeros((n, 3), bool)
        seeds[:5, 0] = True
        seeds[100:104, 1] = True
        seeds[250, 2] = True
        got = hop_distances(und.indptr, und.indices, seeds)
        for c in range(3):
            want = dijkstra(und, directed=False, unweighted=True,
                            indices=np.flatnonzero(seeds[:, c]), min_only=True)
            finite = np.isfinite(want)
            np.testing.assert_array_equal(got[finite, c], want[finite].astype(np.int64))
            assert (got[~finite, c] >= _INF).all()

    def test_disconnected_unreachable_sentinel(self):
        from scipy import sparse as sp_

        from squidpy_tpu.ops.bfs import _INF, hop_distances

        # two disjoint edges: 0-1, 2-3
        adj = sp_.csr_matrix((np.ones(4), ([0, 1, 2, 3], [1, 0, 3, 2])), shape=(4, 4))
        seeds = np.zeros((4, 1), bool)
        seeds[0, 0] = True
        d = hop_distances(adj.indptr, adj.indices, seeds)[:, 0]
        assert list(d[:2]) == [0, 1]
        assert (d[2:] >= _INF).all()

    def test_closeness_from_hop_distances_matches_host(self):
        """Group closeness recomputed from the device BFS table equals the
        host dijkstra implementation (the op is exact, just not dispatched —
        see ops/bfs.py's measured trade-off note)."""
        from squidpy_tpu.gr import _nhood as nh
        from squidpy_tpu.ops.bfs import _INF, hop_distances

        rng = np.random.default_rng(1)
        n, k = 400, 4
        from scipy import sparse as sp_

        nbrs = rng.integers(0, n, (n, k))
        rows = np.repeat(np.arange(n), k)
        adj = sp_.csr_matrix((np.ones(n * k), (rows, nbrs.ravel())), shape=(n, n))
        und = ((adj + adj.T) > 0).astype(np.float64).tocsr()
        member = np.zeros((3, n), bool)
        member[0, :20] = True
        member[1, 50:90] = True
        member[2, 390:] = True

        host = nh._group_closeness_centrality(und, member)
        dist = hop_distances(und.indptr, und.indices, member.T)
        dev = np.zeros(3)
        for c, inside in enumerate(member):
            d = dist[~inside, c]
            total = float(d[d < _INF].sum())
            dev[c] = (len(d) / total) if total > 0 else 0.0
        np.testing.assert_allclose(dev, host, rtol=1e-12)
