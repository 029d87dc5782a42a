"""Native C++ CSR Louvain (VERDICT r3 #5): the scalable clustering backend
for calculate_niche, replacing networkx's pure-Python Louvain.

Quality oracle: networkx louvain_communities on small fixtures (ARI >= 0.9 —
both optimize the same modularity objective). Scale: 100k-row smoke on a
synthetic kNN graph in seconds, where networkx needs minutes-to-hours."""

from __future__ import annotations

import time

import numpy as np
import pytest
from scipy import sparse as sp
from sklearn.metrics import adjusted_rand_score

from squidpy_tpu.native import leiden_csr, louvain_csr


def _blob_knn_graph(rng, n, n_blobs, k=10, spread=0.4):
    # well-separated grid centers: the blob partition is unambiguous
    gx = int(np.ceil(np.sqrt(n_blobs)))
    centers = np.array([[10.0 * (i % gx), 10.0 * (i // gx)] for i in range(n_blobs)])
    which = rng.integers(0, n_blobs, size=n)
    pts = centers[which] + rng.normal(0, spread, size=(n, 2))
    from scipy.spatial import cKDTree

    _, idx = cKDTree(pts).query(pts, k=k + 1)
    idx = idx[:, 1:]
    rows = np.repeat(np.arange(n), k)
    adj = sp.csr_matrix((np.ones(n * k), (rows, idx.ravel())), shape=(n, n))
    adj = adj.maximum(adj.T)
    return adj, which


class TestLouvainNative:
    def test_planted_partition_exact(self):
        import networkx as nx

        g = nx.planted_partition_graph(4, 50, 0.9, 0.01, seed=1)
        adj = nx.to_scipy_sparse_array(g, format="csr").astype(float)
        labels, k = louvain_csr(adj, seed=0)
        truth = np.repeat(np.arange(4), 50)
        assert adjusted_rand_score(truth, labels) == 1.0
        assert k == 4

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_ari_vs_networkx_oracle(self, seed):
        """Planted partitions with a clear signal: both Louvains recover the
        same communities (ARI >= 0.9, the VERDICT's quality bar). On kNN blob
        graphs Louvain legitimately splits blobs (raises modularity), so
        label-level agreement is only meaningful where the optimum is stable;
        the modularity test below covers the ambiguous regime."""
        import networkx as nx

        g = nx.planted_partition_graph(5, 60, 0.6, 0.02, seed=seed)
        adj = nx.to_scipy_sparse_array(g, format="csr").astype(float)
        labels, _ = louvain_csr(adj, seed=seed)
        comms = nx.community.louvain_communities(g, seed=seed)
        nx_labels = np.empty(300, dtype=np.int64)
        for i, c in enumerate(comms):
            for node in c:
                nx_labels[node] = i
        assert adjusted_rand_score(labels, nx_labels) >= 0.9

    @pytest.mark.parametrize("seed", [0, 1])
    def test_modularity_matches_networkx(self, seed):
        """On ambiguous graphs the partitions drift, but the native optimizer
        must reach at least networkx's modularity (same objective)."""
        import networkx as nx

        rng = np.random.default_rng(seed + 10)
        centers = rng.uniform(0, 20, size=(6, 2))
        which = rng.integers(0, 6, size=800)
        pts = centers[which] + rng.normal(0, 0.4, size=(800, 2))
        from scipy.spatial import cKDTree

        _, idx = cKDTree(pts).query(pts, k=11)
        rows = np.repeat(np.arange(800), 10)
        adj = sp.csr_matrix((np.ones(8000), (rows, idx[:, 1:].ravel())), shape=(800, 800))
        adj = adj.maximum(adj.T)
        g = nx.from_scipy_sparse_array(adj)
        labels, k = louvain_csr(adj, seed=seed)
        native_comms = [set(np.flatnonzero(labels == c)) for c in range(k)]
        q_native = nx.community.modularity(g, native_comms)
        q_nx = nx.community.modularity(g, nx.community.louvain_communities(g, seed=seed))
        assert q_native >= q_nx - 0.02

    def test_deterministic_per_seed(self):
        rng = np.random.default_rng(3)
        adj, _ = _blob_knn_graph(rng, 500, 5)
        a, _ = louvain_csr(adj, seed=7)
        b, _ = louvain_csr(adj, seed=7)
        np.testing.assert_array_equal(a, b)

    def test_resolution_monotone(self):
        """Higher resolution → at least as many communities."""
        rng = np.random.default_rng(4)
        adj, _ = _blob_knn_graph(rng, 600, 4, spread=1.0)
        _, k_low = louvain_csr(adj, resolution=0.3, seed=0)
        _, k_high = louvain_csr(adj, resolution=3.0, seed=0)
        assert k_high >= k_low

    def test_weighted_edges_respected(self):
        # two triangles joined by a light bridge split; a heavy bridge merges
        rows = [0, 1, 0, 2, 1, 2, 3, 4, 3, 5, 4, 5, 2, 3]
        cols = [1, 0, 2, 0, 2, 1, 4, 3, 5, 3, 5, 4, 3, 2]
        light = sp.csr_matrix((np.r_[np.ones(12), 0.01, 0.01], (rows, cols)), shape=(6, 6))
        labels, k = louvain_csr(light, seed=0)
        assert k == 2 and labels[0] == labels[2] and labels[3] == labels[5]
        assert labels[0] != labels[3]

    def test_singletons_and_empty(self):
        adj = sp.csr_matrix((5, 5))
        labels, k = louvain_csr(adj, seed=0)
        assert len(labels) == 5 and k >= 1

    def test_100k_scale_smoke(self):
        """networkx needs minutes-to-hours here; the native path is seconds.
        Quality bar: no community spans two (far-apart) blobs, and the
        partition's modularity is high."""
        rng = np.random.default_rng(5)
        adj, which = _blob_knn_graph(rng, 100_000, 20, k=8, spread=0.15)
        t0 = time.perf_counter()
        labels, k = louvain_csr(adj, seed=0)
        dt = time.perf_counter() - t0
        assert dt < 60, f"native louvain took {dt:.1f}s at 100k"
        # each community must live inside one blob (blobs are 10 units apart)
        for c in range(k):
            assert len(np.unique(which[labels == c])) == 1
        assert 20 <= k <= 2000


def _assert_communities_connected(adj: sp.csr_matrix, labels: np.ndarray) -> None:
    """BFS per community on the adjacency restricted to its members."""
    adj = sp.csr_matrix(adj)
    for c in np.unique(labels):
        members = np.flatnonzero(labels == c)
        if len(members) <= 1:
            continue
        sub = adj[members][:, members]
        n_comp, _ = sp.csgraph.connected_components(sub, directed=False)
        assert n_comp == 1, f"community {c} has {n_comp} components"


def _modularity(adj: sp.csr_matrix, labels: np.ndarray, resolution: float = 1.0) -> float:
    adj = sp.csr_matrix(adj)
    m2 = adj.sum()
    k = np.asarray(adj.sum(axis=1)).ravel()
    q = 0.0
    for c in np.unique(labels):
        members = np.flatnonzero(labels == c)
        e_c = adj[members][:, members].sum()
        tot = k[members].sum()
        q += e_c / m2 - resolution * (tot / m2) ** 2
    return q


class TestLeidenNative:
    """Leiden = Louvain + refinement (VERDICT r4 #3): connected communities,
    modularity >= Louvain, leidenalg-equivalent semantics for niche flavors."""

    def test_planted_partition_exact(self):
        import networkx as nx

        g = nx.planted_partition_graph(4, 50, 0.9, 0.01, seed=1)
        adj = nx.to_scipy_sparse_array(g, format="csr").astype(float)
        labels, k = leiden_csr(adj, seed=0)
        truth = np.repeat(np.arange(4), 50)
        assert adjusted_rand_score(truth, labels) == 1.0
        assert k == 4

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_communities_connected(self, seed):
        """The Leiden guarantee Louvain lacks: no internally disconnected
        communities, asserted via BFS on every fixture."""
        rng = np.random.default_rng(seed)
        adj, _ = _blob_knn_graph(rng, 2000, 7, k=8, spread=1.5)
        labels, k = leiden_csr(adj, seed=seed)
        assert k >= 1
        _assert_communities_connected(adj, labels)

    def test_communities_connected_adversarial(self):
        """Sparse noisy graph (weak structure) — the regime where plain
        Louvain emits disconnected communities."""
        rng = np.random.default_rng(9)
        n = 3000
        rows = rng.integers(0, n, size=4 * n)
        cols = rng.integers(0, n, size=4 * n)
        keep = rows != cols
        adj = sp.csr_matrix((np.ones(keep.sum()), (rows[keep], cols[keep])), shape=(n, n))
        adj = adj.maximum(adj.T)
        for res in (0.5, 1.0, 2.0):
            labels, _ = leiden_csr(adj, resolution=res, seed=0)
            _assert_communities_connected(adj, labels)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_modularity_at_least_louvain(self, seed):
        """Refinement must not lose quality: Leiden's modularity >= the
        in-repo Louvain's on every fixture (the VERDICT's done bar)."""
        rng = np.random.default_rng(seed + 20)
        adj, _ = _blob_knn_graph(rng, 1500, 6, k=10, spread=1.2)
        lab_leiden, _ = leiden_csr(adj, seed=seed)
        lab_louvain, _ = louvain_csr(adj, seed=seed)
        q_leiden = _modularity(adj, lab_leiden)
        q_louvain = _modularity(adj, lab_louvain)
        assert q_leiden >= q_louvain - 1e-9, (q_leiden, q_louvain)

    def test_modularity_vs_networkx(self, ):
        import networkx as nx

        rng = np.random.default_rng(31)
        adj, _ = _blob_knn_graph(rng, 800, 6, k=10, spread=1.0)
        g = nx.from_scipy_sparse_array(adj)
        labels, k = leiden_csr(adj, seed=0)
        native_comms = [set(np.flatnonzero(labels == c)) for c in range(k)]
        q_native = nx.community.modularity(g, native_comms)
        q_nx = nx.community.modularity(g, nx.community.louvain_communities(g, seed=0))
        assert q_native >= q_nx - 0.02

    def test_deterministic_per_seed(self):
        rng = np.random.default_rng(3)
        adj, _ = _blob_knn_graph(rng, 500, 5)
        a, _ = leiden_csr(adj, seed=7)
        b, _ = leiden_csr(adj, seed=7)
        np.testing.assert_array_equal(a, b)

    def test_resolution_monotone(self):
        rng = np.random.default_rng(4)
        adj, _ = _blob_knn_graph(rng, 600, 4, spread=1.0)
        _, k_low = leiden_csr(adj, resolution=0.3, seed=0)
        _, k_high = leiden_csr(adj, resolution=3.0, seed=0)
        assert k_high >= k_low

    def test_weighted_edges_respected(self):
        rows = [0, 1, 0, 2, 1, 2, 3, 4, 3, 5, 4, 5, 2, 3]
        cols = [1, 0, 2, 0, 2, 1, 4, 3, 5, 3, 5, 4, 3, 2]
        light = sp.csr_matrix((np.r_[np.ones(12), 0.01, 0.01], (rows, cols)), shape=(6, 6))
        labels, k = leiden_csr(light, seed=0)
        assert k == 2 and labels[0] == labels[2] and labels[3] == labels[5]
        assert labels[0] != labels[3]

    def test_singletons_and_empty(self):
        adj = sp.csr_matrix((5, 5))
        labels, k = leiden_csr(adj, seed=0)
        assert len(labels) == 5 and k == 5  # disconnected nodes stay apart

    def test_100k_scale_within_2x_louvain(self):
        """The VERDICT's runtime bar: Leiden within 2x Louvain at scale."""
        rng = np.random.default_rng(5)
        adj, which = _blob_knn_graph(rng, 100_000, 20, k=8, spread=0.15)
        t0 = time.perf_counter()
        _, _ = louvain_csr(adj, seed=0)
        dt_louvain = time.perf_counter() - t0
        t0 = time.perf_counter()
        labels, k = leiden_csr(adj, seed=0)
        dt_leiden = time.perf_counter() - t0
        assert dt_leiden < max(2.0 * dt_louvain, 10.0), (dt_leiden, dt_louvain)
        for c in range(k):
            assert len(np.unique(which[labels == c])) == 1
        _assert_communities_connected(adj, labels)


class TestGraphClusterBackend:
    def test_labels_largest_first(self):
        from squidpy_tpu.models.clustering import graph_cluster

        rng = np.random.default_rng(0)
        big = rng.normal(0, 0.05, size=(150, 2))
        small = rng.normal(0, 0.05, size=(40, 2)) + 10.0
        X = np.concatenate([big, small])
        labels = graph_cluster(X, n_neighbors=10, random_state=0)
        # no community spans both blobs; '0' is the largest community
        assert not (set(labels[:150]) & set(labels[150:]))
        sizes = {lab: (labels == lab).sum() for lab in set(labels)}
        assert sizes["0"] == max(sizes.values())
