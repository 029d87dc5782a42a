"""Core container tests: AnnData-lite, h5ad round-trip, SpatialGraph ELL."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from scipy import sparse as sp

import squidpy_tpu as sq
from squidpy_tpu._core.graph import SpatialGraph


class TestAnnData:
    def test_construction_and_shapes(self):
        X = np.arange(12).reshape(4, 3).astype(float)
        adata = sq.AnnData(X=X, obs={"grp": ["a", "b", "a", "b"]})
        assert adata.shape == (4, 3)
        assert adata.n_obs == 4 and adata.n_vars == 3
        assert list(adata.obs["grp"]) == ["a", "b", "a", "b"]

    def test_slicing_by_names_and_masks(self):
        X = np.arange(12).reshape(4, 3).astype(float)
        adata = sq.AnnData(X=X, var=pd.DataFrame(index=["g1", "g2", "g3"]))
        adata.obsm["spatial"] = np.arange(8).reshape(4, 2)
        adata.obsp["conn"] = sp.eye(4, format="csr")
        sub = adata[:, ["g1", "g3"]]
        assert sub.shape == (4, 2)
        np.testing.assert_array_equal(sub.X, X[:, [0, 2]])
        sub2 = adata[np.array([True, False, True, False])]
        assert sub2.shape == (2, 3)
        assert sub2.obsm["spatial"].shape == (2, 2)
        assert sub2.obsp["conn"].shape == (2, 2)

    def test_reads_reference_h5ad(self, adata_ref):
        assert adata_ref.shape == (49, 1999)
        assert "leiden" in adata_ref.obs
        assert isinstance(adata_ref.obs["leiden"].dtype, pd.CategoricalDtype)
        assert "spatial" in adata_ref.obsm
        assert sp.issparse(adata_ref.X)
        assert "highly_variable" in adata_ref.var

    def test_h5ad_roundtrip(self, tmp_path, dummy_adata):
        dummy_adata.obsp["spatial_connectivities"] = sp.random(200, 200, density=0.02, format="csr")
        dummy_adata.uns["params"] = {"a": 1, "b": "text", "nested": {"c": 2.5}}
        path = str(tmp_path / "roundtrip.h5ad")
        dummy_adata.write_h5ad(path)
        back = sq.read_h5ad(path)
        assert back.shape == dummy_adata.shape
        np.testing.assert_allclose(np.asarray(back.X), np.asarray(dummy_adata.X))
        assert isinstance(back.obs["leiden"].dtype, pd.CategoricalDtype)
        assert list(back.obs["leiden"]) == list(dummy_adata.obs["leiden"])
        np.testing.assert_allclose(back.obsm["spatial"], dummy_adata.obsm["spatial"])
        assert (back.obsp["spatial_connectivities"] != dummy_adata.obsp["spatial_connectivities"]).nnz == 0
        assert back.uns["params"]["b"] == "text"
        assert back.uns["params"]["nested"]["c"] == 2.5

    def test_concat(self):
        a = sq.AnnData(X=np.ones((2, 3)), var=pd.DataFrame(index=["x", "y", "z"]))
        b = sq.AnnData(X=np.zeros((3, 3)), var=pd.DataFrame(index=["x", "y", "z"]))
        out = sq.concat([a, b], label="batch", keys=["s0", "s1"])
        assert out.shape == (5, 3)
        assert list(out.obs["batch"].cat.categories) == ["s0", "s1"]


class TestSpatialGraph:
    def test_csr_ell_roundtrip(self):
        rng = np.random.default_rng(0)
        adj = sp.random(50, 50, density=0.1, format="csr", random_state=0)
        adj.setdiag(0)
        adj.eliminate_zeros()
        g = SpatialGraph.from_csr(adj)
        back, _ = g.to_csr()
        assert (back != adj).nnz == 0

    def test_spmv_matches_scipy(self):
        adj = sp.random(64, 64, density=0.15, format="csr", random_state=1)
        g = SpatialGraph.from_csr(adj)
        x = np.random.default_rng(2).normal(size=(64, 7))
        got = np.asarray(g.spmv(x.astype(np.float64)))
        want = adj @ x
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)

    def test_row_normalize(self):
        adj = sp.random(32, 32, density=0.2, format="csr", random_state=3)
        g = SpatialGraph.from_csr(adj).row_normalize()
        sums = np.asarray(g.weights.sum(axis=1))
        nz = np.asarray(adj.sum(axis=1)).ravel() > 0
        np.testing.assert_allclose(sums[nz], 1.0, rtol=1e-6)

    def test_distances_alignment(self):
        n = 20
        adj = sp.random(n, n, density=0.2, format="csr", random_state=4)
        dst = adj.copy()
        dst.data = dst.data * 3.0
        g = SpatialGraph.from_csr(adj, dst)
        _, dback = g.to_csr()
        np.testing.assert_allclose(dback.toarray(), dst.toarray(), rtol=1e-6)


class TestRng:
    def test_spawn_keys_deterministic(self):
        from squidpy_tpu._core.rng import spawn_keys

        k1 = spawn_keys(42, 10)
        k2 = spawn_keys(42, 10)
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
        k3 = spawn_keys(43, 10)
        assert not np.array_equal(np.asarray(k1), np.asarray(k3))

    def test_permutation_batch_is_permutation(self):
        import jax.numpy as jnp

        from squidpy_tpu._core.rng import permutation_batch, spawn_keys

        vals = jnp.arange(100)
        perms = np.asarray(permutation_batch(spawn_keys(0, 5), vals))
        for row in perms:
            np.testing.assert_array_equal(np.sort(row), np.arange(100))
        assert not np.array_equal(perms[0], perms[1])

    def test_shuffle_group_batch_stays_within_groups(self):
        import jax.numpy as jnp

        from squidpy_tpu._core.rng import shuffle_group_batch, spawn_keys

        groups = np.repeat([0, 1, 2], [30, 40, 30])
        vals = jnp.asarray(np.arange(100))
        out = np.asarray(shuffle_group_batch(spawn_keys(1, 4), vals, groups))
        for row in out:
            # within-group multiset preserved
            np.testing.assert_array_equal(np.sort(row[:30]), np.arange(0, 30))
            np.testing.assert_array_equal(np.sort(row[30:70]), np.arange(30, 70))
            np.testing.assert_array_equal(np.sort(row[70:]), np.arange(70, 100))
        assert not np.array_equal(out[0], out[1])


class TestFullPipelineRoundtrip:
    def test_analyzed_adata_h5ad_roundtrip(self, adata_ref, tmp_path):
        """A fully analyzed AnnData (incl. device-graph cache in uns) must
        write to h5ad and read back with all result keys intact."""
        import squidpy_tpu as sq

        adata = adata_ref.copy()
        sq.gr.spatial_neighbors_knn(adata, n_neighs=6)
        sq.gr.nhood_enrichment(adata, "leiden", n_perms=10, seed=0)
        sq.gr.interaction_matrix(adata, "leiden")
        sq.gr.spatial_autocorr(adata, mode="moran")
        # the ELL cache must exist (graph_from_adata wired in) but not persist
        assert any(k.startswith("__squidpy_tpu_ell__") for k in adata.uns)
        path = str(tmp_path / "analyzed.h5ad")
        adata.write_h5ad(path)
        back = sq.read_h5ad(path)
        assert not any(k.startswith("__squidpy_tpu") for k in back.uns)
        np.testing.assert_allclose(
            np.asarray(back.uns["leiden_nhood_enrichment"]["zscore"]),
            np.asarray(adata.uns["leiden_nhood_enrichment"]["zscore"]),
        )
        assert back.uns["moranI"].shape == adata.uns["moranI"].shape
        # re-running a statistic on the reloaded object works
        sq.gr.interaction_matrix(back, "leiden")


class TestShuffleGroupPrecision:
    def test_large_group_ids_float32(self):
        """The stratified shuffle must stay uniform for large group ids even
        with x64 disabled (float32 composite keys would quantize the
        randomness away; the lexsort formulation must not)."""
        import jax
        import jax.numpy as jnp

        from squidpy_tpu._core.rng import shuffle_group_batch, spawn_keys

        jax.config.update("jax_enable_x64", False)
        try:
            n = 4000
            # two groups with huge ids; each group has 2000 members
            groups = np.repeat([2**21, 2**21 + 1], n // 2)
            vals = jnp.asarray(np.arange(n, dtype=np.int32))
            out = np.asarray(shuffle_group_batch(spawn_keys(0, 3), vals, groups))
            for row in out:
                np.testing.assert_array_equal(np.sort(row[: n // 2]), np.arange(n // 2))
                np.testing.assert_array_equal(np.sort(row[n // 2 :]), np.arange(n // 2, n))
                # genuinely shuffled: few fixed points (identity would have all)
                assert (row == np.arange(n)).mean() < 0.01
            assert not np.array_equal(out[0], out[1])
        finally:
            jax.config.update("jax_enable_x64", True)


class TestGraphCacheInvalidation:
    def test_rebuilt_graph_with_same_nnz_invalidates(self, dummy_adata):
        """Rebuilding the graph with identical sparsity (kNN nnz == n*k) must
        not serve the stale cached device graph."""
        import squidpy_tpu as sq
        from squidpy_tpu._core.graph import graph_from_adata

        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=5)
        g1 = graph_from_adata(dummy_adata, "spatial_connectivities")
        # move the points, rebuild: same n, same nnz, different edges
        dummy_adata.obsm["spatial"] = dummy_adata.obsm["spatial"][::-1].copy()
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=5)
        g2 = graph_from_adata(dummy_adata, "spatial_connectivities")
        assert not np.array_equal(np.asarray(g1.indices), np.asarray(g2.indices))

    def test_distances_request_not_served_from_distanceless_cache(self, dummy_adata):
        import squidpy_tpu as sq
        from squidpy_tpu._core.graph import graph_from_adata

        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=5)
        g1 = graph_from_adata(dummy_adata, "spatial_connectivities")
        assert g1.distances is None
        g2 = graph_from_adata(dummy_adata, "spatial_connectivities", "spatial_distances")
        assert g2.distances is not None


class TestReviewRegressions:
    def test_radius_neighbors_large_offset_coords(self):
        """Counts and emitted neighbors must come from the same distance
        formulation (expansion-form drift on large offsets crashed CSR
        assembly)."""
        from squidpy_tpu.ops.knn import radius_neighbors

        rng = np.random.default_rng(0)
        coords = rng.random((60, 2)) * 10 + 30000
        indptr, indices, dists = radius_neighbors(coords.astype(np.float32), 3.0)
        assert indptr[-1] == len(indices) == len(dists)
        # symmetric by construction of the metric
        from scipy.sparse import csr_matrix

        adj = csr_matrix((np.ones(len(indices)), indices, indptr), shape=(60, 60))
        assert (adj != adj.T).nnz == 0

    def test_ripley_unused_category(self, dummy_adata):
        import pandas as pd

        import squidpy_tpu as sq

        dummy_adata.obs["cl"] = pd.Categorical(
            ["a"] * 100 + ["b"] * 100, categories=["a", "b", "unused"]
        )
        res = sq.gr.ripley(dummy_adata, "cl", mode="G", n_simulations=2,
                           n_observations=50, n_steps=10, seed=0, copy=True)
        assert res["pvalues"].shape[0] == 2  # only present categories

    def test_concat_outer_join(self):
        a = sq.AnnData(X=np.ones((2, 2)), var=pd.DataFrame(index=["g1", "g2"]))
        b = sq.AnnData(X=2 * np.ones((2, 2)), var=pd.DataFrame(index=["g2", "g3"]))
        out = sq.concat([a, b], join="outer")
        assert out.shape == (4, 3)
        X = np.asarray(out.X)
        names = list(out.var_names)
        assert X[0, names.index("g3")] == 0  # zero-filled
        assert X[2, names.index("g1")] == 0
        assert X[2, names.index("g2")] == 2

    def test_points_in_polygon_ring_list_same_length(self):
        from squidpy_tpu.gr._build import points_in_polygon

        ring1 = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
        ring2 = np.array([[10, 10], [14, 10], [14, 14], [10, 14], [10, 10]], float)
        pts = np.array([[2, 2], [12, 12], [7, 7]], float)
        got = points_in_polygon(pts, [ring1, ring2])
        np.testing.assert_array_equal(got, [True, True, False])

    def test_points_in_polygon_unclosed_ring(self):
        from squidpy_tpu.gr._build import points_in_polygon

        open_ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)  # not closed
        pts = np.array([[2, 2], [5, 5]], float)
        np.testing.assert_array_equal(points_in_polygon(pts, open_ring), [True, False])

    def test_histogram_batch_drops_out_of_range(self):
        from squidpy_tpu.ops.features import histogram_features_batch

        crops = np.array([[[[0.1], [0.4]], [[0.8], [0.2]]]], dtype=np.float32)  # (1,2,2,1)
        hist = histogram_features_batch(crops, bins=4, v_range=(0.0, 0.5))
        # 0.8 is outside the range -> dropped, not clipped into the last bin
        assert hist.sum() == 3
        want, _ = np.histogram(crops[0, ..., 0], bins=4, range=(0.0, 0.5))
        np.testing.assert_array_equal(hist[0, 0], want)

    def test_graycomatrix_rejects_out_of_range_levels(self):
        from squidpy_tpu.ops.features import graycomatrix

        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        with pytest.raises(ValueError, match="levels"):
            graycomatrix(img, [1], [0.0], levels=16)


class TestKeyConventions:
    """Key-naming contract (reference tests/graph/test_utils.py:38-72):
    defaults, custom prefixes, idempotence, no partial-suffix matching."""

    def test_defaults(self):
        from squidpy_tpu._constants._pkg_constants import Key

        assert Key.obsp.spatial_conn() == "spatial_connectivities"
        assert Key.obsp.spatial_dist() == "spatial_distances"

    def test_custom_prefix(self):
        from squidpy_tpu._constants._pkg_constants import Key

        assert Key.obsp.spatial_conn("mykey") == "mykey_connectivities"
        assert Key.obsp.spatial_dist("mykey") == "mykey_distances"

    def test_idempotent(self):
        from squidpy_tpu._constants._pkg_constants import Key

        once = Key.obsp.spatial_conn("custom")
        assert Key.obsp.spatial_conn(once) == once == "custom_connectivities"
        onced = Key.obsp.spatial_dist("custom")
        assert Key.obsp.spatial_dist(onced) == onced == "custom_distances"

    def test_already_suffixed_and_partial(self):
        from squidpy_tpu._constants._pkg_constants import Key

        assert Key.obsp.spatial_conn("foo_connectivities") == "foo_connectivities"
        assert Key.obsp.spatial_dist("foo_distances") == "foo_distances"
        assert Key.obsp.spatial_conn("my_conn") == "my_conn_connectivities"
        assert Key.obsp.spatial_dist("my_dist") == "my_dist_distances"


def test_analysis_results_h5ad_roundtrip(tmp_path):
    """The container IS the checkpoint (reference contract): every analysis
    result written under deterministic uns keys must survive h5ad write/read,
    and internal device-graph cache entries must not be serialized."""
    from squidpy_tpu._core.io_h5ad import read_h5ad, write_h5ad

    rng = np.random.default_rng(0)
    n = 150
    ad = sq.AnnData(X=rng.random((n, 8)), var=pd.DataFrame(index=[f"g{i}" for i in range(8)]),
                    obsm={"spatial": rng.random((n, 2)) * 50})
    ad.obs["cl"] = pd.Categorical(rng.choice(list("ab"), n))
    sq.gr.spatial_neighbors_knn(ad, n_neighs=4)
    sq.gr.nhood_enrichment(ad, "cl", n_perms=10, seed=0)
    sq.gr.spatial_autocorr(ad, mode="moran")
    sq.gr.co_occurrence(ad, "cl")
    assert any(k.startswith("__squidpy_tpu") for k in ad.uns)  # cache present in memory

    p = str(tmp_path / "ckpt.h5ad")
    write_h5ad(p, ad)
    back = read_h5ad(p)
    assert not any(k.startswith("__squidpy_tpu") for k in back.uns)  # not serialized
    np.testing.assert_allclose(
        back.uns["cl_nhood_enrichment"]["zscore"], ad.uns["cl_nhood_enrichment"]["zscore"], equal_nan=True
    )
    pd.testing.assert_frame_equal(back.uns["moranI"], ad.uns["moranI"])
    np.testing.assert_allclose(
        back.uns["cl_co_occurrence"]["occ"], ad.uns["cl_co_occurrence"]["occ"], equal_nan=True
    )
    assert (back.obsp["spatial_connectivities"] != ad.obsp["spatial_connectivities"]).nnz == 0


class TestDeprecationHelpers:
    def test_deprecated_params_warns_and_drops(self):
        from squidpy_tpu.utils import deprecated_params

        @deprecated_params({"old_kw": "1.0"})
        def fn(a, **kwargs):
            assert "old_kw" not in kwargs
            return a

        with pytest.warns(FutureWarning, match="old_kw.*deprecated"):
            assert fn(3, old_kw=1) == 3

    def test_deprecated_warns_every_call(self):
        from squidpy_tpu.utils import deprecated

        @deprecated("use new_fn instead")
        def old_fn(x):
            return x + 1

        with pytest.warns(FutureWarning, match="old_fn.*use new_fn instead"):
            assert old_fn(1) == 2
        with pytest.warns(FutureWarning):
            old_fn(2)


class TestChunkedVmap:
    def test_matches_unchunked(self):
        import jax.numpy as jnp

        from squidpy_tpu.utils import chunked_vmap

        xs = jnp.arange(23.0).reshape(23, 1)
        out = chunked_vmap(lambda x: x * 2 + 1, xs, chunk_size=5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(xs) * 2 + 1)

    def test_single_chunk(self):
        import jax.numpy as jnp

        from squidpy_tpu.utils import chunked_vmap

        xs = jnp.ones((3, 2))
        out = chunked_vmap(lambda x: x.sum(), xs, chunk_size=100)
        assert out.shape == (3,)

    def test_chunk_size_invariance(self):
        import jax.numpy as jnp

        from squidpy_tpu.utils import chunked_vmap

        xs = jnp.arange(40.0).reshape(20, 2)
        a = chunked_vmap(lambda x: x @ x, xs, chunk_size=3)
        b = chunked_vmap(lambda x: x @ x, xs, chunk_size=20)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestToHost:
    def test_dtype_conversion(self):
        import jax.numpy as jnp

        from squidpy_tpu.utils import to_host

        x = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
        out = to_host(x, dtype=np.float64)
        assert isinstance(out, np.ndarray) and out.dtype == np.float64

    def test_passthrough_numpy(self):
        from squidpy_tpu.utils import to_host

        x = np.arange(4)
        assert to_host(x) is not None
        np.testing.assert_array_equal(to_host(x), x)


class TestKnnOps:
    def test_brute_force_matches_ckdtree(self):
        from scipy.spatial import cKDTree

        from squidpy_tpu.ops.knn import brute_force_knn

        rng = np.random.default_rng(0)
        coords = rng.uniform(0, 100, (500, 2)).astype(np.float32)
        dists, idx = brute_force_knn(coords, k=5)
        tree = cKDTree(coords)
        d_want, i_want = tree.query(coords, k=6)
        # distances agree (index ties can differ at equal distance)
        np.testing.assert_allclose(np.sort(dists, axis=1), np.sort(d_want[:, 1:], axis=1), atol=1e-3)

    def test_knn_excludes_self(self):
        from squidpy_tpu.ops.knn import brute_force_knn

        rng = np.random.default_rng(1)
        coords = rng.uniform(0, 10, (64, 2)).astype(np.float32)
        _, idx = brute_force_knn(coords, k=3)
        rows = np.arange(64)[:, None]
        assert not np.any(np.asarray(idx) == rows)

    def test_duplicate_points_no_self_loop(self):
        from squidpy_tpu.ops.knn import brute_force_knn

        coords = np.zeros((8, 2), np.float32)  # all identical
        dists, idx = brute_force_knn(coords, k=2)
        rows = np.arange(8)[:, None]
        assert not np.any(np.asarray(idx) == rows)
        np.testing.assert_allclose(np.asarray(dists), 0.0, atol=1e-5)


class TestObspSpatialKeyContract:
    """Key suffixing rules (reference: tests/graph/test_utils.py:36-67)."""

    def test_defaults(self):
        from squidpy_tpu._constants._pkg_constants import Key

        assert Key.obsp.spatial_conn() == "spatial_connectivities"
        assert Key.obsp.spatial_dist() == "spatial_distances"

    def test_custom_prefix(self):
        from squidpy_tpu._constants._pkg_constants import Key

        assert Key.obsp.spatial_conn("mykey") == "mykey_connectivities"
        assert Key.obsp.spatial_dist("mykey") == "mykey_distances"

    def test_idempotent_and_already_suffixed(self):
        from squidpy_tpu._constants._pkg_constants import Key

        once = Key.obsp.spatial_conn("custom")
        assert Key.obsp.spatial_conn(once) == once == "custom_connectivities"
        once = Key.obsp.spatial_dist("custom")
        assert Key.obsp.spatial_dist(once) == once == "custom_distances"
        assert Key.obsp.spatial_conn("foo_connectivities") == "foo_connectivities"
        assert Key.obsp.spatial_dist("foo_distances") == "foo_distances"

    def test_suffix_not_partial_match(self):
        from squidpy_tpu._constants._pkg_constants import Key

        assert Key.obsp.spatial_conn("my_conn") == "my_conn_connectivities"
        assert Key.obsp.spatial_dist("my_dist") == "my_dist_distances"
