"""Graph builder tests, modeled on the reference's test strategy
(/root/reference/tests/graph/test_spatial_neighbors.py): literal ground-truth
matrices, sklearn cross-checks, block-diagonal library structure."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import warnings
from scipy import sparse as sp
from sklearn.neighbors import NearestNeighbors

import squidpy_tpu as sq
from squidpy_tpu.ops.knn import brute_force_knn, radius_neighbors


class TestBruteForceKNN:
    @pytest.mark.parametrize("n,k", [(50, 4), (300, 6), (1000, 10)])
    def test_matches_sklearn(self, n, k):
        rng = np.random.default_rng(n)
        coords = rng.uniform(0, 100, size=(n, 2))
        d_got, i_got = brute_force_knn(coords, k)
        tree = NearestNeighbors(n_neighbors=k).fit(coords)
        d_want, i_want = tree.kneighbors()
        np.testing.assert_allclose(np.sort(d_got, axis=1), np.sort(d_want, axis=1), rtol=1e-4, atol=1e-4)
        # index sets identical (distance ties may reorder)
        assert (np.sort(i_got, axis=1) == np.sort(i_want, axis=1)).mean() > 0.999

    def test_3d(self):
        rng = np.random.default_rng(7)
        coords = rng.normal(size=(200, 3))
        d_got, i_got = brute_force_knn(coords, 5)
        tree = NearestNeighbors(n_neighbors=5).fit(coords)
        d_want, _ = tree.kneighbors()
        np.testing.assert_allclose(d_got, d_want, rtol=1e-4, atol=1e-5)

    def test_approx_sweep_matches_exact_on_cpu(self, monkeypatch):
        """On CPU backends approx_min_k lowers to exact selection, so the
        approximate feature-graph sweep must reproduce the exact result,
        including through its chunked dispatch path."""
        import squidpy_tpu.ops.knn as knn_mod
        from squidpy_tpu.ops.knn import brute_force_knn_approx

        rng = np.random.default_rng(21)
        coords = rng.normal(size=(2500, 16)).astype(np.float32)
        d_exact, i_exact = brute_force_knn(coords, 15)
        d_a, i_a = brute_force_knn_approx(coords, 15)
        np.testing.assert_array_equal(np.sort(i_a, axis=1), np.sort(i_exact, axis=1))
        monkeypatch.setattr(knn_mod, "_PAIRS_PER_DISPATCH", 2500 * 1024 * 2)
        d_c, i_c = brute_force_knn_approx(coords, 15)
        np.testing.assert_array_equal(np.sort(i_c, axis=1), np.sort(i_exact, axis=1))

    def test_chunked_dispatch_matches_monolithic(self, monkeypatch):
        """At scale, the sweep dispatches bounded row chunks (a single 1M
        device call crashes the remote worker); results must be identical."""
        import squidpy_tpu.ops.knn as knn_mod

        rng = np.random.default_rng(11)
        coords = rng.uniform(0, 50, size=(3000, 4))
        d_mono, i_mono = brute_force_knn(coords, 6)
        # force many small chunks: ≤ 2 row tiles of 1024 per dispatch
        monkeypatch.setattr(knn_mod, "_PAIRS_PER_DISPATCH", 3000 * 1024 * 2)
        d_chunk, i_chunk = brute_force_knn(coords, 6)
        np.testing.assert_array_equal(i_chunk, i_mono)
        np.testing.assert_allclose(d_chunk, d_mono, rtol=0, atol=0)


class TestRadiusNeighbors:
    def test_matches_sklearn(self):
        rng = np.random.default_rng(3)
        coords = rng.uniform(0, 50, size=(150, 2))
        r = 6.0
        indptr, indices, dists = radius_neighbors(coords, r)
        tree = NearestNeighbors(radius=r).fit(coords)
        d_want, i_want = tree.radius_neighbors()
        for i in range(len(coords)):
            got = set(indices[indptr[i] : indptr[i + 1]].tolist())
            want = set(i_want[i].tolist())
            assert got == want


class TestSpatialNeighbors:
    def test_knn_graph_structure(self, dummy_adata):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=5)
        adj = dummy_adata.obsp["spatial_connectivities"]
        dst = dummy_adata.obsp["spatial_distances"]
        assert adj.shape == (200, 200)
        np.testing.assert_array_equal(np.diff(adj.indptr), 5)
        assert dst.diagonal().sum() == 0
        assert dummy_adata.uns["spatial_neighbors"]["params"]["n_neighbors"] == 5

    def test_knn_matches_sklearn_graph(self, dummy_adata):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6)
        adj = dummy_adata.obsp["spatial_connectivities"]
        coords = dummy_adata.obsm["spatial"]
        tree = NearestNeighbors(n_neighbors=6).fit(coords)
        _, idx = tree.kneighbors()
        want = sp.csr_matrix(
            (np.ones(idx.size), (np.repeat(np.arange(200), 6), idx.ravel())), shape=(200, 200)
        )
        assert (adj != want).nnz == 0

    def test_radius_graph(self, dummy_adata):
        sq.gr.spatial_neighbors_radius(dummy_adata, radius=10.0)
        adj = dummy_adata.obsp["spatial_connectivities"]
        dst = dummy_adata.obsp["spatial_distances"]
        assert (adj != adj.T).nnz == 0  # symmetric
        assert dst.data.max() <= 10.0 + 1e-5

    def test_radius_interval(self, dummy_adata):
        sq.gr.spatial_neighbors_radius(dummy_adata, radius=(5.0, 10.0))
        dst = dummy_adata.obsp["spatial_distances"]
        d = dst.data[dst.data > 0]
        assert d.min() >= 5.0 - 1e-5 and d.max() <= 10.0 + 1e-5

    def test_delaunay_small_ground_truth(self):
        # a unit square + center point: center connects to all four corners
        coords = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [0.5, 0.5]])
        adata = sq.AnnData(X=np.zeros((5, 1)))
        adata.obsm["spatial"] = coords
        sq.gr.spatial_neighbors_delaunay(adata)
        adj = adata.obsp["spatial_connectivities"].toarray()
        assert (adj[4, :4] == 1).all()
        dst = adata.obsp["spatial_distances"].toarray()
        np.testing.assert_allclose(dst[4, :4], np.sqrt(0.5), rtol=1e-6)

    def test_grid_square_lattice(self, adata_squaregrid):
        sq.gr.spatial_neighbors_grid(adata_squaregrid, n_neighs=4)
        adj = adata_squaregrid.obsp["spatial_connectivities"]
        deg = np.asarray(adj.sum(axis=1)).ravel()
        # interior nodes have 4 neighbors; corners 2; edges 3
        assert deg.max() == 4
        assert deg.min() == 2
        assert (adj != adj.T).nnz == 0

    def test_grid_n_rings(self, adata_squaregrid):
        sq.gr.spatial_neighbors_grid(adata_squaregrid, n_neighs=4, n_rings=2)
        dst = adata_squaregrid.obsp["spatial_distances"]
        assert set(np.unique(dst.data)) == {1.0, 2.0}

    def test_set_diag(self, dummy_adata):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=4, set_diag=True)
        adj = dummy_adata.obsp["spatial_connectivities"]
        np.testing.assert_array_equal(adj.diagonal(), 1.0)

    def test_percentile(self, dummy_adata):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6, percentile=50.0)
        sparse_adj = dummy_adata.obsp["spatial_connectivities"]
        assert sparse_adj.nnz < 200 * 6

    def test_transform_spectral(self, dummy_adata):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=6, transform="spectral")
        adj = dummy_adata.obsp["spatial_connectivities"]
        assert adj.data.max() <= 1.0 + 1e-6
        assert dummy_adata.uns["spatial_neighbors"]["params"]["transform"] == "spectral"

    def test_library_key_block_structure(self, dummy_adata):
        dummy_adata.obs["library"] = pd.Categorical(["a"] * 100 + ["b"] * 100)
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=4, library_key="library")
        adj = dummy_adata.obsp["spatial_connectivities"]
        # no cross-library edges
        assert adj[:100, 100:].nnz == 0
        assert adj[100:, :100].nnz == 0

    def test_library_key_interleaved(self, dummy_adata):
        libs = np.array(["a", "b"] * 100)
        dummy_adata.obs["library"] = pd.Categorical(libs)
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=4, library_key="library")
        adj = dummy_adata.obsp["spatial_connectivities"].toarray()
        ia = np.where(libs == "a")[0]
        ib = np.where(libs == "b")[0]
        assert adj[np.ix_(ia, ib)].sum() == 0
        assert adj[np.ix_(ib, ia)].sum() == 0

    def test_copy_returns_result(self, dummy_adata):
        res = sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=4, copy=True)
        assert isinstance(res, sq.gr.SpatialNeighborsResult)
        assert res.connectivities.shape == (200, 200)
        assert "spatial_connectivities" not in dummy_adata.obsp

    def test_deprecated_facade(self, dummy_adata):
        with pytest.warns(FutureWarning):
            sq.gr.spatial_neighbors(dummy_adata, coord_type="generic", n_neighs=5)
        assert "spatial_connectivities" in dummy_adata.obsp

    def test_facade_grid_autodetect(self, adata_ref):
        adata = adata_ref.copy()
        with pytest.warns(FutureWarning):
            sq.gr.spatial_neighbors(adata)  # uns['spatial'] present -> grid
        assert adata.uns["spatial_neighbors"]["params"]["coord_type"] == "grid"


class TestMaskGraph:
    def test_mask_square(self, dummy_adata):
        sq.gr.spatial_neighbors_knn(dummy_adata, n_neighs=4)
        square = np.array([[0, 0], [50, 0], [50, 50], [0, 50], [0, 0]], dtype=float)
        adj, dst = sq.gr.mask_graph(dummy_adata, table_key=None, polygon_mask=square, copy=True)
        coords = dummy_adata.obsm["spatial"]
        coo = adj.tocoo()
        inside = (coords[:, 0] < 50) & (coords[:, 1] < 50)
        # every surviving edge has both endpoints inside the square
        assert inside[coo.row].all() and inside[coo.col].all()


class TestBuilderTransforms:
    """Transform postprocessors through the public from_builder path
    (reference gr/neighbors.py:456-535: spectral = D^-1/2 A D^-1/2 on the raw
    directed kNN graph, cosine similarity weights bounded by 1)."""

    def _adata(self):
        rng = np.random.default_rng(0)
        return sq.AnnData(X=np.ones((200, 1)), obsm={"spatial": rng.random((200, 2)) * 100})

    def test_spectral(self):
        from squidpy_tpu.gr.neighbors import KNNBuilder, symmetric_normalize_csr

        ad = self._adata()
        sq.gr.spatial_neighbors_from_builder(ad, KNNBuilder(n_neighs=8, transform="spectral"))
        w = ad.obsp["spatial_connectivities"]
        # equals the hand-computed bilateral scaling of the raw kNN graph
        ad2 = self._adata()
        sq.gr.spatial_neighbors_from_builder(ad2, KNNBuilder(n_neighs=8))
        want = symmetric_normalize_csr(ad2.obsp["spatial_connectivities"])
        assert (abs(w - want)).max() < 1e-12

    def test_cosine_bounded(self):
        from squidpy_tpu.gr.neighbors import KNNBuilder

        ad = self._adata()
        sq.gr.spatial_neighbors_from_builder(ad, KNNBuilder(n_neighs=8, transform="cosine"))
        assert (ad.obsp["spatial_connectivities"].data <= 1.0 + 1e-9).all()

    def test_radius_set_diag(self):
        from squidpy_tpu.gr.neighbors import RadiusBuilder

        ad = self._adata()
        sq.gr.spatial_neighbors_from_builder(ad, RadiusBuilder(radius=12.0, set_diag=True))
        assert (ad.obsp["spatial_connectivities"].diagonal() > 0).all()


class TestSpatialDataElementCentroids:
    """Coordinate resolution from SpatialData shapes/labels/points elements
    (reference ``_resolve_data``, /root/reference/src/squidpy/gr/_build.py:331-384)."""

    @staticmethod
    def _sdata(table, **elements):
        from types import SimpleNamespace

        return SimpleNamespace(tables={"table": table}, shapes=elements, labels={}, points={})

    def test_centroids_from_circles_element(self):
        rng = np.random.default_rng(0)
        n = 60
        centers = rng.uniform(0, 100, size=(n, 2))
        shapes = pd.DataFrame(
            {"x": centers[:, 0], "y": centers[:, 1], "radius": np.full(n, 2.0)},
            index=np.arange(n),
        )
        table = sq.AnnData(
            X=np.zeros((n, 3)),
            obs=pd.DataFrame({"region": ["cells"] * n, "instance_id": np.arange(n)}),
        )
        table.uns["spatialdata_attrs"] = {
            "region": "cells", "region_key": "region", "instance_key": "instance_id",
        }
        sdata = self._sdata(table, cells=shapes)

        sq.gr.spatial_neighbors_knn(sdata, n_neighs=4, elements_to_coordinate_systems={"cells": "global"})
        np.testing.assert_allclose(table.obsm["spatial"], centers)
        assert "spatial_connectivities" in table.obsp

        # graph equals the one built from the raw coordinates directly
        plain = sq.AnnData(X=np.zeros((n, 3)))
        plain.obsm["spatial"] = centers
        sq.gr.spatial_neighbors_knn(plain, n_neighs=4)
        assert (table.obsp["spatial_connectivities"] != plain.obsp["spatial_connectivities"]).nnz == 0

    def test_centroids_from_labels_element(self):
        # 3 square cells of known centroids in a label image; background = 0
        img = np.zeros((40, 40), dtype=np.int32)
        img[2:6, 2:6] = 1      # centroid (3.5, 3.5)
        img[10:20, 30:40] = 2  # centroid (34.5, 14.5) in (x, y)
        img[30:34, 10:18] = 3  # centroid (13.5, 31.5)
        table = sq.AnnData(
            X=np.zeros((3, 2)),
            obs=pd.DataFrame({"region": ["seg"] * 3, "instance_id": [1, 2, 3]}),
        )
        table.uns["spatialdata_attrs"] = {
            "region": "seg", "region_key": "region", "instance_key": "instance_id",
        }
        from types import SimpleNamespace

        sdata = SimpleNamespace(tables={"table": table}, shapes={}, labels={"seg": img}, points={})
        sq.gr.spatial_neighbors_knn(sdata, n_neighs=2, elements_to_coordinate_systems={"seg": "global"})
        np.testing.assert_allclose(
            table.obsm["spatial"], [[3.5, 3.5], [34.5, 14.5], [13.5, 31.5]]
        )

    def test_instance_order_respected(self):
        # table rows ordered differently from the element's index
        centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]])
        shapes = pd.DataFrame({"x": centers[:, 0], "y": centers[:, 1]}, index=[0, 1, 2, 3])
        order = [2, 0, 3, 1]
        table = sq.AnnData(
            X=np.zeros((4, 1)),
            obs=pd.DataFrame({"region": ["s"] * 4, "instance_id": order}),
        )
        table.uns["spatialdata_attrs"] = {
            "region": "s", "region_key": "region", "instance_key": "instance_id",
        }
        sdata = self._sdata(table, s=shapes)
        sq.gr.spatial_neighbors_knn(sdata, n_neighs=2, elements_to_coordinate_systems={"s": "global"})
        np.testing.assert_allclose(table.obsm["spatial"], centers[order])

    def test_two_regions_become_library_blocks(self):
        rng = np.random.default_rng(1)
        a = pd.DataFrame({"x": rng.uniform(0, 10, 30), "y": rng.uniform(0, 10, 30)})
        b = pd.DataFrame({"x": rng.uniform(100, 110, 30), "y": rng.uniform(0, 10, 30)})
        table = sq.AnnData(
            X=np.zeros((60, 1)),
            obs=pd.DataFrame({
                "region": ["a"] * 30 + ["b"] * 30,
                "instance_id": list(range(30)) * 2,
            }),
        )
        table.uns["spatialdata_attrs"] = {
            "region": ["a", "b"], "region_key": "region", "instance_key": "instance_id",
        }
        sdata = self._sdata(table, a=a, b=b)
        sq.gr.spatial_neighbors_knn(
            sdata, n_neighs=3, elements_to_coordinate_systems={"a": "global", "b": "global"}
        )
        adj = table.obsp["spatial_connectivities"].toarray()
        # region key becomes the library key: no cross-region edges
        assert adj[:30, 30:].sum() == 0
        assert adj[30:, :30].sum() == 0

    def test_missing_coordinate_system_raises(self):
        shapes = pd.DataFrame({"x": [0.0, 1.0], "y": [0.0, 1.0]})
        table = sq.AnnData(
            X=np.zeros((2, 1)),
            obs=pd.DataFrame({"region": ["s", "s"], "instance_id": [0, 1]}),
        )
        table.uns["spatialdata_attrs"] = {
            "region": "s", "region_key": "region", "instance_key": "instance_id",
        }
        sdata = self._sdata(table, s=shapes)
        with pytest.raises(ValueError, match="coordinate system"):
            sq.gr.spatial_neighbors_knn(sdata, n_neighs=1, elements_to_coordinate_systems={"other": "global"})


class TestFacadeWarnings:
    """Legacy facade kwarg-conflict warnings (reference:
    tests/graph/test_spatial_neighbors.py grid/delaunay/radius ignore cases)."""

    def test_grid_mode_ignores_radius(self, adata_squaregrid):
        with pytest.warns(FutureWarning, match="`radius` is ignored for grid"):
            with pytest.warns(FutureWarning, match="deprecated"):
                sq.gr.spatial_neighbors(adata_squaregrid, coord_type="grid",
                                        n_rings=1, radius=3.0)

    def test_delaunay_ignores_n_neighs_with_warning(self, dummy_adata):
        with pytest.warns(FutureWarning, match="`n_neighs` is ignored when `delaunay"):
            with pytest.warns(FutureWarning, match="deprecated"):
                sq.gr.spatial_neighbors(dummy_adata, coord_type="generic",
                                        delaunay=True, n_neighs=10)

    def test_delaunay_scalar_radius_silently_ignored(self, dummy_adata):
        import warnings as _w

        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            sq.gr.spatial_neighbors(dummy_adata, coord_type="generic",
                                    delaunay=True, radius=5.0)
        msgs = [str(w.message) for w in rec]
        assert not any("ignored" in m and "radius" in m.lower() for m in msgs)  # silent per legacy contract
        # graph equals the pure-delaunay build
        a = dummy_adata.obsp["spatial_connectivities"].copy()
        sq.gr.spatial_neighbors_delaunay(dummy_adata)
        b = dummy_adata.obsp["spatial_connectivities"]
        assert (a != b).nnz == 0

    def test_radius_mode_ignores_n_neighs_with_warning(self, dummy_adata):
        with pytest.warns(FutureWarning, match="`n_neighs` is ignored when `radius"):
            with pytest.warns(FutureWarning, match="deprecated"):
                sq.gr.spatial_neighbors(dummy_adata, coord_type="generic",
                                        radius=10.0, n_neighs=4)
