"""Parity against the reference's literal ground truths.

These reuse the reference test suite's input DATA and expected matrices
(/root/reference/tests/conftest.py:289-345,
tests/graph/test_spatial_neighbors.py:28-205) as the compatibility contract:
the same coordinates must produce exactly the same graphs, ring counts, and
pruned distances.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from scipy.sparse import isspmatrix_csr

import squidpy_tpu as sq
from squidpy_tpu._constants._pkg_constants import Key

# reference ground-truth Delaunay distances/graph for the 4-point cloud
GT_DDIST = np.array(
    [
        [0.0, 2.0, 0.0, 4.12310563],
        [2.0, 0.0, 6.32455532, 5.0],
        [0.0, 6.32455532, 0.0, 5.38516481],
        [4.12310563, 5.0, 5.38516481, 0.0],
    ]
)
GT_DGRAPH = np.array(
    [
        [0.0, 1.0, 0.0, 1.0],
        [1.0, 0.0, 1.0, 1.0],
        [0.0, 1.0, 0.0, 1.0],
        [1.0, 1.0, 1.0, 0.0],
    ]
)

VISIUM_COORDS = np.array(
    [
        [4193, 7848], [4469, 7848], [4400, 7968], [4262, 7729], [3849, 7968],
        [4124, 7729], [4469, 7609], [3987, 8208], [4331, 8088], [4262, 7968],
        [4124, 7968], [4124, 7489], [4537, 7968], [4469, 8088], [4331, 7848],
        [4056, 7848], [3849, 7729], [4262, 7489], [4400, 8208], [4056, 7609],
        [3987, 7489], [4262, 8208], [4400, 7489], [4537, 7729], [4606, 7848],
        [3987, 7968], [3918, 8088], [3918, 7848], [4193, 8088], [4056, 8088],
        [4193, 7609], [3987, 7729], [4331, 7609], [4124, 8208], [3780, 7848],
        [3918, 7609], [4400, 7729],
    ]
)


@pytest.fixture()
def non_visium_adata() -> sq.AnnData:
    coords = np.array([[1, 0], [3, 0], [5, 6], [0, 4]], dtype=float)
    adata = sq.AnnData(X=coords)
    adata.obsm[Key.obsm.spatial] = coords
    return adata


@pytest.fixture()
def visium_adata() -> sq.AnnData:
    adata = sq.AnnData(X=np.ones((VISIUM_COORDS.shape[0], 3)))
    adata.obsm[Key.obsm.spatial] = VISIUM_COORDS.astype(float)
    adata.uns[Key.uns.spatial] = {}
    return adata


class TestSpatialNeighborsParity:
    @pytest.mark.parametrize(("n_rings", "n_neigh", "sum_dist"), [(1, 6, 0), (2, 18, 30), (3, 36, 84)])
    def test_visium_rings(self, visium_adata, n_rings, n_neigh, sum_dist):
        """Reference: test_spatial_neighbors_visium — hex-grid ring expansion."""
        with pytest.warns(FutureWarning):
            sq.gr.spatial_neighbors(visium_adata, n_rings=n_rings)
        assert visium_adata.obsp[Key.obsp.spatial_conn()][0].sum() == n_neigh
        assert visium_adata.uns[Key.uns.spatial_neighs()]["distances_key"] == Key.obsp.spatial_dist()
        if n_rings > 1:
            assert visium_adata.obsp[Key.obsp.spatial_dist()][0].sum() == sum_dist

    @pytest.mark.parametrize(("n_rings", "n_neigh", "sum_neigh"), [(1, 4, 4), (2, 4, 12), (3, 4, 24)])
    def test_squaregrid_rings(self, adata_squaregrid, n_rings, n_neigh, sum_neigh):
        """Reference: test_spatial_neighbors_squaregrid."""
        with pytest.warns(FutureWarning):
            sq.gr.spatial_neighbors(adata_squaregrid, n_neighs=n_neigh, n_rings=n_rings, coord_type="grid")
        adj = adata_squaregrid.obsp[Key.obsp.spatial_conn()]
        assert np.diff(adj.indptr).max() == sum_neigh

    def test_non_visium_knn_radius_delaunay(self, non_visium_adata):
        """Reference: test_spatial_neighbors_non_visium — exact literal graphs."""
        correct_knn_graph = np.ones((4, 4)) - np.eye(4)
        correct_radius_graph = np.array(
            [
                [0.0, 1.0, 0.0, 1.0],
                [1.0, 0.0, 0.0, 1.0],
                [0.0, 0.0, 0.0, 0.0],
                [1.0, 1.0, 0.0, 0.0],
            ]
        )
        with pytest.warns(FutureWarning):
            sq.gr.spatial_neighbors(non_visium_adata, n_neighs=3, coord_type=None)
        np.testing.assert_array_equal(
            non_visium_adata.obsp[Key.obsp.spatial_conn()].toarray(), correct_knn_graph
        )

        with pytest.warns(FutureWarning):
            sq.gr.spatial_neighbors(non_visium_adata, radius=5.0, coord_type=None)
        np.testing.assert_array_equal(
            non_visium_adata.obsp[Key.obsp.spatial_conn()].toarray(), correct_radius_graph
        )

        with pytest.warns(FutureWarning):
            sq.gr.spatial_neighbors(non_visium_adata, delaunay=True, coord_type=None)
        np.testing.assert_array_equal(
            non_visium_adata.obsp[Key.obsp.spatial_conn()].toarray(), GT_DGRAPH
        )
        np.testing.assert_allclose(
            non_visium_adata.obsp[Key.obsp.spatial_dist()].toarray(), GT_DDIST
        )

    @pytest.mark.parametrize("set_diag", [False, True])
    @pytest.mark.parametrize("radius", [(0, np.inf), (2.0, 4.0), (-42, -420), (100, 200)])
    def test_radius_min_max(self, non_visium_adata, radius, set_diag):
        """Reference: test_radius_min_max — interval pruning of delaunay edges."""
        gt_ddist = GT_DDIST.copy()
        gt_dgraph = GT_DGRAPH.copy()
        minn, maxx = sorted(radius)
        mask = (gt_ddist < minn) | (gt_ddist > maxx)
        gt_ddist[mask] = 0.0
        gt_dgraph[mask] = 0.0
        if set_diag:
            ixs = np.arange(len(gt_dgraph))
            gt_dgraph[ixs, ixs] = 1.0

        with pytest.warns(FutureWarning):
            sq.gr.spatial_neighbors(
                non_visium_adata, delaunay=True, coord_type=None, radius=radius, set_diag=set_diag
            )
        np.testing.assert_allclose(
            non_visium_adata.obsp[Key.obsp.spatial_conn()].toarray(), gt_dgraph
        )
        np.testing.assert_allclose(
            non_visium_adata.obsp[Key.obsp.spatial_dist()].toarray(), gt_ddist
        )

    def test_copy_contract(self, non_visium_adata):
        """Reference: test_copy — CSR outputs, adata untouched."""
        with pytest.warns(FutureWarning):
            result = sq.gr.spatial_neighbors(non_visium_adata, delaunay=True, coord_type=None, copy=True)
        assert isspmatrix_csr(result.connectivities)
        assert isspmatrix_csr(result.distances)
        assert Key.obsp.spatial_conn() not in non_visium_adata.obsp
        assert Key.obsp.spatial_dist() not in non_visium_adata.obsp
        np.testing.assert_allclose(result.distances.toarray(), GT_DDIST)
        np.testing.assert_allclose(result.connectivities.toarray(), GT_DGRAPH)

    @pytest.mark.parametrize("set_diag", [False, True])
    @pytest.mark.parametrize("type_rings", [("grid", 1), ("grid", 6), ("generic", 1)])
    def test_set_diag(self, adata_squaregrid, set_diag, type_rings):
        """Reference: test_set_diag — diagonal semantics across modes."""
        typ, n_rings = type_rings
        with pytest.warns(FutureWarning):
            sq.gr.spatial_neighbors(adata_squaregrid, coord_type=typ, set_diag=set_diag, n_rings=n_rings)
        G = adata_squaregrid.obsp[Key.obsp.spatial_conn()]
        D = adata_squaregrid.obsp[Key.obsp.spatial_dist()]
        np.testing.assert_array_equal(G.diagonal(), float(set_diag))
        np.testing.assert_array_equal(D.diagonal(), 0.0)

    def test_library_key_block_diagonal(self, visium_adata):
        """Reference: _assert_library_key_block_diagonal — concatenated
        libraries reproduce each library's graph in its block."""
        adata1 = visium_adata
        adata2 = visium_adata.copy()
        with pytest.warns(FutureWarning):
            sq.gr.spatial_neighbors(adata2.copy(), n_rings=1)  # warm
        single = adata1.copy()
        with pytest.warns(FutureWarning):
            sq.gr.spatial_neighbors(single, n_rings=1)

        concat = sq.concat([adata1, adata2], label="library_id", keys=["b1", "b2"], index_unique="-")
        concat.uns[Key.uns.spatial] = {}
        with pytest.warns(FutureWarning):
            sq.gr.spatial_neighbors(concat, library_key="library_id", n_rings=1)
        n = adata1.n_obs
        block1 = concat.obsp[Key.obsp.spatial_conn()].toarray()[:n, :n]
        np.testing.assert_array_equal(block1, single.obsp[Key.obsp.spatial_conn()].toarray())

    def test_builder_equivalence(self, non_visium_adata):
        """Reference: legacy kwargs vs explicit builder produce identical graphs."""
        from squidpy_tpu.gr.neighbors import DelaunayBuilder, KNNBuilder, RadiusBuilder

        for kwargs, builder in [
            ({"n_neighs": 3, "coord_type": "generic"}, KNNBuilder(n_neighs=3)),
            ({"radius": 5.0, "coord_type": "generic"}, RadiusBuilder(radius=5.0)),
            ({"delaunay": True, "coord_type": "generic"}, DelaunayBuilder()),
        ]:
            a1 = non_visium_adata.copy()
            a2 = non_visium_adata.copy()
            with pytest.warns(FutureWarning):
                sq.gr.spatial_neighbors(a1, **kwargs)
            sq.gr.spatial_neighbors_from_builder(a2, builder)
            np.testing.assert_array_equal(
                a1.obsp[Key.obsp.spatial_conn()].toarray(),
                a2.obsp[Key.obsp.spatial_conn()].toarray(),
            )
