"""Sharding-invariance tests on the virtual 8-device CPU mesh — the TPU
analogue of the reference's n_jobs-invariance contract
(/root/reference/tests/graph/test_nhood.py:62-71): identical bits regardless
of device count."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import sparse as sp

from squidpy_tpu._core.graph import SpatialGraph
from squidpy_tpu._core.rng import permutation_batch, spawn_keys
from squidpy_tpu.ops.autocorr import moran_scores
from squidpy_tpu.ops.nhood import cluster_pair_counts, permuted_pair_counts
from squidpy_tpu.parallel import (
    cell_mesh,
    sharded_moran_scores,
    sharded_pair_counts,
    sharded_permuted_pair_counts,
)


@pytest.fixture(scope="module")
def graph_and_labels():
    rng = np.random.default_rng(0)
    n = 512  # divisible by 8
    adj = sp.random(n, n, density=0.02, format="csr", random_state=0)
    adj.data[:] = 1.0
    g = SpatialGraph.from_csr(adj)
    labels = jnp.asarray(rng.integers(0, 6, n).astype(np.int32))
    return g, labels


class TestShardedCounts:
    @pytest.mark.parametrize("n_dev", [1, 2, 8])
    def test_pair_counts_invariant(self, graph_and_labels, n_dev):
        g, labels = graph_and_labels
        mesh = cell_mesh(n_dev)
        got = np.asarray(sharded_pair_counts(mesh, g.indices, g.mask, labels, 6))
        want = np.asarray(cluster_pair_counts(g.indices, g.mask, labels, 6))
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("n_dev", [2, 8])
    def test_permuted_counts_invariant(self, graph_and_labels, n_dev):
        g, labels = graph_and_labels
        mesh = cell_mesh(n_dev)
        shuffled = permutation_batch(spawn_keys(3, 16), labels)
        got = np.asarray(sharded_permuted_pair_counts(mesh, g.indices, g.mask, shuffled, 6))
        want = np.asarray(permuted_pair_counts(g.indices, g.mask, shuffled, 6))
        np.testing.assert_array_equal(got, want)


class TestShardedMoran:
    def test_moran_matches_single_device(self, graph_and_labels):
        g, _ = graph_and_labels
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(512, 16)))
        mesh = cell_mesh(8)
        s0 = float(np.asarray(g.weights).sum())
        got = np.asarray(sharded_moran_scores(mesh, g.indices, g.weights, x, s0))
        want = np.asarray(moran_scores(g.indices, g.weights, x, jnp.asarray(s0)))
        np.testing.assert_allclose(got, want, rtol=1e-12)


class TestShardedLigrec:
    @pytest.mark.parametrize("n_perms", [7, 16, 23])  # non-divisible exercises pad weights
    def test_auto_matches_single_device(self, n_perms):
        import jax
        import jax.numpy as jnp

        from squidpy_tpu.ops.ligrec import ligrec_perm_counts
        from squidpy_tpu.parallel.sharded import auto_ligrec_counts

        rng = np.random.default_rng(0)
        n, g, C, I, J = 300, 40, 5, 20, 12
        x = jnp.asarray(rng.gamma(2.0, 1.0, (n, g)).astype(np.float32))
        labels = rng.integers(0, C, n).astype(np.int32)
        shuffled = jnp.asarray(
            np.stack([np.random.default_rng(i).permutation(labels) for i in range(n_perms)])
        )
        counts = jnp.asarray(np.bincount(labels, minlength=C).astype(np.float32))
        rec = jnp.asarray(rng.integers(0, g, I).astype(np.int32))
        lig = jnp.asarray(rng.integers(0, g, I).astype(np.int32))
        c1 = jnp.asarray(rng.integers(0, C, J).astype(np.int32))
        c2 = jnp.asarray(rng.integers(0, C, J).astype(np.int32))
        m_sum = jnp.asarray(rng.random((I, J)).astype(np.float32) * 2)

        single = np.asarray(ligrec_perm_counts(x, shuffled, counts, rec, lig, c1, c2, m_sum, C))
        assert jax.device_count() == 8
        sharded = np.asarray(auto_ligrec_counts(x, shuffled, counts, rec, lig, c1, c2, m_sum, C))
        np.testing.assert_array_equal(single, sharded)  # bitwise: integer exceedance counts


class TestShardedCooccur:
    @pytest.mark.parametrize("n", [333, 512])  # non-divisible exercises row padding
    def test_auto_matches_single_device(self, n):
        import jax
        import jax.numpy as jnp

        from squidpy_tpu.ops.cooccur import _cooccur_device
        from squidpy_tpu.parallel.sharded import auto_cooccur_counts

        rng = np.random.default_rng(1)
        coords = jnp.asarray(rng.random((n, 2)).astype(np.float32) * 50)
        labels = jnp.asarray(rng.integers(0, 5, n).astype(np.int32))
        thr = jnp.asarray((np.linspace(2, 40, 7) ** 2).astype(np.float32))
        single = np.asarray(_cooccur_device(coords, labels, thr, 5, 128))
        assert jax.device_count() == 8
        shard = np.asarray(auto_cooccur_counts(coords, labels, thr, 5, row_tile=128))
        np.testing.assert_array_equal(single, shard)


class TestShardedSepal:
    def test_auto_matches_single_device(self):
        """Gene-sharded sepal equals the single-device kernel per gene
        (11 genes on 8 devices exercises the replicate-pad path)."""
        import jax
        import pandas as pd

        import squidpy_tpu as sq

        assert jax.device_count() == 8
        rng = np.random.default_rng(0)
        side = 12
        xx, yy = np.meshgrid(np.arange(side), np.arange(side))
        coords = np.c_[xx.ravel(), yy.ravel()].astype(float)
        n = side * side
        X = rng.gamma(2.0, 1.0, (n, 11)).astype(np.float64)
        ad = sq.AnnData(X=X, var=pd.DataFrame(index=[f"g{i}" for i in range(11)]),
                        obsm={"spatial": coords})
        sq.gr.spatial_neighbors_grid(ad, n_neighs=4)
        res = sq.gr.sepal(ad, max_neighs=4, genes=list(ad.var_names), n_iter=500, copy=True)

        # the 11-gene run went through the 8-device sharded path; a 1-gene run
        # takes the single-device branch (n_genes < n_dev) — per-gene equality
        # is the sharding-invariance contract
        one_by_one = []
        for g in ad.var_names:
            r1 = sq.gr.sepal(ad, max_neighs=4, genes=[g], n_iter=500, copy=True)
            one_by_one.append(float(r1["sepal_score"].loc[g]))
        got = res["sepal_score"].loc[list(ad.var_names)].to_numpy(dtype=float)
        np.testing.assert_allclose(got, np.array(one_by_one), equal_nan=True)


class TestGraftEntry:
    """The driver's multi-chip dryrun must work from any jax state."""

    def test_dryrun_multichip_inprocess_on_existing_mesh(self):
        """Case 2: jax is already an 8-device CPU mesh (this suite) — the
        dryrun must run in-process without touching backend config."""
        import sys

        sys.path.insert(0, "/root/repo")
        try:
            import __graft_entry__ as ge

            for n in (1, 2, 8):
                ge.dryrun_multichip(n)
        finally:
            sys.path.remove("/root/repo")

    def test_entry_is_jittable(self):
        import sys

        import jax

        sys.path.insert(0, "/root/repo")
        try:
            import __graft_entry__ as ge

            fn, example_args = ge.entry()
            counts, scores = jax.jit(fn)(*example_args)
            assert np.isfinite(np.asarray(scores)).all()
            assert np.asarray(counts).sum() > 0
        finally:
            sys.path.remove("/root/repo")


class TestShardedTileQC:
    def test_qc_tile_batch_shards_and_strips_padding(self):
        """qc_image's tile batch is device-sharded; a tile count not divisible
        by the 8-device mesh must produce exactly one row per true tile, with
        per-tile metrics unaffected by the padding rows."""
        from squidpy_tpu.experimental.im import qc_image

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, size=(3 * 64, 7 * 64)).astype(np.float32)  # 21 tiles
        adata = qc_image(img, tile_size=64, metrics=["brightness_mean", "variance", "tissue_fraction"])
        assert adata.n_obs == 21
        # brightness_mean per tile equals the host-side tile mean
        tiles = img.reshape(3, 64, 7, 64).transpose(0, 2, 1, 3).reshape(-1, 64, 64) / 255.0
        np.testing.assert_allclose(
            adata.X[:, 0], tiles.mean(axis=(1, 2)), rtol=1e-5
        )


class TestShardedColumnCounts:
    """Column-layout permutation counts must be bitwise device-count invariant
    (int32 psum of exact per-shard counts)."""

    @pytest.mark.parametrize("n_dev", [2, 8])
    def test_cols_invariant(self, graph_and_labels, n_dev):
        from squidpy_tpu._core.rng import permutation_columns
        from squidpy_tpu.ops.nhood import permuted_pair_counts_cols
        from squidpy_tpu.parallel.sharded import sharded_permuted_pair_counts_cols

        g, labels = graph_and_labels
        cols = permutation_columns(spawn_keys(0, 9), labels)
        mesh = cell_mesh(n_dev)
        got = np.asarray(sharded_permuted_pair_counts_cols(mesh, g.indices, g.mask, cols, 6))
        want = np.asarray(permuted_pair_counts_cols(g.indices, g.mask, cols, 6))
        np.testing.assert_array_equal(got, want)

    def test_auto_pads_non_divisible_rows(self):
        from squidpy_tpu._core.rng import permutation_columns
        from squidpy_tpu.ops.nhood import permuted_pair_counts_cols
        from squidpy_tpu.parallel.sharded import auto_permuted_pair_counts_cols

        rng = np.random.default_rng(2)
        n = 501  # not divisible by 8
        adj = sp.random(n, n, density=0.03, format="csr", random_state=1)
        adj.data[:] = 1.0
        g = SpatialGraph.from_csr(adj)
        labels = jnp.asarray(rng.integers(0, 4, n).astype(np.int32))
        cols = permutation_columns(spawn_keys(3, 5), labels)
        got = np.asarray(auto_permuted_pair_counts_cols(g.indices, g.mask, cols, 4))
        want = np.asarray(permuted_pair_counts_cols(g.indices, g.mask, cols, 4))
        np.testing.assert_array_equal(got, want)


class TestPublicAutocorrSharded:
    """Public-path gene sharding: on this 8-device test mesh,
    ``spatial_autocorr`` device_puts each gene block with a NamedSharding over
    the gene axis — its scores must equal the unsharded kernel on the full
    matrix (VERDICT r1 item 10)."""

    def test_public_moran_matches_unsharded_kernel(self):
        import pandas as pd

        import squidpy_tpu as sq
        from squidpy_tpu._core.anndata import AnnData
        from squidpy_tpu._core.graph import SpatialGraph

        rng = np.random.default_rng(0)
        n, g = 300, 23  # gene count NOT divisible by 8 -> exercises padding
        adata = AnnData(
            X=rng.random((n, g)),
            obs=pd.DataFrame(index=[f"c{i}" for i in range(n)]),
        )
        adata.var_names = [f"g{i}" for i in range(g)]
        adata.obsm["spatial"] = rng.uniform(0, 100, size=(n, 2))
        sq.gr.spatial_neighbors_knn(adata, n_neighs=6)
        df = sq.gr.spatial_autocorr(adata, mode="moran", copy=True, seed=0)

        adj = sp.csr_matrix(adata.obsp["spatial_connectivities"], copy=True)
        rs = np.asarray(adj.sum(axis=1)).ravel()
        adj = sp.diags(np.where(rs > 0, 1.0 / rs, 0.0)) @ adj
        graph = SpatialGraph.from_csr(sp.csr_matrix(adj))
        x = jnp.asarray(np.asarray(adata.X, dtype=np.float64))
        want = np.asarray(moran_scores(graph.indices, graph.weights, x, jnp.asarray(adj.sum())))
        got = df.loc[[f"g{i}" for i in range(g)], "I"].to_numpy()
        np.testing.assert_allclose(got, want, rtol=1e-6)  # block path rounds via f32 once

    @pytest.mark.parametrize("n_dev", [1, 2, 8])
    def test_sharded_moran_gene_padding(self, n_dev):
        """Gene counts not divisible by the mesh width must round-trip."""
        rng = np.random.default_rng(1)
        n, g = 256, 13
        adj = sp.random(n, n, density=0.05, format="csr", random_state=0)
        adj.data[:] = 1.0
        gr = SpatialGraph.from_csr(adj)
        x_np = rng.random((n, g))
        pad = (-g) % n_dev
        x = jnp.asarray(np.pad(x_np, ((0, 0), (0, pad))))
        mesh = cell_mesh(n_dev)  # reuse as a 1-axis gene mesh
        got = np.asarray(sharded_moran_scores(mesh, gr.indices, gr.weights, x, float(adj.sum())))[:g]
        want = np.asarray(moran_scores(gr.indices, gr.weights, jnp.asarray(x_np), jnp.asarray(float(adj.sum()))))
        np.testing.assert_allclose(got, want, rtol=1e-12)
