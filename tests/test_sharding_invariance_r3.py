"""Sharding/device-count invariance for the round-3 paths.

The repo's race-detector analogue (SURVEY §5): results must be bitwise
independent of how work is spread over devices. These tests cover the
index-cipher counting pipeline, the tiled featurization round-robin, and
the cipher-fed Moran permutation mode on the 8-device CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from squidpy_tpu._core.index_cipher import cipher_index_batch, cipher_label_columns
from squidpy_tpu._core.rng import spawn_keys


@pytest.fixture()
def small_graph():
    rng = np.random.default_rng(0)
    n, k, n_cls = 4096, 4, 5
    indices = jnp.asarray(rng.integers(0, n, (n, k)).astype(np.int32))
    mask = jnp.ones((n, k), bool)
    labels = rng.integers(0, n_cls, n).astype(np.int32)
    return indices, mask, labels, n_cls


class TestCipherShardingInvariance:
    def test_sharded_counts_equal_unsharded(self, small_graph):
        from squidpy_tpu.ops.nhood import permuted_pair_counts_cols
        from squidpy_tpu.parallel.mesh import default_mesh
        from squidpy_tpu.parallel.sharded import sharded_permuted_pair_counts_cols

        indices, mask, labels, n_cls = small_graph
        counts = np.bincount(labels, minlength=n_cls)
        cols = cipher_label_columns(spawn_keys(0, 16), counts, out_dtype=jnp.uint8)
        plain = np.asarray(permuted_pair_counts_cols(indices, mask, cols, n_cls))
        for n_dev in (2, 8):
            mesh = default_mesh(n_dev, axis_name="cells")
            sharded = np.asarray(
                sharded_permuted_pair_counts_cols(mesh, indices, mask, cols, n_cls)
            )
            np.testing.assert_array_equal(sharded, plain)

    def test_cipher_generation_device_independent(self):
        # generation is pure arithmetic on (seed, index): identical columns
        # whether computed in one batch or per key on any device
        counts = np.array([1000, 500, 548])
        full = np.asarray(cipher_label_columns(spawn_keys(5, 6), counts))
        per_key = np.column_stack(
            [np.asarray(cipher_label_columns(spawn_keys(5, 6)[i : i + 1], counts))[:, 0] for i in range(6)]
        )
        np.testing.assert_array_equal(full, per_key)

    def test_index_batch_placement_invariant(self):
        devs = jax.devices()
        a = np.asarray(cipher_index_batch(spawn_keys(1, 3), 70000))
        with jax.default_device(devs[-1]):
            b = np.asarray(cipher_index_batch(spawn_keys(1, 3), 70000))
        np.testing.assert_array_equal(a, b)


class TestMoranPermCipherInvariance:
    def test_perm_scores_gene_block_invariant(self):
        """Moran perm mode (cipher-fed above threshold) gives identical
        z-scores per gene regardless of gene blocking."""
        import pandas as pd
        from scipy import sparse as sp

        import squidpy_tpu as sq

        rng = np.random.default_rng(0)
        n, g = 2000, 12
        adata = sq.AnnData(
            X=rng.normal(size=(n, g)),
            obs=pd.DataFrame(index=[f"c{i}" for i in range(n)]),
            var=pd.DataFrame(index=[f"g{i}" for i in range(g)]),
        )
        adata.obsm["spatial"] = rng.uniform(0, 100, (n, 2))
        sq.gr.spatial_neighbors_knn(adata, n_neighs=6)
        a = sq.gr.spatial_autocorr(adata, mode="moran", n_perms=20, seed=0, copy=True,
                                   gene_block_size=4)
        b = sq.gr.spatial_autocorr(adata, mode="moran", n_perms=20, seed=0, copy=True,
                                   gene_block_size=12)
        np.testing.assert_allclose(
            a["I"].to_numpy(float), b["I"].to_numpy(float), rtol=1e-6
        )
        np.testing.assert_array_equal(
            a["pval_sim"].to_numpy(float), b["pval_sim"].to_numpy(float)
        )


class TestRunTiledPlacementInvariance:
    def test_tile_results_identical_across_device_policies(self):
        import jax.numpy as jnp_

        from squidpy_tpu.experimental.im import build_tile_specs, compute_cell_info
        from squidpy_tpu.experimental.im._tiling import extract_tile, run_tiled
        from squidpy_tpu.ops.features import _per_label_channel_stats_kernel

        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (96, 96)).astype(np.uint8)
        seg = np.zeros((96, 96), np.int32)
        seg[4:30, 4:30] = 1
        seg[40:90, 10:60] = 2
        seg[10:34, 60:90] = 3
        info = compute_cell_info(seg)
        specs = build_tile_specs(seg.shape, info, tile_size=48)

        def stats(spec, image, labels):
            tile_img, tile_lab = extract_tile(image, labels, spec)
            s = _per_label_channel_stats_kernel(
                jnp_.asarray(tile_lab), jnp_.asarray(tile_img.astype(np.float32))[None], 4
            )
            return np.asarray(s["mean"][0]), np.asarray(s["std"][0])

        single = run_tiled(specs, stats, scatter=[img, seg], devices="single")
        multi = run_tiled(specs, stats, scatter=[img, seg], n_jobs=4, devices="auto")
        for (ma, sa), (mb, sb) in zip(single, multi):
            np.testing.assert_array_equal(ma, mb)
            np.testing.assert_array_equal(sa, sb)
