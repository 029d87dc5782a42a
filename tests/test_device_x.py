"""Session-scoped device expression handle (VERDICT r3 task 4).

Contract: X ships to the device exactly once per (adata, layer, use_raw);
spatial_autocorr / ligrec / sepal share the cached handle; results are
unchanged vs the streaming path; replacing X invalidates the cache."""

from __future__ import annotations

from itertools import product

import numpy as np
import pandas as pd
import pytest
from scipy import sparse as sp

import squidpy_tpu as sq
from squidpy_tpu._core.device_x import DeviceExpression, device_expression


@pytest.fixture()
def adata_counts():
    rng = np.random.default_rng(0)
    n, g = 400, 60
    adata = sq.AnnData(
        X=rng.poisson(2.0, size=(n, g)).astype(np.float32),
        obs=pd.DataFrame({
            "leiden": pd.Categorical(rng.choice(["a", "b", "c"], size=n)),
        }),
    )
    adata.var_names = [f"g{i}" for i in range(g)]
    adata.obsm["spatial"] = rng.uniform(0, 100, size=(n, 2))
    sq.gr.spatial_neighbors_knn(adata, n_neighs=6)
    return adata


class TestHandle:
    def test_ships_once_and_is_shared(self, adata_counts):
        h1 = device_expression(adata_counts)
        h2 = device_expression(adata_counts)
        assert h1 is h2
        assert h1.ship_count == 1

    def test_narrowest_container(self, adata_counts):
        h = device_expression(adata_counts)
        # Poisson(2) counts < 256 → shipped as u8
        assert h._dense.dtype == np.uint8

    def test_dense_block_matches_source(self, adata_counts):
        h = device_expression(adata_counts)
        cols = h.columns_of(["g3", "g4", "g5"])
        blk = np.asarray(h.dense_block(cols))
        np.testing.assert_array_equal(blk, np.asarray(adata_counts.X)[:, 3:6])

    def test_noncontiguous_columns(self, adata_counts):
        h = device_expression(adata_counts)
        cols = h.columns_of(["g10", "g2", "g31"])
        blk = np.asarray(h.dense_block(cols))
        np.testing.assert_array_equal(blk, np.asarray(adata_counts.X)[:, [10, 2, 31]])

    def test_sparse_csc_roundtrip(self):
        rng = np.random.default_rng(1)
        x = sp.random(300, 40, density=0.1, random_state=1, format="csr", dtype=np.float32)
        h = DeviceExpression(x, [f"g{i}" for i in range(40)])
        blk = np.asarray(h.dense_block(np.arange(40)))
        np.testing.assert_allclose(blk, np.asarray(x.todense()), rtol=1e-6)

    def test_replacing_x_invalidates(self, adata_counts):
        h1 = device_expression(adata_counts)
        adata_counts.X = np.asarray(adata_counts.X) * 2.0
        h2 = device_expression(adata_counts)
        assert h2 is not h1
        assert h2.ship_count == 1

    def test_create_false_returns_cached_only(self, adata_counts):
        assert device_expression(adata_counts, create=False) is None
        h = device_expression(adata_counts)
        assert device_expression(adata_counts, create=False) is h

    def test_missing_genes_fall_back(self, adata_counts):
        h = device_expression(adata_counts)
        assert h.columns_of(["g1", "NOT_THERE"]) is None

    def test_inplace_mutation_invalidates(self, adata_counts):
        """In-place edits (same live object) must not serve a stale device
        copy — the fingerprint, not weakref identity, catches these."""
        h1 = device_expression(adata_counts)
        x = adata_counts.X
        x[:] = x * 2.0
        h2 = device_expression(adata_counts)
        assert h2 is not h1
        np.testing.assert_array_equal(
            np.asarray(h2.dense_block(np.array([0]))).ravel(), np.asarray(x)[:, 0]
        )

    def test_inplace_sparse_mutation_invalidates(self):
        rng = np.random.default_rng(2)
        x = sp.random(300, 40, density=0.1, random_state=2, format="csr", dtype=np.float32)
        adata = sq.AnnData(X=x, obs=pd.DataFrame(index=[str(i) for i in range(300)]))
        adata.var_names = [f"g{i}" for i in range(40)]
        h1 = device_expression(adata)
        adata.X.data *= 3.0
        h2 = device_expression(adata)
        assert h2 is not h1
        np.testing.assert_allclose(
            np.asarray(h2.full_dense()), np.asarray(adata.X.todense()), rtol=1e-6
        )

    def test_duplicated_var_names_fall_back(self, adata_counts):
        """Duplicated var_names resolve ambiguously by name — columns_of must
        defer those genes to the positional streaming path."""
        names = list(adata_counts.var_names)
        names[5] = names[3]  # duplicate "g3"
        adata_counts.var_names = names
        h = device_expression(adata_counts)
        assert h.columns_of(["g3"]) is None
        assert h.columns_of(["g3", "g1"]) is None
        cols = h.columns_of(["g1", "g2"])  # unique names still resolve
        np.testing.assert_array_equal(cols, [1, 2])


class TestBf16Exact:
    """`bf16_exact` gates the DEFAULT-precision MXU fast path: only u8
    containers (integers ≤ 255, exactly representable in bf16) qualify —
    u16 values need up to 16 mantissa bits and floats are arbitrary."""

    def test_u8_dense_is_exact(self):
        x = np.arange(12, dtype=np.float32).reshape(4, 3)
        h = DeviceExpression(x, ["a", "b", "c"])
        assert h._dense.dtype == np.uint8 and h.bf16_exact

    def test_u16_dense_is_not(self):
        x = (np.arange(12, dtype=np.float32) * 300).reshape(4, 3)
        h = DeviceExpression(x, ["a", "b", "c"])
        assert h._dense.dtype == np.uint16 and not h.bf16_exact

    def test_float_dense_is_not(self):
        x = np.arange(12, dtype=np.float32).reshape(4, 3) + 0.5
        h = DeviceExpression(x, ["a", "b", "c"])
        assert not h.bf16_exact

    def test_sparse_u8(self):
        x = sp.csr_matrix(np.array([[0, 3.0], [1.0, 0]], dtype=np.float32))
        h = DeviceExpression(x, ["a", "b"])
        assert h.bf16_exact

    def test_cluster_means_flag_is_lossless(self):
        """exact_bf16=True must change nothing for u8-valued data (on TPU it
        halves MXU passes; on any backend the result is identical)."""
        import jax.numpy as jnp

        from squidpy_tpu.ops.ligrec import cluster_means

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.integers(0, 256, size=(300, 20)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 4, size=300).astype(np.int32))
        a = np.asarray(cluster_means(x, labels, 4, exact_bf16=True))
        b = np.asarray(cluster_means(x, labels, 4, exact_bf16=False))
        np.testing.assert_array_equal(a, b)


class TestSharedAcrossStats:
    def test_autocorr_then_sepal_one_shipment(self, adata_counts):
        sq.gr.spatial_autocorr(adata_counts, mode="moran")
        h = device_expression(adata_counts, create=False)
        assert h is not None and h.ship_count == 1
        # grid graph required for sepal — rebuild on a square grid instead
        # (sepal validates max_neighs); here we only assert handle reuse via
        # a second autocorr call
        sq.gr.spatial_autocorr(adata_counts, mode="geary")
        assert device_expression(adata_counts, create=False) is h
        assert h.ship_count == 1

    def test_autocorr_results_match_streaming(self, adata_counts):
        df_handle = sq.gr.spatial_autocorr(adata_counts, mode="moran", copy=True)
        # force the streaming path by clearing the cache
        for k in list(adata_counts.uns):
            if str(k).startswith("__squidpy_tpu_device_x__"):
                del adata_counts.uns[k]
        from unittest import mock

        with mock.patch("squidpy_tpu._core.device_x.device_expression", return_value=None):
            df_stream = sq.gr.spatial_autocorr(adata_counts, mode="moran", copy=True)
        pd.testing.assert_frame_equal(df_handle, df_stream)

    def test_ligrec_uses_handle_at_scale(self, monkeypatch):
        """Above the f64-exact size gate, ligrec reuses the cached device X
        and performs no new shipment of the matrix."""
        rng = np.random.default_rng(2)
        n, g = 900, 80
        adata = sq.AnnData(
            X=rng.poisson(1.5, size=(n, g)).astype(np.float32),
            obs=pd.DataFrame({
                "leiden": pd.Categorical(rng.choice(["a", "b", "c"], size=n)),
            }),
        )
        adata.var_names = [f"g{i}" for i in range(g)]
        inter = tuple(product(adata.var_names[:8], adata.var_names[:8]))
        h = device_expression(adata)  # pre-seeded cache

        import squidpy_tpu.gr._ligrec as lig_mod

        monkeypatch.setattr(lig_mod, "_EXACT_SIZE_LIMIT", 0)  # force the scale path
        captured = {}
        orig = lig_mod._analysis

        def spy(data, *args, **kw):
            captured["x_dev"] = kw.get("x_dev")
            captured["data"] = data
            return orig(data, *args, **kw)

        monkeypatch.setattr(lig_mod, "_analysis", spy)
        res = sq.gr.ligrec(adata, "leiden", interactions=inter, n_perms=5, seed=0,
                           use_raw=False, copy=True)
        assert res is not None
        assert captured["x_dev"] is not None  # device handle path taken
        assert captured["data"] is None       # no host matrix copy
        assert h.ship_count == 1              # still the single original shipment

    def test_ligrec_handle_matches_streaming(self):
        """Handle path vs streaming path: same means, same pvalues."""
        rng = np.random.default_rng(3)
        n, g = 500, 40
        adata = sq.AnnData(
            X=rng.poisson(1.5, size=(n, g)).astype(np.float32),
            obs=pd.DataFrame({
                "leiden": pd.Categorical(rng.choice(["a", "b"], size=n)),
            }),
        )
        adata.var_names = [f"g{i}" for i in range(g)]
        inter = tuple(product(adata.var_names[:6], adata.var_names[:6]))
        import squidpy_tpu.gr._ligrec as lig_mod

        data = np.asarray(adata.X, dtype=np.float32)
        labels = np.asarray(adata.obs["leiden"].cat.codes.to_numpy(), dtype=np.int32)
        gcols = {g_: i for i, g_ in enumerate(adata.var_names)}
        inter_idx = np.array([[gcols[a], gcols[b]] for a, b in inter], dtype=np.int32)
        cl = np.array(list(product(range(2), repeat=2)), dtype=np.int32)

        m1, p1 = lig_mod._analysis(data, labels, 2, inter_idx, cl, threshold=0.01,
                                   n_perms=25, seed=0)
        import jax.numpy as jnp

        x_dev = jnp.asarray(data)
        m2, p2 = lig_mod._analysis(None, labels, 2, inter_idx, cl, threshold=0.01,
                                   n_perms=25, seed=0, x_dev=x_dev)
        np.testing.assert_allclose(m1, m2, rtol=1e-5, atol=1e-7)
        # the observed means enter the device indicator; host-f64 vs
        # device-f32 means can flip knife-edge permutations (integral counts
        # make exact ties common) — allow single-permutation disagreements
        both = np.isfinite(p1) & np.isfinite(p2)
        np.testing.assert_array_equal(np.isfinite(p1), np.isfinite(p2))
        diffs = np.abs(p1[both] - p2[both])
        assert (diffs <= 1.0 / 25 + 1e-12).all()
        assert (diffs > 1e-12).mean() <= 0.05
