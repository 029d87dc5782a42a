"""Keyed index-cipher permutation generator (_core/index_cipher.py).

The cipher replaces the per-permutation bitonic sort at scale; these tests
lock its three contracts: exact bijectivity at any n, the seed+index
determinism contract (chunk/shard-invariant), and statistical agreement with
the exact permutation-null moments (the same null the reference's
numpy-shuffle draws from, /root/reference/src/squidpy/gr/_utils.py:185-213).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from squidpy_tpu._core.index_cipher import (
    MIN_CIPHER_N,
    cipher_index_batch,
    cipher_label_columns,
)
from squidpy_tpu._core.rng import spawn_keys


class TestBijectivity:
    @pytest.mark.parametrize("n", [1, 2, 3, 5, 49, 64, 100, 1000, 4097, 10007, 65536])
    def test_index_batch_is_permutation(self, n):
        idx = np.asarray(cipher_index_batch(spawn_keys(0, 3), n))
        assert idx.shape == (3, n)
        for p in range(3):
            assert np.array_equal(np.sort(idx[p]), np.arange(n))

    @pytest.mark.parametrize("counts", [[7], [1, 1], [3, 0, 5], [10, 250, 3, 737], [1] * 17])
    def test_label_columns_preserve_multiset(self, counts):
        counts = np.asarray(counts)
        cols = np.asarray(cipher_label_columns(spawn_keys(1, 5), counts))
        assert cols.shape == (int(counts.sum()), 5)
        for p in range(5):
            assert np.array_equal(np.bincount(cols[:, p], minlength=len(counts)), counts)

    def test_prime_n_with_walking(self):
        # prime n exercises the cycle-walk (a*b > n always)
        n = 10007
        idx = np.asarray(cipher_index_batch(spawn_keys(3, 2), n))
        assert np.array_equal(np.sort(idx[0]), np.arange(n))

    def test_many_classes_int32_output(self):
        counts = np.full(300, 4)  # 300 classes > uint8 range
        cols = cipher_label_columns(spawn_keys(0, 2), counts)
        assert cols.dtype == jnp.int32
        got = np.bincount(np.asarray(cols)[:, 0], minlength=300)
        assert np.array_equal(got, counts)


class TestDeterminism:
    def test_seed_and_index_determine_column(self):
        counts = np.array([40, 25, 35])
        full = np.asarray(cipher_label_columns(spawn_keys(9, 8), counts))
        # recompute with a key subset: columns must be bitwise identical
        sub = np.asarray(cipher_label_columns(spawn_keys(9, 8)[2:5], counts))
        assert np.array_equal(full[:, 2:5], sub)

    def test_different_seeds_differ(self):
        counts = np.array([500, 500])
        a = np.asarray(cipher_label_columns(spawn_keys(0, 1), counts))
        b = np.asarray(cipher_label_columns(spawn_keys(1, 1), counts))
        assert not np.array_equal(a, b)

    def test_index_batch_matches_rounds_contract(self):
        a = np.asarray(cipher_index_batch(spawn_keys(4, 4), 5000))
        b = np.asarray(cipher_index_batch(spawn_keys(4, 4), 5000))
        assert np.array_equal(a, b)


class TestStatistics:
    def test_pair_count_moments_match_analytic_null(self):
        """Second-order check: cluster-pair edge counts over cipher shuffles
        must match the exact closed-form permutation moments."""
        from squidpy_tpu.ops.nhood import (
            analytic_pair_count_moments,
            permuted_pair_counts_cols,
        )
        from scipy import sparse as sp

        rng = np.random.default_rng(0)
        n, k, C, P = 66_000, 2, 3, 200
        # ring-ish sparse graph with irregular jumps
        nbrs = np.stack(
            [np.roll(np.arange(n), 1), (np.arange(n) * 48271 + 11) % n], axis=1
        ).astype(np.int32)
        labels = rng.choice(C, n, p=[0.6, 0.3, 0.1]).astype(np.int32)
        counts_c = np.bincount(labels, minlength=C)

        rows = np.repeat(np.arange(n), k)
        A = sp.csr_matrix((np.ones(n * k), (rows, nbrs.ravel())), shape=(n, n))
        mean, var = analytic_pair_count_moments(A, counts_c)

        cols = cipher_label_columns(spawn_keys(5, P), counts_c)
        pc = np.asarray(
            permuted_pair_counts_cols(jnp.asarray(nbrs), jnp.ones((n, k), bool), cols, C)
        )
        z_mean = (pc.mean(0) - mean) / np.sqrt(var / P)
        # MC error on the mean is N(0,1) per bucket; 9 buckets — |z|<4.5 is
        # a ~1e-4-level test
        assert np.abs(z_mean).max() < 4.5, z_mean
        ratio = pc.var(0) / var
        assert ratio.min() > 0.7 and ratio.max() < 1.4, ratio

    def test_position_marginals_uniform(self):
        """First-order check: each position receives class c with frequency
        counts[c]/n (chi-square over coarse position bins)."""
        n, P = MIN_CIPHER_N, 64
        counts = np.array([n // 2, n - n // 2])
        cols = np.asarray(cipher_label_columns(spawn_keys(11, P), counts))
        n_bins = 32
        binned = cols[: n_bins * (n // n_bins)].reshape(n_bins, -1, P)
        ones = binned.sum(axis=(1, 2)).astype(np.float64)  # class-1 count per bin
        expected = (n // n_bins) * P * (counts[1] / n)
        # binomial std per bin
        std = np.sqrt((n // n_bins) * P * (counts[1] / n) * (counts[0] / n))
        z = (ones - expected) / std
        assert np.abs(z).max() < 5.0, z


class TestNhoodIntegration:
    def test_nhood_enrichment_uses_cipher_above_threshold(self, monkeypatch):
        """At n >= MIN_CIPHER_N the pipeline routes through the cipher and
        produces finite z-scores consistent with the analytic mode."""
        import pandas as pd
        from scipy import sparse as sp

        import squidpy_tpu as sq
        from squidpy_tpu._core import index_cipher

        calls = {"cipher": 0}
        orig = index_cipher.cipher_label_columns

        def spy(*a, **k):
            calls["cipher"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(index_cipher, "cipher_label_columns", spy)

        rng = np.random.default_rng(0)
        n = MIN_CIPHER_N
        nbrs = np.stack([np.roll(np.arange(n), 1), np.roll(np.arange(n), -1)], axis=1)
        rows = np.repeat(np.arange(n), 2)
        adj = sp.csr_matrix((np.ones(2 * n), (rows, nbrs.ravel())), shape=(n, n))
        labels = pd.Categorical(rng.choice(list("abc"), n))
        adata = sq.AnnData(
            X=np.zeros((n, 1)),
            obs=pd.DataFrame({"cl": labels}, index=[str(i) for i in range(n)]),
            var=pd.DataFrame(index=["g0"]),
        )
        adata.obsp["spatial_connectivities"] = adj
        adata.uns["spatial_neighbors"] = {}

        res = sq.gr.nhood_enrichment(
            adata, cluster_key="cl", n_perms=100, seed=0, copy=True, show_progress_bar=False
        )
        assert calls["cipher"] >= 1
        ana = sq.gr.nhood_enrichment(adata, cluster_key="cl", mode="analytic", copy=True)
        # MC z-scores agree with the exact-moment z-scores
        both = np.isfinite(res.zscore) & np.isfinite(ana.zscore)
        assert both.any()
        assert np.abs(res.zscore[both] - ana.zscore[both]).max() < 1.5
