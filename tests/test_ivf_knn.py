"""IVF per-query-multiprobe kNN (ops/ivf_knn.py).

Recall asserts run against the exact device brute force; the IVF path is
approximate by design (the reference's own clustering graphs are pynndescent
approximations — /root/reference/src/squidpy/gr/_niche.py:399-457), so tests
lock a recall floor + the output contracts, not equality.
"""

from __future__ import annotations

import numpy as np
import pytest

from squidpy_tpu.ops.ivf_knn import ivf_knn, kmeans_device, sampled_recall
from squidpy_tpu.ops.knn import brute_force_knn


def _blobs(n: int, d: int, n_centers: int = 12, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-8, 8, size=(n_centers, d))
    return (centers[rng.integers(0, n_centers, n)] + rng.normal(0, 1.0, (n, d))).astype(np.float32)


def _recall(idx: np.ndarray, d_approx: np.ndarray, d_exact: np.ndarray) -> float:
    # distance-based: a hit is any neighbor at most the exact kth distance
    # (index-set comparison would punish ties)
    return float(np.mean(d_approx <= d_exact[:, -1][:, None] * (1 + 1e-6)))


class TestKMeans:
    def test_assignment_is_nearest_centroid(self) -> None:
        X = _blobs(3000, 8)
        cents, codes, d2 = kmeans_device(X, 32, iters=4, seed=0)
        full = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        np.testing.assert_array_equal(codes, full.argmin(1))
        np.testing.assert_allclose(d2, full.min(1), rtol=1e-3, atol=1e-3)

    def test_deterministic(self) -> None:
        X = _blobs(2000, 8)
        c1, k1, _ = kmeans_device(X, 16, seed=3)
        c2, k2, _ = kmeans_device(X, 16, seed=3)
        np.testing.assert_array_equal(k1, k2)
        np.testing.assert_array_equal(c1, c2)

    def test_member_table_is_a_partition(self) -> None:
        # every point appears exactly once, sentinels fill the rest —
        # including when clusters come out empty (Lloyd keeps their centroid)
        from squidpy_tpu.ops.ivf_knn import _pack_members

        X = _blobs(4000, 8)
        cents, codes, d2 = kmeans_device(X, 16, seed=0)
        cap = int(np.ceil(1.5 * 4000 / 16 / 8) * 8)
        members = _pack_members(codes, d2, cents, X, cap)
        real = members[members < 4000]
        assert real.size == 4000
        assert np.array_equal(np.sort(real), np.arange(4000))


class TestIvfKnn:
    def test_recall_blobs(self) -> None:
        X = _blobs(20_000, 16)
        de, ie = brute_force_knn(X, 15)
        da, ia = ivf_knn(X, 15, seed=1)
        assert _recall(ia, da, de) > 0.95

    def test_recall_wide_features(self) -> None:
        X = _blobs(20_000, 64, seed=4)
        de, _ = brute_force_knn(X, 10)
        da, ia = ivf_knn(X, 10, seed=1)
        assert _recall(ia, da, de) > 0.95

    def test_output_contract(self) -> None:
        X = _blobs(5_000, 16)
        d, i = ivf_knn(X, 8, seed=0)
        assert d.shape == (5_000, 8) and i.shape == (5_000, 8)
        assert (np.diff(d, axis=1) >= 0).all(), "rows must sort ascending"
        assert not (i == np.arange(5_000)[:, None]).any(), "self excluded"
        assert (i >= 0).all() and (i < 5_000).all()
        # distances are the true euclidean distances of the reported pairs
        picked = np.linalg.norm(X[i] - X[:, None, :], axis=-1)
        np.testing.assert_allclose(d, picked, rtol=1e-4, atol=1e-4)

    def test_deterministic(self) -> None:
        X = _blobs(5_000, 16)
        _, i1 = ivf_knn(X, 8, seed=5)
        _, i2 = ivf_knn(X, 8, seed=5)
        np.testing.assert_array_equal(i1, i2)

    def test_spill_path(self) -> None:
        # cap_factor=1.0 on skewed blobs forces member spill; recall holds
        rng = np.random.default_rng(0)
        X = np.concatenate(
            [rng.normal(0, 0.5, (8_000, 16)), rng.normal(6, 3.0, (4_000, 16))]
        ).astype(np.float32)
        de, _ = brute_force_knn(X, 10)
        da, ia = ivf_knn(X, 10, seed=1, cap_factor=1.0)
        assert _recall(ia, da, de) > 0.9

    def test_k_too_large_raises(self) -> None:
        with pytest.raises(ValueError, match="n_neighs"):
            ivf_knn(_blobs(100, 8), 100)

    def test_sampled_recall_of_exact_is_one(self) -> None:
        X = _blobs(3_000, 16)
        _, ie = brute_force_knn(X, 10)
        assert sampled_recall(X, ie, 10, n_samples=64, seed=0) == pytest.approx(1.0)

    def test_sampled_recall_detects_garbage(self) -> None:
        X = _blobs(3_000, 16)
        rng = np.random.default_rng(0)
        junk = rng.integers(0, 3_000, size=(3_000, 10)).astype(np.int32)
        assert sampled_recall(X, junk, 10, n_samples=64, seed=0) < 0.2


class TestSymmetrizeKnn:
    """Native CSR symmetrizer vs the scipy coo→csr + maximum(adj.T) oracle."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_scipy_maximum(self, seed: int) -> None:
        from scipy import sparse as sp

        from squidpy_tpu.native import symmetrize_knn

        rng = np.random.default_rng(seed)
        n, k = 500, 7
        idx = rng.integers(0, n, size=(n, k)).astype(np.int32)
        got = symmetrize_knn(idx)
        rows = np.repeat(np.arange(n), k)
        keep = idx.ravel() != rows  # native path drops self loops
        ref = sp.csr_matrix(
            (np.ones(keep.sum()), (rows[keep], idx.ravel()[keep])), shape=(n, n)
        )
        ref.sum_duplicates()
        ref.data[:] = 1.0  # duplicate in-row entries collapse to one edge
        ref = ref.maximum(ref.T)
        ref.sort_indices()
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got.indptr, ref.indptr)
        np.testing.assert_array_equal(got.indices, ref.indices)
        np.testing.assert_array_equal(got.data, ref.data)
        # symmetric with unit weights
        assert (got != got.T).nnz == 0
        assert set(np.unique(got.data)) <= {1.0}

    def test_out_of_range_and_self_ignored(self) -> None:
        from squidpy_tpu.native import symmetrize_knn

        idx = np.array([[1, 0, 99, -1], [0, 1, 1, 2], [-5, 2, 2, 2]], dtype=np.int32)
        got = symmetrize_knn(idx, n=3)
        dense = got.toarray()
        expected = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], dtype=float)
        np.testing.assert_array_equal(dense, expected)

    def test_shape_validation(self) -> None:
        from squidpy_tpu.native import symmetrize_knn

        with pytest.raises(ValueError, match="2D"):
            symmetrize_knn(np.zeros(5, dtype=np.int32))
        with pytest.raises(ValueError, match="rows"):
            symmetrize_knn(np.zeros((4, 3), dtype=np.int32), n=6)
