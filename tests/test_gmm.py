"""Device full-covariance GMM EM (ops/gmm.py) + kNN feature-dim bucketing.

The reference's cellcharter flavor uses sklearn's GaussianMixture
(/root/reference/src/squidpy/gr/_niche.py:708-721); at scale squidpy_tpu
replaces the host EM loop with batched MXU matmuls. Quality is compared via
cluster recovery (ARI), not label trajectories (f32 + different RNG).
"""

from __future__ import annotations

import numpy as np
import pytest
from sklearn.metrics import adjusted_rand_score

from squidpy_tpu.models.clustering import _GMM_DEVICE_MIN_N, _pad_feature_bucket, gmm_cluster, knn_graph
from squidpy_tpu.ops.gmm import gmm_em_labels


def _blobs(n: int, k: int, d: int, seed: int, sep: float = 8.0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=sep, size=(k, d))
    labels = rng.integers(0, k, size=n)
    X = centers[labels] + rng.normal(size=(n, d))
    return X.astype(np.float32), labels


class TestDeviceGMM:
    def test_recovers_blobs(self):
        # random-init EM lands in a two-blobs-one-component local optimum on
        # some seeds — sklearn does the same (measured: ARI ~0.64 on 3 of 4
        # seeds for this generator); accept if any of a few seeds recovers
        X, truth = _blobs(30_000, 4, 8, seed=0)
        best = 0.0
        for seed in (0, 1, 2, 3, 4):
            labels = gmm_em_labels(X, 4, random_state=seed)
            best = max(best, adjusted_rand_score(truth, labels))
            if best > 0.95:
                break
        assert best > 0.95

    def test_matches_sklearn_quality(self):
        from sklearn.mixture import GaussianMixture

        X, truth = _blobs(5_000, 3, 5, seed=1)
        dev = gmm_em_labels(X, 3, random_state=1)
        sk = (
            GaussianMixture(n_components=3, random_state=1, init_params="random_from_data")
            .fit(X)
            .predict(X)
        )
        # both must recover the mixture; trajectories differ
        assert adjusted_rand_score(truth, dev) > 0.9
        assert adjusted_rand_score(sk, dev) > 0.9

    def test_deterministic(self):
        X, _ = _blobs(4_000, 3, 6, seed=2)
        a = gmm_em_labels(X, 3, random_state=7)
        b = gmm_em_labels(X, 3, random_state=7)
        np.testing.assert_array_equal(a, b)

    def test_anisotropic_covariance(self):
        """Full (not diagonal) covariances: stretched clusters that a
        spherical model would split are recovered."""
        # stretch kept moderate: at x-std 10 the Voronoi init splits along x
        # and full-covariance EM (sklearn included — measured ARI ~0 on all
        # seeds) stays in that optimum
        rng = np.random.default_rng(3)
        n = 6_000
        stretch = np.array([[3.0, 0.0], [0.0, 0.5]])
        a = rng.normal(size=(n // 2, 2)) @ stretch
        b = rng.normal(size=(n // 2, 2)) @ stretch + np.array([0.0, 8.0])
        X = np.vstack([a, b]).astype(np.float32)
        truth = np.repeat([0, 1], n // 2)
        best = 0.0
        for seed in (0, 1, 2, 3, 4):
            labels = gmm_em_labels(X, 2, random_state=seed)
            best = max(best, adjusted_rand_score(truth, labels))
            if best > 0.9:
                break
        assert best > 0.9

    def test_n_components_exceeds_n(self):
        X, _ = _blobs(10, 2, 3, seed=0)
        with pytest.raises(ValueError, match="n_components"):
            gmm_em_labels(X, 11)

    def test_dispatch_threshold(self, monkeypatch):
        """gmm_cluster routes to the device EM at scale, sklearn below."""
        calls = {"device": 0}
        import squidpy_tpu.ops.gmm as gmm_mod

        real = gmm_mod.gmm_em_labels

        def spy(*a, **k):
            calls["device"] += 1
            return real(*a, **k)

        monkeypatch.setattr(gmm_mod, "gmm_em_labels", spy)
        X_small, _ = _blobs(500, 2, 4, seed=4)
        gmm_cluster(X_small, 2, 0)
        assert calls["device"] == 0
        X_big, _ = _blobs(_GMM_DEVICE_MIN_N, 2, 4, seed=4)
        gmm_cluster(X_big, 2, 0)
        assert calls["device"] == 1


class TestKnnFeatureBucket:
    def test_zero_pad_preserves_distances(self):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(64, 12)).astype(np.float32)
        Xp = _pad_feature_bucket(X)
        assert Xp.shape == (64, 16)
        d0 = ((X[:, None] - X[None]) ** 2).sum(-1)
        d1 = ((Xp[:, None] - Xp[None]) ** 2).sum(-1)
        # identical mathematically; numpy's pairwise-summation tree differs
        # between 12 and 16 addends, so bitwise equality is 1 ulp off
        np.testing.assert_allclose(d0, d1, rtol=1e-6)

    @pytest.mark.parametrize("d,target", [(3, 8), (8, 8), (12, 16), (40, 64), (50, 64), (200, 256), (300, 384)])
    def test_bucket_sizes(self, d, target):
        X = np.zeros((2, d), dtype=np.float32)
        assert _pad_feature_bucket(X).shape[1] == target

    def test_knn_graph_invariant_to_padding(self):
        rng = np.random.default_rng(1)
        X = rng.normal(size=(300, 12)).astype(np.float32)
        g_bucketed = knn_graph(X, 5)
        # bucketing cannot change the neighbor sets (continuous data, no ties)
        from squidpy_tpu.ops.knn import brute_force_knn

        _, idx = brute_force_knn(X, 5)
        import scipy.sparse as sp

        rows = np.repeat(np.arange(300), 5)
        g_plain = sp.csr_matrix((np.ones(300 * 5), (rows, idx.ravel())), shape=(300, 300))
        g_plain = g_plain.maximum(g_plain.T)
        assert (g_bucketed != g_plain).nnz == 0


class TestDevicePCA:
    """ops/pca.py — covariance-eigh PCA used by the device niche pipelines."""

    def test_matches_sklearn_up_to_sign(self):
        from sklearn.decomposition import PCA

        from squidpy_tpu.ops.pca import pca_device

        rng = np.random.default_rng(0)
        # well-separated spectrum so component order is unambiguous
        X = (rng.normal(size=(2000, 10)) * np.array([16, 8, 4, 2, 1, 0.5, 0.25, 0.1, 0.05, 0.01])).astype(
            np.float32
        )
        dev = np.asarray(pca_device(X, 4))
        sk = PCA(n_components=4).fit_transform(X.astype(np.float64))
        for j in range(4):
            agree = np.abs(np.corrcoef(dev[:, j], sk[:, j])[0, 1])
            assert agree > 0.9999, f"component {j}: |corr|={agree}"

    def test_distances_preserved_at_full_rank(self):
        """Full-rank projection is an orthogonal change of basis."""
        from squidpy_tpu.ops.pca import pca_device

        rng = np.random.default_rng(1)
        X = rng.normal(size=(300, 6)).astype(np.float32)
        emb = np.asarray(pca_device(X, 6))
        d0 = ((X[:, None] - X[None]) ** 2).sum(-1)
        d1 = ((emb[:, None] - emb[None]) ** 2).sum(-1)
        np.testing.assert_allclose(d0, d1, rtol=2e-4, atol=1e-4)

    def test_pca_embed_dispatch(self):
        """jax-array input routes to the device path and stays on device."""
        import jax
        import jax.numpy as jnp

        from squidpy_tpu.models.clustering import pca_embed

        rng = np.random.default_rng(2)
        X = rng.normal(size=(500, 8)).astype(np.float32)
        out_dev = pca_embed(jnp.asarray(X), 3)
        assert isinstance(out_dev, jax.Array) and out_dev.shape == (500, 3)
        out_host = pca_embed(X, 3)
        assert isinstance(out_host, np.ndarray)
        # same subspace: per-component correlation up to sign
        a, b = np.asarray(out_dev), out_host
        for j in range(3):
            assert abs(np.corrcoef(a[:, j], b[:, j])[0, 1]) > 0.999

    def test_deterministic_sign_convention(self):
        from squidpy_tpu.ops.pca import pca_device

        rng = np.random.default_rng(3)
        X = rng.normal(size=(400, 5)).astype(np.float32)
        a = np.asarray(pca_device(X, 3))
        b = np.asarray(pca_device(X, 3))
        np.testing.assert_array_equal(a, b)
        # largest-|loading| convention: recompute loadings and check positivity
        Xc = X - X.mean(0)
        cov = (Xc.T @ Xc) / (len(X) - 1)
        w, v = np.linalg.eigh(cov.astype(np.float64))
        v = v[:, ::-1][:, :3]
        for j in range(3):
            i = np.argmax(np.abs(v[:, j]))
            # the embedding's correlation with the raw (unflipped) eigvec
            # matches the sign the convention dictates
            c = np.corrcoef(a[:, j], Xc @ v[:, j])[0, 1]
            assert np.sign(c) == np.sign(v[i, j]) or abs(c) < 0.99
