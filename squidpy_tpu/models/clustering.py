"""Clustering / embedding backends used by niche detection.

The reference delegates to scanpy (``pp.neighbors`` + ``tl.leiden`` via
leidenalg, ``tl.pca``, ``pp.scale``) and sklearn's GaussianMixture
(/root/reference/src/squidpy/gr/_niche.py:399-721). scanpy/leidenalg are not
available here, so:

- graph clustering uses the native C++ CSR Leiden
  (:func:`squidpy_tpu.native.leiden_csr` — local moves + the refinement
  phase, so communities are internally connected like leidenalg's output;
  labels are sorted by community size for determinism) over an exact kNN
  graph built by the device brute-force search. networkx's pure-Python
  Louvain (the r1-r3 backend) takes minutes-to-hours at 100k-1M cells and
  survives only as the small-fixture quality oracle in tests;
- PCA and GMM run on device at scale (:mod:`squidpy_tpu.ops.pca`,
  :mod:`squidpy_tpu.ops.gmm` — covariance-eigh PCA, full-covariance EM with
  sklearn's ``random_from_data`` init semantics); small inputs keep sklearn's
  exact host paths;
- z-scoring is plain numpy.
"""

from __future__ import annotations

from typing import Any

import numpy as np
from scipy import sparse as sp
from sklearn.decomposition import PCA
from sklearn.mixture import GaussianMixture

from squidpy_tpu.ops.knn import brute_force_knn

__all__ = ["knn_graph", "graph_cluster", "gmm_cluster", "pca_embed", "zscore"]


def _pad_feature_bucket(X: "np.ndarray | object") -> "np.ndarray | object":
    """Zero-pad the feature axis to a bucket size so different niche runs
    share device-kNN compiles.

    Appended zero columns leave every pairwise distance unchanged, while the
    remote compile of a new (n, d) shape costs 20-200 s here — far more than
    any warm search. Buckets: powers of two up to 256, then multiples of 128.
    Device arrays pad on device (a PCA embedding must not round-trip the
    ~25 MB/s tunnel just to gain zero columns).
    """
    import jax

    d = X.shape[1]
    for b in (8, 16, 32, 64, 128, 256):
        if d <= b:
            target = b
            break
    else:
        target = -(-d // 128) * 128
    if target == d:
        return X
    if isinstance(X, jax.Array):
        import jax.numpy as jnp

        return jnp.pad(X, ((0, 0), (0, target - d)))
    return np.pad(X, ((0, 0), (0, target - d)))


# above this the exact device sweep's lax.top_k merges dominate (200 s warm
# at 1M×16, 95% of the neighborhood flavor); the reference's own clustering
# graphs are approximate (scanpy pp.neighbors → pynndescent), so large
# feature-space graphs use the device IVF index (ops/ivf_knn) guarded by a
# sampled-recall check, with the PartialReduce full sweep (98.5%+ neighbor
# agreement — ops/knn.brute_force_knn_approx) as the fallback
_EXACT_KNN_MAX_N = 200_000
# below this sampled recall the IVF graph falls back to the full sweep
# (space partitioning leaks on unstructured high-dim data; the check is one
# cheap (256, n) exact sweep)
_IVF_RECALL_FLOOR = 0.92


def knn_graph(X: "np.ndarray | object", n_neighbors: int) -> sp.csr_matrix:
    """Symmetrized kNN adjacency of the rows of ``X`` (device MXU search);
    exact up to ``_EXACT_KNN_MAX_N`` rows, approximate beyond (matching the
    reference's approximate pynndescent graphs). Accepts device arrays
    without a host round-trip; the CSR symmetrization is native C++."""
    from squidpy_tpu.native import symmetrize_knn
    from squidpy_tpu.ops.ivf_knn import ivf_knn, sampled_recall
    from squidpy_tpu.ops.knn import brute_force_knn_approx
    from squidpy_tpu.utils import logg

    n = X.shape[0]
    k = min(n_neighbors, n - 1)
    import jax

    if not isinstance(X, jax.Array):
        X = np.asarray(X, dtype=np.float32)
    Xp = _pad_feature_bucket(X)
    if n <= _EXACT_KNN_MAX_N:
        _, idx = brute_force_knn(np.asarray(Xp, dtype=np.float32), k)
    else:
        _, idx = ivf_knn(Xp, k, return_distances=False)
        recall = sampled_recall(Xp, idx, k, n_samples=256, seed=0)
        if recall < _IVF_RECALL_FLOOR:
            logg.info(
                f"IVF kNN sampled recall {recall:.3f} < {_IVF_RECALL_FLOOR} "
                "(unstructured features) — falling back to the full sweep"
            )
            _, idx = brute_force_knn_approx(np.asarray(Xp, dtype=np.float32), k)
    return symmetrize_knn(idx, n)


def graph_cluster(
    X: np.ndarray,
    n_neighbors: int,
    resolution: float = 1.0,
    random_state: int = 0,
) -> np.ndarray:
    """Community labels ('0', '1', …) for rows of ``X`` via the native C++
    CSR Leiden on the kNN graph — matching scanpy's leiden semantics (which
    the reference drives through leidenalg's C core,
    /root/reference/src/squidpy/gr/_niche.py:399-457): refinement-phase
    aggregation, internally connected communities. Communities are numbered
    largest-first, matching scanpy's label convention."""
    from squidpy_tpu.native import leiden_csr

    adj = knn_graph(X, n_neighbors)
    labels, k = leiden_csr(adj, resolution=resolution, seed=int(random_state))
    sizes = np.bincount(labels, minlength=max(k, 1))
    order = np.argsort(-sizes, kind="stable")  # largest community -> '0'
    remap = np.empty(len(order), dtype=np.int64)
    remap[order] = np.arange(len(order))
    return remap[labels].astype(str)


# above this, sklearn's host EM loop costs ~0.3 ms/sample/iter on this
# 1-core host (30+ s at 100k) while the device EM amortizes to ~us/sample
_GMM_DEVICE_MIN_N = 20_000


def gmm_cluster(X: Any, n_components: int, random_state: int = 42) -> np.ndarray:
    """Gaussian-mixture cluster labels (reference: ``_get_GMM_clusters``,
    gr/_niche.py:708-721).

    Small inputs keep sklearn's exact host EM; at scale (or whenever the
    data is already a device array) the fit runs as batched MXU matmuls on
    device (:func:`squidpy_tpu.ops.gmm.gmm_em_labels` — same
    ``random_from_data`` init semantics, full covariances)."""
    import jax

    if len(X) >= _GMM_DEVICE_MIN_N or isinstance(X, jax.Array):
        from squidpy_tpu.ops.gmm import gmm_em_labels

        return gmm_em_labels(X, n_components, random_state)
    gmm = GaussianMixture(
        n_components=n_components,
        random_state=random_state,
        init_params="random_from_data",
    )
    gmm.fit(np.asarray(X))
    return gmm.predict(np.asarray(X))


def pca_embed(X: Any, n_comps: int | None = None, random_state: int = 0) -> np.ndarray:
    """PCA embedding (scanpy ``tl.pca`` default: min(50, min(shape)-1) comps).

    Device arrays embed on device (covariance + projection on the MXU, eigh
    of the tiny (d, d) on host — :func:`squidpy_tpu.ops.pca.pca_device`) and
    the result STAYS on device; so do huge host inputs where sklearn's f64
    SVD would dominate. Everything else keeps sklearn's exact host path."""
    import jax

    if n_comps is None:
        n_comps = min(50, min(X.shape) - 1)
    n_comps = max(1, min(n_comps, min(X.shape) - 1))
    if isinstance(X, jax.Array) or (getattr(X, "size", 0) >= 100_000_000):
        from squidpy_tpu.ops.pca import pca_device

        import jax.numpy as jnp

        return pca_device(jnp.asarray(X, jnp.float32), n_comps)
    return PCA(n_components=n_comps, svd_solver="auto", random_state=random_state).fit_transform(
        np.asarray(X, dtype=np.float64)
    )


def zscore(X: "np.ndarray | object") -> "np.ndarray | object":
    """Column z-score with zero-variance guard (scanpy ``pp.scale``).

    Device arrays stay on device (f32) — the niche feature blocks feed the
    device kNN next and must not round-trip the tunnel."""
    import jax

    if isinstance(X, jax.Array):
        import jax.numpy as jnp

        mu = jnp.mean(X, axis=0)
        sd = jnp.std(X, axis=0)
        return (X - mu) / jnp.where(sd == 0, 1.0, sd)
    X = np.asarray(X, dtype=np.float64)
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd[sd == 0] = 1.0
    return (X - mu) / sd
