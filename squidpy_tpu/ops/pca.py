"""PCA embedding with a device covariance path.

The reference computes PCA on host via scanpy/sklearn SVD
(/root/reference/src/squidpy/gr/_niche.py:399-457 drives ``sc.pp.pca``).
At niche scales the matrix to embed is already ON the device (graph-smoothed
expression from the SpMV) and the host round-trip through this
environment's ~17-30 MB/s tunnel costs far more than the math — so the
device path computes the ``(d, d)`` covariance with one HIGHEST-precision
MXU matmul (n is the contraction axis: the TPU-shaped direction),
eigendecomposes the tiny host copy in f64, and projects on device.

Sign convention: each component is flipped so its largest-|loading| entry
is positive (deterministic; sklearn's svd_flip analog). Orthogonal-transform
consumers (kNN, full-covariance GMM, Louvain on the kNN graph) are invariant
to the convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pca_device"]

_HI = jax.lax.Precision.HIGHEST


@jax.jit
def _cov(X: jax.Array) -> tuple[jax.Array, jax.Array]:
    mu = jnp.mean(X, axis=0)
    Xc = X - mu
    n = X.shape[0]
    cov = jnp.dot(Xc.T, Xc, precision=_HI) / max(n - 1, 1)
    return cov, mu


@jax.jit
def _project(X: jax.Array, mu: jax.Array, comps: jax.Array) -> jax.Array:
    return jnp.dot(X - mu, comps, precision=_HI)


def pca_device(X: jax.Array, n_comps: int) -> jax.Array:
    """Top-``n_comps`` PCA embedding of device array ``X`` — ``(n, n_comps)``
    on device; only the ``(d, d)`` covariance crosses to host."""
    X = jnp.asarray(X, jnp.float32)
    cov, mu = _cov(X)
    cov_h = np.asarray(cov, dtype=np.float64)  # (d, d): tiny
    w, v = np.linalg.eigh(cov_h)               # ascending eigenvalues
    v = v[:, ::-1][:, :n_comps]
    flip = np.sign(v[np.argmax(np.abs(v), axis=0), np.arange(v.shape[1])])
    flip[flip == 0] = 1.0
    comps = np.ascontiguousarray(v * flip)
    return _project(X, mu, jnp.asarray(comps, jnp.float32))
