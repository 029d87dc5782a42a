"""Device k-hop ring/reach expansion (ops/hops.py) vs the scipy oracle.

The scipy path in gr/_niche.py (``_setdiag``/``_hop``/``_normalize``) is the
reference-parity oracle (it reproduces /root/reference/src/squidpy/gr/
_niche.py:667-690 bit-for-bit); these tests pin the device kernel to it,
including the quirky artifacts of the ``prod > visited`` rule (self-loops
enter ring-2 whenever a node has >= 2 two-cycles).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from scipy import sparse as sps
from scipy.spatial import cKDTree

from squidpy_tpu.gr._niche import (
    _cellcharter_hop_features,
    _hop,
    _neighborhood_profile,
    _nhood_profiles_device,
    _normalize,
    _setdiag,
)
from squidpy_tpu.ops.hops import ell_sentinel, hop_reach, hop_rings


def spatial_knn(n, k, seed, weighted=False):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 100, (n, 2))
    _, idx = cKDTree(pts).query(pts, k=k + 1)
    rows = np.repeat(np.arange(n), k)
    w = rng.uniform(0.5, 2.0, n * k) if weighted else np.ones(n * k)
    A = sps.csr_matrix((w, (rows, idx[:, 1:].ravel())), shape=(n, n))
    A = A.maximum(A.T).tocsr()
    A.setdiag(0)
    A.eliminate_zeros()
    return A


def scipy_rings(A, distance):
    adj_hop = _setdiag(A, 0)
    vis = _setdiag(A.copy(), 1)
    out = []
    for _ in range(2, distance + 1):
        adj_hop, vis = _hop(adj_hop, A, vis)
        out.append(sps.csr_matrix(adj_hop))
    return out


def row_sets(csr, i):
    return set(csr.indices[csr.indptr[i] : csr.indptr[i + 1]].tolist())


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("weighted", [False, True])
def test_hop_rings_match_scipy(seed, weighted):
    A = spatial_knn(400, 4, seed, weighted)
    n = A.shape[0]
    bi, bw = ell_sentinel(A)
    dev = hop_rings(bi, bw, 3)
    ref = scipy_rings(A, 3)
    assert len(dev) == len(ref) == 2
    for (didx, ddeg), r in zip(dev, ref):
        didx, ddeg = np.asarray(didx), np.asarray(ddeg)
        for i in range(n):
            assert set(didx[i][didx[i] < n].tolist()) == row_sets(r, i)
        np.testing.assert_array_equal(ddeg, np.diff(r.indptr))


def test_hop_rings_self_loop_quirk():
    # deg >= 2 nodes re-enter ring-2 as self loops: prod[i,i] = #2-cycles > 1
    A = sps.csr_matrix(np.array([[0, 1, 1, 0], [1, 0, 1, 0], [1, 1, 0, 1], [0, 0, 1, 0]], dtype=float))
    bi, bw = ell_sentinel(A)
    (idx, deg), = hop_rings(bi, bw, 2)
    idx = np.asarray(idx)
    ref = scipy_rings(A, 2)[0]
    for i in range(4):
        assert set(idx[i][idx[i] < 4].tolist()) == row_sets(ref, i)
    assert 0 in set(idx[0][idx[0] < 4].tolist())  # the self loop survived


@pytest.mark.parametrize("seed", [0])
def test_hop_reach_matches_matrix_powers(seed):
    A = spatial_knn(400, 4, seed)
    n = A.shape[0]
    bi, bw = ell_sentinel(A)
    dev = hop_reach(bi, bw, 3)
    hop = A.copy()
    for didx, ddeg in dev:
        hop = hop @ A
        r = sps.csr_matrix(hop)
        didx = np.asarray(didx)
        for i in range(n):
            assert set(didx[i][didx[i] < n].tolist()) == row_sets(r, i)


def test_ell_sentinel_round_trip():
    A = spatial_knn(200, 3, 7, weighted=True)
    idx, w = ell_sentinel(A)
    n = A.shape[0]
    for i in range(n):
        live = idx[i] < n
        got = dict(zip(idx[i][live].tolist(), w[i][live].tolist()))
        want = {
            int(j): float(v)
            for j, v in zip(A.indices[A.indptr[i] : A.indptr[i + 1]], A.data[A.indptr[i] : A.indptr[i + 1]])
        }
        assert got.keys() == want.keys()
        for j in got:
            assert got[j] == pytest.approx(want[j], rel=1e-6)


@pytest.mark.parametrize("aggregation", ["mean", "variance"])
def test_cellcharter_device_features_match_host(aggregation):
    A = spatial_knn(500, 4, 3)
    rng = np.random.default_rng(0)
    x = rng.poisson(3.0, (500, 7)).astype(np.float32)
    x_dev = jnp.asarray(x)

    arr_dev = np.asarray(_cellcharter_hop_features(A, x_dev, 3, aggregation))

    # host oracle (the scipy branch)
    aggregated = [x]
    adj_hop = _setdiag(A, 0)
    vis = _setdiag(A.copy(), 1)
    for k in range(1, 4):
        if k > 1:
            adj_hop, vis = _hop(adj_hop, A, vis)
        W = sps.csr_matrix(_normalize(adj_hop))
        mean_m = np.asarray((W @ x).astype(np.float64))
        if aggregation == "mean":
            aggregated.append(mean_m)
        else:
            aggregated.append(np.asarray(W @ (x * x)) - mean_m * mean_m)
    arr_host = np.hstack(aggregated)
    np.testing.assert_allclose(arr_dev, arr_host, rtol=2e-5, atol=2e-5)


def test_cellcharter_device_rejects_bad_aggregation():
    A = spatial_knn(100, 3, 0)
    with pytest.raises(ValueError, match="aggregation"):
        _cellcharter_hop_features(A, jnp.zeros((100, 2), jnp.float32), 2, "median")


class _MiniAdata:
    def __init__(self, labels):
        self.obs = pd.DataFrame({"ct": pd.Categorical(labels)})
        self.obs.index = pd.Index([f"c{i}" for i in range(len(labels))])
        self.n_obs = len(labels)


@pytest.mark.parametrize("abs_nhood", [False, True])
@pytest.mark.parametrize("distance", [1, 3])
def test_nhood_profile_device_matches_host(abs_nhood, distance):
    A = spatial_knn(450, 4, 5)
    rng = np.random.default_rng(1)
    adata = _MiniAdata(rng.choice(["a", "b", "c"], 450))

    prof_dev = _nhood_profiles_device(adata, "ct", A, abs_nhood, distance, [1.0, 0.5, 0.25][:distance])

    prof_host = _neighborhood_profile(adata, "ct", A, abs_nhood)
    if distance > 1:
        weights = [1.0, 0.5, 0.25][:distance]
        weighted = weights[0] * prof_host
        hop_adj = A.copy()
        for n_hop in range(1, distance):
            hop_adj = hop_adj @ A
            weighted = weighted + weights[n_hop] * _neighborhood_profile(adata, "ct", hop_adj, abs_nhood)
        if not abs_nhood:
            weighted = weighted / sum(weights)
        prof_host = weighted

    np.testing.assert_allclose(
        prof_dev.to_numpy(dtype=float), prof_host.to_numpy(dtype=float), rtol=1e-6, atol=1e-6
    )
    assert list(prof_dev.index) == list(adata.obs.index)
