"""calculate_niche flavors at 100k cells + 1M clustering smoke (VERDICT r3 #5).

The clustering backend is the native C++ CSR Leiden
(squidpy_tpu/native/louvain.cpp, leiden_csr since round 5) — the pure-Python
path this replaces needs minutes-to-hours at these sizes.

Run: python examples/niche_100k.py [n_cells]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

try:
    import squidpy_tpu as sq  # noqa: F401
except ModuleNotFoundError:  # running the script in place, package not installed
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import squidpy_tpu as sq  # noqa: F401


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    rng = np.random.default_rng(0)
    adata = sq.AnnData(
        X=rng.poisson(1.0, size=(n, 40)).astype(np.float32),
        obs=pd.DataFrame({"ct": pd.Categorical(rng.integers(0, 12, size=n).astype(str))}),
    )
    adata.var_names = [f"G{i}" for i in range(40)]
    adata.obsm["spatial"] = rng.uniform(0, 10_000, size=(n, 2))
    t0 = time.perf_counter()
    sq.gr.spatial_neighbors_knn(adata, n_neighs=6)
    print(f"[graph] {time.perf_counter() - t0:.1f}s")

    for flavor, kw in [
        ("neighborhood", dict(groups="ct", resolutions=1.0, n_neighbors=15)),
        ("utag", dict(resolutions=1.0, n_neighbors=15)),
        ("cellcharter", dict(groups="ct", n_components=8, n_neighbors=15)),
    ]:
        t0 = time.perf_counter()
        sq.gr.calculate_niche(adata, flavor=flavor, **kw)
        dt = time.perf_counter() - t0
        col = [c for c in adata.obs.columns if "niche" in c][-1]
        print(f"[{flavor}] {dt:.1f}s -> {adata.obs[col].nunique()} niches ({col})")

    # 1M-node native Leiden smoke (kNN graph on spatial coords)
    from scipy import sparse as sp
    from scipy.spatial import cKDTree

    from squidpy_tpu.native import leiden_csr

    m = 1_000_000
    pts = rng.uniform(0, 10_000, size=(m, 2))
    t0 = time.perf_counter()
    _, idx = cKDTree(pts).query(pts, k=7)
    rows = np.repeat(np.arange(m), 6)
    adj = sp.csr_matrix((np.ones(m * 6), (rows, idx[:, 1:].ravel())), shape=(m, m))
    adj = adj.maximum(adj.T)
    t_g = time.perf_counter() - t0
    t0 = time.perf_counter()
    labels, k = leiden_csr(adj, seed=0)
    print(f"[leiden 1M smoke] graph {t_g:.1f}s, cluster {time.perf_counter() - t0:.1f}s -> {k} communities")


if __name__ == "__main__":
    main()
