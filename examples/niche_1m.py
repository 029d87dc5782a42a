"""On-chip k-hop niche path at 1M cells (VERDICT r4 #2).

Measures the device hop-ring/hop-reach niche flavors at 1M cells warm
(cellcharter distance=3, neighborhood distance=3) and parity-checks the
device hop features against the host scipy-spgemm oracle ON CHIP at 50k —
the CPU-mesh tests cannot see MXU/bf16 truncation traps, this run can.

Run: python examples/niche_1m.py [n_cells]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

try:
    import squidpy_tpu as sq  # noqa: F401
except ModuleNotFoundError:  # running the script in place, package not installed
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import squidpy_tpu as sq  # noqa: F401


def _make_adata(rng: np.random.Generator, n: int, g: int = 40) -> "sq.AnnData":
    adata = sq.AnnData(
        X=rng.poisson(1.0, size=(n, g)).astype(np.float32),
        obs=pd.DataFrame({"ct": pd.Categorical(rng.integers(0, 12, size=n).astype(str))}),
    )
    adata.var_names = [f"G{i}" for i in range(g)]
    adata.obsm["spatial"] = rng.uniform(0, 10_000, size=(n, 2))
    sq.gr.spatial_neighbors_knn(adata, n_neighs=6)
    return adata


def parity_50k() -> None:
    """Device hop features == host spgemm chain, verified on the real chip."""
    import jax.numpy as jnp
    from scipy import sparse as sps

    from squidpy_tpu.gr._niche import (
        _cellcharter_hop_features,
        _hop,
        _normalize,
        _setdiag,
    )
    from squidpy_tpu._core.graph import SpatialGraph

    rng = np.random.default_rng(7)
    n, g, distance = 50_000, 24, 3
    adata = _make_adata(rng, n, g)
    adj = sps.csr_matrix(adata.obsp["spatial_connectivities"])
    x = np.asarray(adata.X, dtype=np.float32)
    x_dev = jnp.asarray(x)

    t0 = time.perf_counter()
    got = np.asarray(_cellcharter_hop_features(adj, x_dev, distance, "mean"))
    print(f"[parity] device hop features (50k, d=3): {time.perf_counter() - t0:.1f}s", flush=True)

    # host oracle: the reference's exact _setdiag/_hop/_normalize chain
    aggregated = [x]
    adj_hop = _setdiag(adj, 0)
    adj_visited = _setdiag(adj.copy(), 1)
    for k in range(1, distance + 1):
        if k > 1:
            adj_hop, adj_visited = _hop(adj_hop, adj, adj_visited)
        graph = SpatialGraph.from_csr(sps.csr_matrix(_normalize(adj_hop)))
        aggregated.append(np.asarray(graph.spmv(x_dev)))
    want = np.concatenate(aggregated, axis=1)
    err = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-6))
    assert err < 1e-4, f"on-chip hop-feature parity failed: max rel err {err:.2e}"
    print(f"[parity] OK (max rel err {err:.2e})", flush=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    parity_50k()

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    adata = _make_adata(rng, n)
    print(f"[setup] adata + graph at {n}: {time.perf_counter() - t0:.1f}s", flush=True)

    # first call pays remote compiles; the two timed runs use fresh X so the
    # axon executable cache cannot serve identical (executable, inputs) pairs
    for flavor, kw in [
        ("cellcharter", dict(groups="ct", n_components=8, n_neighbors=15)),
        ("neighborhood", dict(groups="ct", resolutions=1.0, n_neighbors=15, distance=3)),
    ]:
        sq.gr.calculate_niche(adata, flavor=flavor, **kw)
        times = []
        for it in range(2):
            adata.X = rng.poisson(1.0, size=adata.shape).astype(np.float32)
            t0 = time.perf_counter()
            sq.gr.calculate_niche(adata, flavor=flavor, **kw)
            times.append(time.perf_counter() - t0)
        col = [c for c in adata.obs.columns if "niche" in c][-1]
        print(
            f"[{flavor} @ {n}] warm {min(times):.1f}s (runs: {', '.join(f'{t:.1f}' for t in times)}) "
            f"-> {adata.obs[col].nunique()} niches",
            flush=True,
        )


if __name__ == "__main__":
    main()
