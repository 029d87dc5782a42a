"""End-to-end integration at 100k cells on one chip: graph -> every stat.

Synthetic Xenium-like data (100k cells, 2000 genes, 12 clusters) through the
public API: kNN graph, nhood enrichment (perm + analytic), Moran + Geary,
co-occurrence, Ripley L. Prints per-phase wall clock (forced completion —
each phase ends in host arrays).

Run from /root/repo: PYTHONPATH=/root/repo python examples/integration_100k.py
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd

try:
    import squidpy_tpu as sq
except ModuleNotFoundError:  # running the script in place, package not installed
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import squidpy_tpu as sq
from squidpy_tpu._core.anndata import AnnData

N, G, C = 100_000, 2000, 12


def main() -> None:
    rng = np.random.default_rng(0)
    adata = AnnData(
        X=rng.poisson(1.0, size=(N, G)).astype(np.float32),
        obs=pd.DataFrame(
            {"leiden": pd.Categorical(rng.integers(0, C, N).astype(str))},
            index=[f"c{i}" for i in range(N)],
        ),
        var=pd.DataFrame(index=[f"g{i}" for i in range(G)]),
    )
    adata.obsm["spatial"] = rng.uniform(0, 5000, (N, 2))

    t_all = time.time()
    phases: list[tuple[str, float]] = []

    def phase(name: str, fn) -> None:
        t0 = time.time()
        fn()
        phases.append((name, time.time() - t0))
        print(f"{name:28s} {phases[-1][1]:7.1f} s", flush=True)

    phase("knn graph (k=6)", lambda: sq.gr.spatial_neighbors_knn(adata, n_neighs=6))
    phase("nhood 1000 perms", lambda: sq.gr.nhood_enrichment(adata, "leiden", n_perms=1000, seed=0))
    phase("nhood analytic", lambda: sq.gr.nhood_enrichment(adata, "leiden", mode="analytic"))
    phase("interaction matrix", lambda: sq.gr.interaction_matrix(adata, "leiden"))
    phase("moran 2000 genes", lambda: sq.gr.spatial_autocorr(adata, mode="moran"))
    phase("geary analytic", lambda: sq.gr.spatial_autocorr(adata, mode="geary"))
    phase("co-occurrence 50 bins", lambda: sq.gr.co_occurrence(adata, "leiden"))
    phase(
        "ripley L 20 sims",
        lambda: sq.gr.ripley(adata, "leiden", mode="L", n_simulations=20, seed=0),
    )

    z = adata.uns["leiden_nhood_enrichment"]["zscore"]
    moran = adata.uns["moranI"]["I"].to_numpy()
    assert np.isfinite(moran).all()
    print(f"\nmax |z| = {np.nanmax(np.abs(z)):.2f}, max Moran I = {moran.max():.4f} (null data)")
    print(f"total: {time.time() - t_all:.1f} s (backend: {__import__('jax').devices()[0].platform})")


if __name__ == "__main__":
    main()
