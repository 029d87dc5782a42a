"""Sepal at Visium-HD scale (VERDICT r4 #6): 100k-1M grid bins × 1k genes.

The reference caps the same workload at thread-pool-over-genes numba
(/root/reference/src/squidpy/gr/_sepal.py:37,209-305); here the per-gene
diffusion runs as one batched device while_loop per gene block. This script
measures warm runtimes on a square lattice (max_neighs=4, the Visium-HD
geometry) and documents the iteration-count distribution at scale.

Run: python examples/sepal_scale.py [n_bins] [n_genes]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd
from scipy import sparse as sp

try:
    import squidpy_tpu as sq  # noqa: F401
except ModuleNotFoundError:  # running the script in place, package not installed
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import squidpy_tpu as sq  # noqa: F401


def _grid_adata(rng: np.random.Generator, side: int, g: int) -> "sq.AnnData":
    n = side * side
    yy, xx = np.mgrid[:side, :side]
    spatial = np.column_stack([xx.ravel(), yy.ravel()]).astype(np.float64)

    # spatially variable genes: smooth Gaussian bumps of varying width over
    # the lattice (slow to diffuse flat) + spatially random genes (fast)
    n_sv = g // 4
    # INTEGRAL counts (floored gamma, bump-modulated): the device-expression
    # handle then ships X as u8 — a (1M, 1024) f32 panel costs ~160 s through
    # the ~25 MB/s tunnel, an artifact of synthetic float data, not of the
    # kernel (real Visium-HD bins are integer counts). Poisson(λ) draws at
    # (1M, 1024) cost ~600 s on this 1-core host — the multiplicative gamma
    # form keeps the same spatial structure at ~1/6 the setup cost.
    X = rng.gamma(2.0, 1.0, size=(n, g)).astype(np.float32)
    cy = rng.uniform(0, side, size=n_sv).astype(np.float32)
    cx = rng.uniform(0, side, size=n_sv).astype(np.float32)
    w = rng.uniform(side / 20, side / 4, size=n_sv).astype(np.float32)
    sx = spatial[:, 0].astype(np.float32)
    sy = spatial[:, 1].astype(np.float32)
    # f32 throughout: this host's f64 transcendentals run scalar libm
    # (~2.7M elem/s — 256 bumps over 1M points cost minutes in f64)
    for j in range(n_sv):
        d2 = (sx - cx[j]) ** 2
        d2 += (sy - cy[j]) ** 2
        d2 *= np.float32(-1.0 / (2 * w[j] ** 2))
        np.exp(d2, out=d2)
        d2 *= np.float32(10.0)
        d2 += np.float32(1.0)
        X[:, j] *= d2
    np.floor(X, out=X)

    rows, cols = [], []
    idx = np.arange(n).reshape(side, side)
    rows.append(idx[:, :-1].ravel()); cols.append(idx[:, 1:].ravel())
    rows.append(idx[:-1, :].ravel()); cols.append(idx[1:, :].ravel())
    r = np.concatenate(rows); c = np.concatenate(cols)
    adj = sp.csr_matrix(
        (np.ones(2 * len(r)), (np.r_[r, c], np.r_[c, r])), shape=(n, n)
    )

    adata = sq.AnnData(X=X, obs=pd.DataFrame(index=[str(i) for i in range(n)]))
    adata.var_names = [f"G{i}" for i in range(g)]
    adata.obsm["spatial"] = spatial
    adata.obsp["spatial_connectivities"] = adj
    return adata


def main() -> None:
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    side = int(round(n_target ** 0.5))
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    adata = _grid_adata(rng, side, g)
    print(f"[setup] {side}x{side} grid ({side * side} bins) x {g} genes: "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    # ENTROPY-CONVERGENCE BEHAVIOR AT SCALE (measured): the deltas scale
    # ~1/n, so the reference's default thresh=1e-8 (tuned at ~5-10k Visium
    # spots) saturates at 1M bins — every gene "converges" at iteration 1
    # and the score stops discriminating; a 1/n-scaled threshold (1e-10)
    # overshoots the other way (tens of thousands of iterations). Users at
    # Visium-HD scale must pick thresh for their n; for the SCALE
    # measurement the stable quantity is cost per diffusion iteration, so
    # the timed runs use a fixed budget (thresh=0 → exactly n_iter steps).
    budget = 300

    # cold (compiles) then warm with fresh expression (axon may cache
    # identical (executable, inputs) re-runs)
    t0 = time.perf_counter()
    sq.gr.sepal(adata, max_neighs=4, n_iter=budget, thresh=0.0, copy=True)
    print(f"[sepal cold] {time.perf_counter() - t0:.1f}s", flush=True)
    for it in range(2):
        # fresh input bytes per timed run (the axon runtime can serve
        # identical (executable, inputs) re-runs from a cache) — a one-row
        # grid roll keeps distributions and spatial patterns intact
        adata.X = np.roll(adata.X, side, axis=0)
        t0 = time.perf_counter()
        sq.gr.sepal(adata, max_neighs=4, n_iter=budget, thresh=0.0, copy=True)
        dt = time.perf_counter() - t0
        n_blocks = -(-g // 256) if side * side > 270_000_000 // 512 else -(-g // 512)
        print(
            f"[sepal warm run{it}] {dt:.1f}s for {g} genes x {budget} fixed iterations "
            f"({1000 * dt / (budget * n_blocks):.1f} ms/iter/block)",
            flush=True,
        )

    # score DISCRIMINATION check at the default-threshold regime (smaller
    # grid where thresh=1e-8 resolves): spatial genes must outscore noise
    sub = 316
    adata_s = _grid_adata(np.random.default_rng(7), sub, 256)
    sq.gr.sepal(adata_s, max_neighs=4, copy=False)
    df = adata_s.uns["sepal_score"]
    sv = df.loc[[f"G{i}" for i in range(64)], "sepal_score"].mean()
    bg = df.loc[[f"G{i}" for i in range(64, 256)], "sepal_score"].mean()
    print(f"[score check @ {sub * sub} bins] spatial-genes {sv:.4f} vs background {bg:.4f}", flush=True)


if __name__ == "__main__":
    main()
