"""Full-scale permutation-mode Moran's I (VERDICT r3 task 3).

15,360 genes × 100 permutations × 1M cells (k=6 kNN graph), forced host
readbacks. The device loop is exactly `spatial_autocorr`'s `_score_blocks`
perm path (SpMV per 512-gene block; per-perm O(n) gather-dots over 1024-gene
superblocks with bf16-gathered u); the expression blocks are synthesized on
the fly because a dense (1M, 15k) X does not fit host memory.

Run: python examples/moran_perm_15k.py [n_cells] [n_genes] [n_perms]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import squidpy_tpu  # noqa: F401  (platform init)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_genes = int(sys.argv[2]) if len(sys.argv) > 2 else 15_360
    n_perms = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    import jax.numpy as jnp
    from scipy import sparse as sp
    from scipy.spatial import cKDTree

    from squidpy_tpu._core.graph import SpatialGraph
    from squidpy_tpu._core.index_cipher import cipher_index_batch
    from squidpy_tpu._core.rng import spawn_keys
    from squidpy_tpu.ops.autocorr import (
        moran_perm_scores,
        moran_scores_from_u,
        spmv_genes,
    )

    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 10_000, size=(n, 2)).astype(np.float32)
    t0 = time.perf_counter()
    _, idx = cKDTree(coords).query(coords, k=7)
    rows = np.repeat(np.arange(n), 6)
    g = sp.csr_matrix((np.ones(n * 6, np.float32), (rows, idx[:, 1:].ravel())), shape=(n, n))
    row_sums = np.asarray(g.sum(axis=1)).ravel()
    g = sp.diags(1.0 / np.maximum(row_sums, 1e-30)) @ g
    graph = SpatialGraph.from_csr(sp.csr_matrix(g))
    s0 = float(g.sum())
    print(f"[graph] kNN + normalize: {time.perf_counter() - t0:.1f}s")

    keys = spawn_keys(0, n_perms)
    perms_idx = cipher_index_batch(keys, n)

    sub = 512           # SpMV block (measured optimum)
    super_w = 1024      # perm superblock (bf16 u → 2 KB gather rows)
    base = rng.standard_normal((n, super_w)).astype(np.float32)
    print(f"[host] base expression block generated ({base.nbytes / 1e9:.1f} GB)")

    n_super = -(-n_genes // super_w)
    total = 0.0
    checksum = 0.0
    for it in range(n_super):
        base *= 1.000001  # cheap perturbation: fresh inputs defeat result caches
        t0 = time.perf_counter()
        xb = jnp.asarray(base)
        z_parts, u_parts = [], []
        for c in range(0, super_w, sub):
            zb = xb[:, c : c + sub]
            zb = zb - jnp.mean(zb, axis=0, keepdims=True)
            ub = spmv_genes(graph.indices, graph.weights, zb)
            checksum += float(jnp.sum(moran_scores_from_u(zb, ub, s0)))
            z_parts.append(zb)
            u_parts.append(ub.astype(jnp.bfloat16))
        zc = jnp.concatenate(z_parts, axis=1)
        uc = jnp.concatenate(u_parts, axis=1)
        sims = moran_perm_scores(zc, uc, perms_idx, s0, gather_bf16=True)
        checksum += float(jnp.sum(sims))  # forced readback
        dt = time.perf_counter() - t0
        total += dt
        print(f"[superblock {it + 1}/{n_super}] {super_w} genes x {n_perms} perms: {dt:.2f}s")

    print(
        f"[TOTAL] Moran perm mode {n_genes} genes x {n_perms} perms x {n} cells: "
        f"{total:.1f}s (checksum {checksum:.3e})"
    )


if __name__ == "__main__":
    main()
