"""Pair statistics at 10M cells + full-scale Geary permutation mode.

Round-4 extension of the 1M measurements: the binned sweep's device work
scales with the number of NEAR block pairs, so a realistic short-range
interval stays tractable at 10× the north-star size (the reference's numba
O(n²·L) scan would be ~100× its 1M cost). Also measures Geary's C
permutation mode at the full 15k-gene panel (same 2048-wide superblock
structure and the same two buffered vectors as Moran — the W z² term is
permutation-invariant and collapses to a per-gene constant).

Run: python examples/scale_pairs_10m.py [pairs] [geary]
(no arguments = both parts)
"""

from __future__ import annotations

import sys
import time

import numpy as np

try:
    import squidpy_tpu  # noqa: F401
except ModuleNotFoundError:  # running the script in place, package not installed
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import squidpy_tpu  # noqa: F401


def main() -> None:
    parts = set(sys.argv[1:]) or {"pairs", "geary"}
    rng = np.random.default_rng(0)
    if "pairs" not in parts:
        _geary(rng)
        return

    # ---- co_occurrence at 10M cells, short-range interval -----------------
    n = 10_000_000
    centers = rng.uniform(0, 31_600, size=(1000, 2))  # same density as the 1M config
    which = rng.integers(0, 1000, size=n)
    coords = (centers[which] + rng.normal(0, 150, size=(n, 2))).astype(np.float32)
    labels = rng.integers(0, 16, size=n).astype(np.int32)

    from squidpy_tpu.ops.cooccur import co_occurrence_counts
    from squidpy_tpu.ops.pairbins import morton_argsort, plan_binned_pairs

    interval = np.linspace(0, 500.0, 50, dtype=np.float32)
    thr = (interval[1:].astype(np.float64) ** 2).astype(np.float32)
    t0 = time.perf_counter()
    perm = morton_argsort(coords)
    plan = plan_binned_pairs(coords[perm], labels[perm], thr, 16, tile=1024)
    print(
        f"[plan 10M short-interval] block_pairs={plan.n_pairs_total} "
        f"device_items={plan.n_items} plan={time.perf_counter() - t0:.1f}s",
        flush=True,
    )
    for rep in range(3):
        labels_r = rng.integers(0, 16, size=n).astype(np.int32)
        t0 = time.perf_counter()
        counts = co_occurrence_counts(coords, labels_r, thr, 16)
        total = float(counts[..., -1].sum())
        print(f"[co_occurrence 10M x 49thr short-interval] rep{rep}: "
              f"{time.perf_counter() - t0:.2f}s (pairs@max={total:.3e})", flush=True)
    del coords, labels, which, centers, perm, plan
    if "geary" in parts:
        _geary(rng)


def _geary(rng) -> None:
    # ---- Geary perm mode, 15,360 genes x 100 perms x 1M cells --------------
    import jax
    import jax.numpy as jnp
    from scipy import sparse as sp
    from scipy.spatial import cKDTree

    from squidpy_tpu._core.graph import SpatialGraph
    from squidpy_tpu._core.index_cipher import cipher_index_batch
    from squidpy_tpu._core.rng import spawn_keys
    from squidpy_tpu.ops.autocorr import (
        geary_perm_scores,
        geary_scores_from_u,
        spmv_genes,
    )

    m, n_genes, n_perms = 1_000_000, 15_360, 100
    pts = rng.uniform(0, 10_000, size=(m, 2)).astype(np.float32)
    _, idx = cKDTree(pts).query(pts, k=7)
    rows = np.repeat(np.arange(m), 6)
    g = sp.csr_matrix((np.ones(m * 6, np.float32), (rows, idx[:, 1:].ravel())), shape=(m, m))
    row_sums = np.asarray(g.sum(axis=1)).ravel()
    g = sp.diags(1.0 / np.maximum(row_sums, 1e-30)) @ g
    graph = SpatialGraph.from_csr(sp.csr_matrix(g))
    s0 = float(g.sum())
    r_dev = jnp.asarray(np.asarray(g.sum(axis=1), dtype=np.float32).ravel())
    c_dev = jnp.asarray(np.asarray(g.sum(axis=0), dtype=np.float32).ravel())
    print("[geary graph ready]", flush=True)

    perms_idx = cipher_index_batch(spawn_keys(0, n_perms), m)
    # Geary now buffers the SAME two (n, w) vectors as Moran (the W z² term is
    # permutation-invariant), so it shares Moran's 2048-wide superblocks
    sub, super_w = 512, 2048

    @jax.jit
    def gen_block(key):
        return jax.random.normal(key, (m, sub), jnp.float32)

    gkeys = spawn_keys(1, (-(-n_genes // super_w)) * (super_w // sub))
    ki = 0
    total = checksum = 0.0
    for it in range(-(-n_genes // super_w)):
        t0 = time.perf_counter()
        z_parts, u_parts, cg_parts = [], [], []
        for c in range(0, super_w, sub):
            xb = gen_block(gkeys[ki]); ki += 1
            zb = xb - jnp.mean(xb, axis=0, keepdims=True)
            xb = None  # free before the SpMV's in-flight gather temps
            ub = spmv_genes(graph.indices, graph.weights, zb, group=2)
            # observed score + perm-invariant third term from zb/ub — the
            # perm path pays ONE SpMV per block, like Moran
            checksum += float(jnp.sum(geary_scores_from_u(zb, ub, r_dev, c_dev, s0)))
            cg_parts.append(jnp.sum(c_dev[:, None] * (zb * zb), axis=0))
            z_parts.append(zb.astype(jnp.bfloat16))
            u_parts.append(ub.astype(jnp.bfloat16))
            del zb, ub
        zc = jnp.concatenate(z_parts, axis=1); del z_parts
        uc = jnp.concatenate(u_parts, axis=1); del u_parts
        cgc = jnp.concatenate(cg_parts); del cg_parts
        sims = geary_perm_scores(
            zc, uc, r_dev, cgc, perms_idx, s0, gather_bf16=True, z_bf16=True,
        )
        del zc, uc
        checksum += float(jnp.sum(sims)); del sims
        dt = time.perf_counter() - t0
        total += dt
        print(f"[geary superblock {it + 1}] {dt:.2f}s", flush=True)
    print(f"[TOTAL geary perm] {n_genes} genes x {n_perms} perms x {m} cells: "
          f"{total:.1f}s (checksum {checksum:.3e})")


if __name__ == "__main__":
    main()
