"""The combined north-star measurement, in one process on one v5e chip.

Workload (BASELINE.json / SURVEY §6): on a 1M-cell k=6 spatial graph,
  1. nhood_enrichment with 1000 permutations (including O(n) index-cipher
     shuffle generation on device), and
  2. Moran's I over 15,104 genes (59 × 256-gene blocks as 512-wide scans,
     expression generated on device per block — the host tunnel moves
     ~17 MB/s, so a real 60 GB matrix could never be shipped from this host;
     a production TPU host feeds blocks from local storage instead).

Prints per-phase and combined wall-clock. Warmed numbers (second run with
fresh inputs) are the reported ones — first run pays the remote compile.

Run: python examples/north_star.py (the script bootstraps its own import
path; do NOT export a bare PYTHONPATH — it shadows the axon site dir).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    import squidpy_tpu  # noqa: F401
except ModuleNotFoundError:  # running the script in place, package not installed
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from squidpy_tpu._core.index_cipher import cipher_label_columns
from squidpy_tpu._core.rng import spawn_keys
from squidpy_tpu.ops.autocorr import moran_scores
from squidpy_tpu.ops.nhood import permuted_pair_counts_cols

N, K, N_CLS, N_PERMS = 1_000_000, 6, 16, 1000
G_BLOCK, N_BLOCKS = 512, 29  # 14,848 genes ≈ the 15k-gene config
N_GENES = G_BLOCK * N_BLOCKS


@partial(jax.jit, static_argnums=(1, 2, 3))
def make_graph(key, n, k, n_cls):
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (n, k), 0, n, dtype=jnp.int32)
    labels = jax.random.randint(k2, (n,), 0, n_cls, dtype=jnp.int32)
    w = jnp.full((n, k), 1.0 / k, jnp.float32)
    return idx, w, labels


@partial(jax.jit, static_argnums=(3,))
def moran_all_blocks(idx, w, key, n_blocks):
    s0 = jnp.sum(w)

    def one(i):
        z = jax.random.normal(jax.random.fold_in(key, i), (N, G_BLOCK), jnp.float32)
        return moran_scores(idx, w, z, s0)

    return jax.lax.map(one, jnp.arange(n_blocks))


def run_once(seed: int, idx, w, labels) -> tuple[float, float]:
    mask = jnp.ones((N, K), bool)

    class_counts = np.bincount(np.asarray(labels), minlength=N_CLS)
    t0 = time.time()
    chunk = 500  # the measured gather sweet spot (still well inside HBM)
    keys = spawn_keys(seed, N_PERMS)
    totals = []
    for c0 in range(0, N_PERMS, chunk):
        cols = cipher_label_columns(keys[c0 : c0 + chunk], class_counts, out_dtype=jnp.uint8)
        # per-perm sums stay < 2^31 (a whole-chunk int32 sum would overflow)
        totals.append(jnp.sum(permuted_pair_counts_cols(idx, mask, cols, N_CLS), axis=(1, 2)))
    # readbacks AFTER all dispatches (each forces its chunk's completion;
    # block_until_ready does not sync through the axon tunnel)
    total = int(sum(np.asarray(t, dtype=np.int64).sum() for t in totals))
    t_nhood = time.time() - t0
    assert total == N_PERMS * N * K

    t0 = time.time()
    scores = moran_all_blocks(idx, w, jax.random.PRNGKey(seed), N_BLOCKS)
    checksum = float(jnp.sum(scores))
    t_moran = time.time() - t0
    assert np.isfinite(checksum)
    return t_nhood, t_moran


def main() -> None:
    idx, w, labels = make_graph(jax.random.PRNGKey(0), N, K, N_CLS)
    jax.block_until_ready(idx)
    print(f"graph ready: {N:,} cells, k={K}, {N_CLS} clusters", flush=True)

    run_once(99, idx, w, labels)  # compile + warm
    for rep in range(3):
        t_nhood, t_moran = run_once(rep, idx, w, labels)
        print(
            f"rep{rep}: nhood 1000 perms = {t_nhood:5.2f} s  |  "
            f"Moran {N_GENES} genes = {t_moran:5.2f} s  |  combined = {t_nhood + t_moran:5.2f} s",
            flush=True,
        )


if __name__ == "__main__":
    main()
