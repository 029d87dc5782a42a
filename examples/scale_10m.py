"""Scale demonstration: 1000-permutation neighborhood enrichment at 10M cells.

10x the north-star Xenium config (and ~2000x the reference's largest shipped
dataset, 4i at 270,876 cells — datasets.yaml:15-112) on ONE v5e chip. The
pipeline is the production one: O(n) index-cipher shuffles + column-layout
counting, chunked at 250 permutations to bound the (n, P) working set
(u8 label table at 10M x 250 = 2.5 GB per chunk).

Timing hygiene as everywhere in this repo: warmup with a different seed,
completion forced by host scalar readbacks placed after all dispatches.

Run from /root/repo: PYTHONPATH=/root/repo:$PYTHONPATH python examples/scale_10m.py
"""

from __future__ import annotations

import time

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
from squidpy_tpu.ops.nhood import permuted_pair_counts_cols

N, K, N_CLS, N_PERMS, CHUNK = 10_000_000, 6, 16, 1000, 250


def run(seed: int, indices, mask, class_counts) -> float:
    t0 = time.time()
    keys = spawn_keys(seed, N_PERMS)
    totals = []
    for c0 in range(0, N_PERMS, CHUNK):
        cols = cipher_label_columns(keys[c0 : c0 + CHUNK], class_counts, out_dtype=jnp.uint8)
        totals.append(jnp.sum(permuted_pair_counts_cols(indices, mask, cols, N_CLS), axis=(1, 2)))
    total = int(sum(np.asarray(t, dtype=np.int64).sum() for t in totals))
    dt = time.time() - t0
    assert total == N_PERMS * N * K, total
    return dt


def main() -> None:
    rng = np.random.default_rng(0)
    indices = jnp.asarray(rng.integers(0, N, size=(N, K)).astype(np.int32))
    mask = jnp.ones((N, K), dtype=bool)
    labels = rng.integers(0, N_CLS, size=N).astype(np.int32)
    class_counts = np.bincount(labels, minlength=N_CLS)
    print(f"graph ready: {N:,} cells, k={K}, {N_CLS} clusters", flush=True)

    warm = run(99, indices, mask, class_counts)
    print(f"compile+warm: {warm:.1f} s", flush=True)
    for rep in range(3):
        dt = run(rep, indices, mask, class_counts)
        print(f"rep{rep}: nhood 1000 perms @ 10M cells = {dt:.2f} s ({N_PERMS / dt:.0f} perms/s)", flush=True)


if __name__ == "__main__":
    main()
