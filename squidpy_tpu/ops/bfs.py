"""Batched multi-source hop distances (device BFS).

Group closeness centrality needs ``d(v, S)`` for every node against every
cluster's source set (reference delegates to networkx per cluster,
/root/reference/src/squidpy/gr/_nhood.py:246-335). Here ALL clusters run in
one device fixpoint iteration: the distance state is ``(n, C)`` and each
round relaxes every node against its padded-ELL neighbors — the per-round
gather reads (n, k) rows of ``4C`` bytes, so the cluster axis amortizes the
gather issue cost exactly like the permutation axis does in the nhood
pipeline. The ``while_loop`` runs until the whole table reaches its fixpoint
(graph diameter rounds), which is exact — no probabilistic cutoff.

MEASURED TRADE-OFF (real v5e via axon): ``centrality_scores`` does NOT
dispatch here. The per-shape cold compile (46-120 s observed) exceeds the
host multi-source dijkstra total at every size (0.2 s @ 60k, 5.1 s @ 1M
cells), and warm device time scales with graph diameter — ~O(sqrt(n)) rounds
on spatial kNN graphs, each gathering (n, k, C) int32 — so it only matches
the host on low-diameter (near-expander) graphs. Use this primitive directly
when you have many repeated same-shape BFS calls (amortized compile) or
small-diameter graphs with many source sets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hop_distances", "csr_to_ell"]

_INF = np.int32(2**30)


def csr_to_ell(indptr: np.ndarray, indices: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pad CSR rows to dense ``(n, k_max)`` index/mask arrays (host prep).

    Same vectorized O(nnz) scatter as ``SpatialGraph.from_csr``
    (_core/graph.py) — each nonzero lands at (row, position-within-row) in
    one pass, instead of k_max full-length passes.
    """
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    n = len(indptr) - 1
    deg = np.diff(indptr)
    k = max(int(deg.max()) if n else 0, 1)
    idx = np.zeros((n, k), np.int32)
    mask = np.zeros((n, k), bool)
    nnz = int(indptr[-1]) if n else 0
    if nnz:
        rows = np.repeat(np.arange(n), deg)
        pos = np.arange(nnz) - np.repeat(indptr[:-1], deg)
        idx[rows, pos] = indices
        mask[rows, pos] = True
    return idx, mask


@jax.jit
def _hop_kernel(indices: jax.Array, mask: jax.Array, seeds: jax.Array) -> jax.Array:
    inf = jnp.int32(_INF)
    d0 = jnp.where(seeds, jnp.int32(0), inf)

    def cond(state):
        return state[1]

    def body(state):
        d, _ = state
        nbr = d[indices, :]  # (n, k, C) shared-index row gathers
        nbr = jnp.where(mask[:, :, None], nbr, inf)
        relaxed = jnp.minimum(d, jnp.min(nbr, axis=1) + 1)
        return relaxed, jnp.any(relaxed != d)

    d, _ = jax.lax.while_loop(cond, body, (d0, jnp.bool_(True)))
    return d


def hop_distances(indptr: np.ndarray, indices: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """Hop distance from every node to the nearest seed of every column.

    ``seeds`` is ``(n, C)`` bool (one column per source set). Returns
    ``(n, C)`` int32 with unreachable nodes at a large sentinel
    (``>= 2**30``). Exact BFS distances on the (directed) CSR graph;
    symmetrize first for undirected semantics.
    """
    idx, mask = csr_to_ell(np.asarray(indptr), np.asarray(indices))
    out = np.asarray(
        _hop_kernel(jnp.asarray(idx), jnp.asarray(mask), jnp.asarray(np.asarray(seeds, bool)))
    )
    return out
