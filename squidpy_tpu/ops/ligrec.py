"""Receptor-ligand permutation kernel (CellPhoneDB test).

The reference runtime-codegens a numba kernel per cluster count that, for each
permutation, recomputes per-cluster expression means with a scalar loop and
accumulates the exceedance indicator (/root/reference/src/squidpy/gr/_ligrec.py:52-146).
Here per-permutation cluster means are one ``(C, n) @ (n, G)`` MXU matmul
(cluster sizes are permutation-invariant, so the divisor is precomputed), the
indicator is a pair of gathers + compare, and all permutations run as one
batched chunked device pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from squidpy_tpu.utils import chunked_vmap

__all__ = ["ligrec_perm_counts", "cluster_means"]


@partial(jax.jit, static_argnames=("n_cls",))
def cluster_means(x: jax.Array, labels: jax.Array, n_cls: int) -> jax.Array:
    """Per-cluster gene means ``(n_cls, n_genes)`` via one-hot matmul."""
    onehot = jax.nn.one_hot(labels, n_cls, dtype=x.dtype)  # (n, C)
    sums = jnp.dot(onehot.T, x, preferred_element_type=x.dtype)
    counts = jnp.sum(onehot, axis=0)[:, None]
    return sums / jnp.where(counts == 0, 1.0, counts)


def ligrec_perm_counts(
    x: jax.Array,                 # (n_cells, n_genes) float
    shuffled_labels: jax.Array,   # (n_perms, n_cells) int32
    counts_per_cluster: jax.Array,  # (n_cls,) — invariant under permutation
    rec: jax.Array,               # (n_interactions,) receptor gene column
    lig: jax.Array,               # (n_interactions,) ligand gene column
    c1: jax.Array,                # (n_pairs,) first cluster of each pair
    c2: jax.Array,                # (n_pairs,) second cluster
    m_sum: jax.Array,             # (n_interactions, n_pairs) observed m1+m2
    n_cls: int,
    *,
    chunk_size: int | None = None,
) -> jax.Array:
    """Σ over permutations of ``(groups[c1, rec] + groups[c2, lig]) > (m1 + m2)``.

    Returns the exceedance count matrix ``(n_interactions, n_pairs)`` as float.
    """
    inv_counts = 1.0 / jnp.where(counts_per_cluster == 0, 1.0, counts_per_cluster)

    def one(labels: jax.Array) -> jax.Array:
        onehot = jax.nn.one_hot(labels, n_cls, dtype=x.dtype)
        groups = jnp.dot(onehot.T, x, preferred_element_type=x.dtype) * inv_counts[:, None]  # (C, G)
        g_rec = groups[c1[None, :], rec[:, None]]  # (I, J)
        g_lig = groups[c2[None, :], lig[:, None]]  # (I, J)
        return ((g_rec + g_lig) > m_sum).astype(x.dtype)

    if chunk_size is None:
        bytes_per_perm = 4 * (x.shape[0] * n_cls + n_cls * x.shape[1] + 2 * rec.shape[0] * c1.shape[0])
        chunk_size = max(1, min(shuffled_labels.shape[0], int(2e9 // max(bytes_per_perm, 1))))

    parts = chunked_vmap(one, shuffled_labels, chunk_size=chunk_size)
    return jnp.sum(parts, axis=0)
