"""Cluster-pair edge-count kernels (neighborhood enrichment / interaction matrix).

The reference counts cluster-pair edges with a runtime-codegen'd numba kernel
walking CSR rows (/root/reference/src/squidpy/gr/_nhood.py:53-140) and fans
1000 permutations over a loky process pool. Here the count is a fully
vectorized device computation over the padded ELL graph:

    R[i, c]    = #{neighbors j of i with label[j] = c}   (gather + one-hot sum)
    counts[a,b]= onehot(label)ᵀ @ R                       (one MXU matmul)

and all permutations run as one batched device pass (``vmap`` over shuffled
label batches, chunked by :func:`squidpy_tpu.utils.chunked_vmap` to bound HBM).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from squidpy_tpu.utils import chunked_vmap

__all__ = ["cluster_pair_counts", "permuted_pair_counts"]


@partial(jax.jit, static_argnames=("n_cls",))
def cluster_pair_counts(
    indices: jax.Array,
    mask: jax.Array,
    labels: jax.Array,
    n_cls: int,
    weights: jax.Array | None = None,
) -> jax.Array:
    """Directed cluster-pair edge counts ``(n_cls, n_cls)``.

    ``counts[a, b]`` = number (or total weight) of stored edges ``i -> j`` with
    ``labels[i] = a`` and ``labels[j] = b`` — identical to the reference's
    ``_nenrich`` / ``_interaction_matrix`` semantics.
    """
    labels = labels.astype(jnp.int32)
    # float32 accumulates integer counts exactly up to 2^24 per bucket; very
    # large graphs need a wider accumulator for exactness
    acc_t = jnp.float64 if (indices.size > 2**24 and jax.config.jax_enable_x64) else jnp.float32
    nbr_labels = labels[indices]  # (n, k)
    w = mask.astype(acc_t) if weights is None else jnp.where(mask, weights, 0.0).astype(acc_t)
    # R[i, c] = sum_k w[i,k] * onehot(nbr_labels[i,k], c)
    nbr_onehot = jax.nn.one_hot(nbr_labels, n_cls, dtype=acc_t)  # (n, k, C)
    R = jnp.einsum("nk,nkc->nc", w, nbr_onehot)
    src_onehot = jax.nn.one_hot(labels, n_cls, dtype=acc_t)  # (n, C)
    return jnp.dot(src_onehot.T, R, preferred_element_type=acc_t)


def permuted_pair_counts(
    indices: jax.Array,
    mask: jax.Array,
    shuffled_labels: jax.Array,
    n_cls: int,
    *,
    chunk_size: int | None = None,
) -> jax.Array:
    """Batched pair counts over a ``(n_perms, n)`` batch of shuffled labels.

    ``chunk_size=None`` auto-sizes chunks so the intermediate one-hot buffers
    stay within ~2 GB of HBM.
    """
    n, k = indices.shape
    if chunk_size is None:
        bytes_per_perm = 4 * n * (k * n_cls + n_cls + k)
        chunk_size = max(1, min(shuffled_labels.shape[0], int(2e9 // max(bytes_per_perm, 1))))

    def one(labels: jax.Array) -> jax.Array:
        return cluster_pair_counts(indices, mask, labels, n_cls)

    return chunked_vmap(one, shuffled_labels, chunk_size=chunk_size)
