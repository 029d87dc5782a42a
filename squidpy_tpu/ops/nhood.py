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

__all__ = ["cluster_pair_counts", "permuted_pair_counts", "exact_pair_counts"]


# Per-bucket f32 integer accumulation is exact only below 2^24; chunks stay
# under 2^23 edges so every partial matmul result is an exact f32 integer.
_EXACT_F32_EDGES = 1 << 23


def _pair_counts_block(
    indices: jax.Array,
    w: jax.Array,
    src_labels: jax.Array,
    label_table: jax.Array,
    n_cls: int,
    acc_t: jnp.dtype,
) -> jax.Array:
    """One gather + one-hot reduction + one MXU matmul over a row block."""
    nbr_onehot = jax.nn.one_hot(label_table[indices], n_cls, dtype=acc_t)  # (n, k, C)
    R = jnp.einsum("nk,nkc->nc", w, nbr_onehot)  # R[i, c] = Σ_k w[i,k]·1[lbl=c]
    src_onehot = jax.nn.one_hot(src_labels, n_cls, dtype=acc_t)  # (n, C)
    return jnp.dot(src_onehot.T, R, preferred_element_type=acc_t)


def exact_pair_counts(
    indices: jax.Array,
    mask: jax.Array,
    src_labels: jax.Array,
    label_table: jax.Array,
    n_cls: int,
) -> jax.Array:
    """Unweighted cluster-pair edge counts as exact ``int32``.

    Small graphs (≤2^23 edges) take one f32 matmul (every partial sum is an
    exactly-representable integer); larger graphs scan row chunks sized so
    each chunk's f32 partials stay exact, accumulating in int32 — no silent
    f32 saturation past 2^24 edges per bucket (exact to 2^31 total).
    ``src_labels`` are the labels of the block's source rows; ``label_table``
    is the full label array the neighbor indices point into.
    """
    n, k = indices.shape
    w = mask.astype(jnp.float32)
    if n * k <= _EXACT_F32_EDGES:
        return _pair_counts_block(indices, w, src_labels, label_table, n_cls, jnp.float32).astype(jnp.int32)

    rows_per_chunk = max(1, _EXACT_F32_EDGES // max(k, 1))
    n_chunks = -(-n // rows_per_chunk)
    pad = n_chunks * rows_per_chunk - n
    idx_c = jnp.pad(indices, ((0, pad), (0, 0))).reshape(n_chunks, rows_per_chunk, k)
    w_c = jnp.pad(w, ((0, pad), (0, 0))).reshape(n_chunks, rows_per_chunk, k)
    lab_c = jnp.pad(src_labels, (0, pad)).reshape(n_chunks, rows_per_chunk)

    def step(acc: jax.Array, xs: tuple[jax.Array, jax.Array, jax.Array]) -> tuple[jax.Array, None]:
        idx, wc, lab = xs
        part = _pair_counts_block(idx, wc, lab, label_table, n_cls, jnp.float32)
        return acc + part.astype(jnp.int32), None

    acc0 = jnp.zeros((n_cls, n_cls), jnp.int32)
    out, _ = jax.lax.scan(step, acc0, (idx_c, w_c, lab_c))
    return out


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
    ``_nenrich`` / ``_interaction_matrix`` semantics
    (/root/reference/src/squidpy/gr/_nhood.py:53-140).

    Unweighted counts are exact int32 at any graph size (see
    :func:`exact_pair_counts`); weighted sums accumulate in float (f64 when
    x64 is enabled), matching the reference's float accumulation.
    """
    labels = labels.astype(jnp.int32)
    if weights is None:
        return exact_pair_counts(indices, mask, labels, labels, n_cls)
    acc_t = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    w = jnp.where(mask, weights, 0.0).astype(acc_t)
    return _pair_counts_block(indices, w, labels, labels, n_cls, acc_t)


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
