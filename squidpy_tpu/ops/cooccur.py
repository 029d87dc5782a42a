"""Co-occurrence counting kernel: tiled pairwise distances + MXU class reductions.

Replaces the reference's O(n²·L) numba hot loop ``_occur_count``
(/root/reference/src/squidpy/gr/_ppatterns.py:283-310). Per row tile the
squared-distance block is one MXU matmul; for each distance threshold the
cumulative indicator is reduced against the one-hot label matrix with two
more matmuls, giving counts[a, b, r] = #{(i, j): lab_i=a, lab_j=b, d²_ij ≤ thr_r}
without any scatter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from squidpy_tpu.ops.knn import pairwise_sq_dists

__all__ = ["co_occurrence_counts", "co_occurrence_probs"]


@partial(jax.jit, static_argnames=("n_cls", "row_tile"))
def _cooccur_device(
    coords: jax.Array,
    labels: jax.Array,
    thresholds: jax.Array,
    n_cls: int,
    row_tile: int,
) -> jax.Array:
    n = coords.shape[0]
    n_l = thresholds.shape[0]
    n_tiles = (n + row_tile - 1) // row_tile
    n_pad = n_tiles * row_tile
    coords_p = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    onehot = jax.nn.one_hot(labels, n_cls, dtype=coords.dtype)  # (n, C)

    def tile_fn(t: jax.Array) -> jax.Array:
        rows = jax.lax.dynamic_slice_in_dim(coords_p, t * row_tile, row_tile)
        row_ids = t * row_tile + jnp.arange(row_tile, dtype=jnp.int32)
        d2 = pairwise_sq_dists(rows, coords)  # (tile, n)
        valid = (row_ids[:, None] < n) & (jnp.arange(n, dtype=jnp.int32)[None, :] != row_ids[:, None])
        oh_rows = jax.lax.dynamic_slice_in_dim(jnp.pad(onehot, ((0, n_pad - n), (0, 0))), t * row_tile, row_tile)

        def per_thresh(thr: jax.Array) -> jax.Array:
            ind = jnp.where(valid & (d2 <= thr), jnp.asarray(1.0, coords.dtype), 0.0)
            s = jnp.dot(ind, onehot, preferred_element_type=jnp.float32)  # (tile, C)
            return jnp.dot(oh_rows.T, s, preferred_element_type=jnp.float32)  # (C, C)

        return jax.lax.map(per_thresh, thresholds)  # (L, C, C)

    counts = jax.lax.map(tile_fn, jnp.arange(n_tiles))  # (tiles, L, C, C)
    return jnp.sum(counts, axis=0)


def co_occurrence_counts(
    coords: np.ndarray,
    labels: np.ndarray,
    thresholds: np.ndarray,
    n_cls: int,
    *,
    row_tile: int = 2048,
) -> np.ndarray:
    """Cumulative pair counts ``(n_cls, n_cls, L)`` with ``d² ≤ thresholds[r]``.

    Matches the reference's ``_occur_count`` output layout
    (counts[label_i, label_j, r], self-pairs excluded).
    """
    from squidpy_tpu.parallel.sharded import auto_cooccur_counts

    coords = np.ascontiguousarray(coords, dtype=np.float32)
    out = auto_cooccur_counts(
        jnp.asarray(coords),
        jnp.asarray(labels.astype(np.int32)),
        jnp.asarray(np.asarray(thresholds, dtype=np.float32)),
        n_cls,
        row_tile=row_tile,
    )
    from squidpy_tpu.utils import to_host

    # (L, C, C) -> (C, C, L)
    return np.transpose(to_host(out, dtype=np.float64), (1, 2, 0))


def co_occurrence_probs(counts: np.ndarray) -> np.ndarray:
    """Conditional co-occurrence probability ratio (reference
    ``_co_occurrence_helper``, gr/_ppatterns.py:313-358).

    ``occ_prob[i, c, r] = P(label_i | within r of a cell with label_c) / P(label_i)``.
    """
    k, _, n_l = counts.shape
    occ_prob = np.zeros((k, k, n_l), dtype=np.float64)
    row_sums = counts.sum(axis=0)  # (k, L): total pairs with second label == c
    totals = row_sums.sum(axis=0)  # (L,)
    with np.errstate(divide="ignore", invalid="ignore"):
        for r in range(n_l):
            if totals[r] == 0:
                continue
            probs = row_sums[:, r] / totals[r]
            for c in range(k):
                for i in range(k):
                    if probs[i] != 0.0 and row_sums[c, r] != 0.0:
                        occ_prob[i, c, r] = (counts[c, i, r] / row_sums[c, r]) / probs[i]
    return occ_prob
