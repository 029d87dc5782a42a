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

from squidpy_tpu.ops.knn import pairwise_sq_dists_exact as pairwise_sq_dists

__all__ = ["co_occurrence_counts", "co_occurrence_probs"]


# Exact integer accumulation without x64: per-tile class reductions are split
# into base-2^12 hi/lo digit matmuls (each an exact f32 integer, since every
# partial sum stays < 2^24), and tiles accumulate into a base-2^24 int32 digit
# pair with per-step carry — exact totals to ~2^55 pairs. Requires n < 2^24
# cells (first matmul) and row_tile * n < 2^36 (hi digit), both far past any
# feasible O(n²) sweep.
_SPLIT = 1 << 12
_DIGIT_BASE = 1 << 24


def pair_digit_matmuls(ind: jax.Array, onehot_cols: jax.Array, oh_rows: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Class-pair reduction of a 0/1 indicator tile as exact (hi, lo) digits.

    ``ind``: (tile, n) 0/1; ``onehot_cols``: (n, C); ``oh_rows``: (tile, C).
    Returns int32 ``(hi, lo)`` with the tile's counts = hi·2^12 + lo.
    """
    s = jnp.dot(ind, onehot_cols, preferred_element_type=jnp.float32)  # (tile, C), ≤ n
    s_hi = jnp.floor(s * (1.0 / _SPLIT))  # exact: power-of-two scale of an exact int
    s_lo = s - s_hi * _SPLIT
    # HIGHEST precision: the MXU truncates f32 inputs to bf16 at DEFAULT,
    # which cannot represent integers > 256 — s_hi/s_lo reach 4095. The 0/1
    # first matmul is bf16-exact and stays DEFAULT.
    hi = jnp.dot(oh_rows.T, s_hi, preferred_element_type=jnp.float32,
                 precision=(jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST))
    lo = jnp.dot(oh_rows.T, s_lo, preferred_element_type=jnp.float32,
                 precision=(jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST))
    return hi.astype(jnp.int32), lo.astype(jnp.int32)


def digit_accumulate(
    acc: tuple[jax.Array, jax.Array], hi: jax.Array, lo: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Add (hi·2^12 + lo) into a normalized base-2^24 int32 digit pair."""
    a1, a0 = acc
    a0 = a0 + lo + (hi & (_SPLIT - 1)) * _SPLIT
    a1 = a1 + (hi >> 12) + (a0 >> 24)
    return a1, a0 & (_DIGIT_BASE - 1)


def digit_normalize(a1: jax.Array, a0: jax.Array) -> jax.Array:
    """Canonicalize a digit pair (e.g. after a psum of per-device pairs)."""
    return jnp.stack([a1 + (a0 >> 24), a0 & (_DIGIT_BASE - 1)])


def combine_digits(pair: np.ndarray) -> np.ndarray:
    """Host-side merge of a ``(2, ...)`` int digit pair into exact float64."""
    pair = np.asarray(pair, dtype=np.float64)
    return pair[0] * float(_DIGIT_BASE) + pair[1]


def ordered_from_upper_digits(d: "jax.Array") -> "jax.Array":
    """Ordered-pair count digits from strict-upper-triangle digits:
    ``ordered[a, b] = upper[a, b] + upper[b, a]`` with exact digit carries."""
    a1, a0 = d[0], d[1]
    a0s = a0 + jnp.swapaxes(a0, -1, -2)
    a1s = a1 + jnp.swapaxes(a1, -1, -2) + (a0s >> 24)
    return jnp.stack([a1s, a0s & (_DIGIT_BASE - 1)])


@partial(jax.jit, static_argnames=("n_cls", "row_tile"))
def _cooccur_device(
    coords: jax.Array,
    labels: jax.Array,
    thresholds: jax.Array,
    n_cls: int,
    row_tile: int,
) -> jax.Array:
    """Cumulative pair counts as a ``(2, L, C, C)`` exact int32 digit pair."""
    n = coords.shape[0]
    n_l = thresholds.shape[0]
    n_tiles = (n + row_tile - 1) // row_tile
    n_pad = n_tiles * row_tile
    coords_p = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    onehot = jax.nn.one_hot(labels, n_cls, dtype=coords.dtype)  # (n, C)
    onehot_p = jnp.pad(onehot, ((0, n_pad - n), (0, 0)))

    def tile_fn(acc: tuple[jax.Array, jax.Array], t: jax.Array):
        rows = jax.lax.dynamic_slice_in_dim(coords_p, t * row_tile, row_tile)
        row_ids = t * row_tile + jnp.arange(row_tile, dtype=jnp.int32)
        d2 = pairwise_sq_dists(rows, coords)  # (tile, n)
        valid = (row_ids[:, None] < n) & (jnp.arange(n, dtype=jnp.int32)[None, :] != row_ids[:, None])
        oh_rows = jax.lax.dynamic_slice_in_dim(onehot_p, t * row_tile, row_tile)

        def per_thresh(thr: jax.Array) -> tuple[jax.Array, jax.Array]:
            ind = jnp.where(valid & (d2 <= thr), jnp.asarray(1.0, coords.dtype), 0.0)
            return pair_digit_matmuls(ind, onehot, oh_rows)

        hi, lo = jax.lax.map(per_thresh, thresholds)  # (L, C, C) each
        return digit_accumulate(acc, hi, lo), None

    acc0 = (jnp.zeros((n_l, n_cls, n_cls), jnp.int32),) * 2
    (a1, a0), _ = jax.lax.scan(tile_fn, acc0, jnp.arange(n_tiles))
    return jnp.stack([a1, a0])


def triangular_block_pairs(n: int, tile: int) -> tuple[np.ndarray, np.ndarray]:
    """Upper-triangle block-pair index lists ``(ti, tj)`` with ``tj >= ti``.

    The distance matrix is symmetric, so sweeping only these blocks (with a
    strict ``i < j`` mask) halves the O(n²) work; ordered counts recover via
    ``upper + upperᵀ`` (label axes swapped) — exact, since every count is an
    integer.
    """
    n_tiles = (n + tile - 1) // tile
    ti, tj = np.triu_indices(n_tiles)
    return ti.astype(np.int32), tj.astype(np.int32)


@partial(jax.jit, static_argnames=("n_cls", "tile", "vary_axis"))
def cooccur_block_pairs_device(
    coords_p: jax.Array,   # (n_pad, 2) tile-padded coordinates
    onehot_p: jax.Array,   # (n_pad, C) tile-padded label one-hots
    n: int | jax.Array,
    ti_arr: jax.Array,     # (B,) block-pair row-tile ids (−1 = padding pair)
    tj_arr: jax.Array,     # (B,)
    thresholds: jax.Array,
    n_cls: int,
    tile: int,
    vary_axis: str | None = None,
) -> jax.Array:
    """Strict-upper-triangle pair counts over a block-pair list, as a
    ``(2, L, C, C)`` digit pair.

    One ``(tile, tile)`` distance block per step touches every pair exactly
    once (``i < j``), so this does half the distance/indicator work of a full
    row sweep. The same body serves single-device (all pairs) and
    pair-sharded multi-device execution — exact integer counts make the
    triangular and full formulations bitwise-interchangeable.
    """
    n_l = thresholds.shape[0]

    def step(acc: tuple[jax.Array, jax.Array], tt: tuple[jax.Array, jax.Array]):
        ti, tj = tt
        ti_c = jnp.maximum(ti, 0)  # padding pairs compute on block 0, masked out
        rows = jax.lax.dynamic_slice_in_dim(coords_p, ti_c * tile, tile)
        cols = jax.lax.dynamic_slice_in_dim(coords_p, tj * tile, tile)
        oh_i = jax.lax.dynamic_slice_in_dim(onehot_p, ti_c * tile, tile)
        oh_j = jax.lax.dynamic_slice_in_dim(onehot_p, tj * tile, tile)
        d2 = pairwise_sq_dists(rows, cols)  # (tile, tile)
        gi = ti_c * tile + jnp.arange(tile, dtype=jnp.int32)
        gj = tj * tile + jnp.arange(tile, dtype=jnp.int32)
        ok = (gi[:, None] < gj[None, :]) & (gj[None, :] < n) & (ti >= 0)

        def per_thresh(thr: jax.Array) -> tuple[jax.Array, jax.Array]:
            ind = jnp.where(ok & (d2 <= thr), jnp.asarray(1.0, coords_p.dtype), 0.0)
            # block sums ≤ tile² < 2^24: the (tile, C) partial and the C×C
            # block count are both exact f32 integers
            s = jnp.dot(ind, oh_j, preferred_element_type=jnp.float32)
            # HIGHEST: s entries reach `tile` — bf16-truncated MXU inputs
            # (DEFAULT) round integers > 256 and corrupt the exact counts
            cnt = jnp.dot(
                oh_i.T, s, preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST),
            ).astype(jnp.int32)
            return cnt >> 12, cnt & (_SPLIT - 1)

        hi, lo = jax.lax.map(per_thresh, thresholds)
        return digit_accumulate(acc, hi, lo), None

    acc0 = (jnp.zeros((n_l, n_cls, n_cls), jnp.int32),) * 2
    if vary_axis is not None:
        # inside shard_map the carry folds device-varying pair ids, so the
        # initial zeros must be marked varying over the mesh axis
        acc0 = jax.lax.pcast(acc0, (vary_axis,), to="varying")
    (a1, a0), _ = jax.lax.scan(step, acc0, (ti_arr, tj_arr))
    return jnp.stack([a1, a0])


def co_occurrence_counts(
    coords: np.ndarray,
    labels: np.ndarray,
    thresholds: np.ndarray,
    n_cls: int,
    *,
    row_tile: int = 2048,
    method: str = "auto",
) -> np.ndarray:
    """Cumulative pair counts ``(n_cls, n_cls, L)`` with ``d² ≤ thresholds[r]``.

    Matches the reference's ``_occur_count`` output layout
    (counts[label_i, label_j, r], self-pairs excluded). ``method='auto'``
    switches to the spatially binned dual-tree sweep
    (:mod:`squidpy_tpu.ops.pairbins`) at scale — bitwise-identical counts,
    near-O(n·L) device work instead of O(n²·L); the dense triangular sweep
    stays as the small-n path and the parity oracle.
    """
    from squidpy_tpu.parallel.sharded import auto_cooccur_counts

    if method not in ("auto", "dense", "binned"):
        raise ValueError(f"Unknown co-occurrence method `{method}`.")
    if method == "binned" or (method == "auto" and coords.shape[0] >= 100_000):
        from squidpy_tpu.ops.pairbins import binned_cooccur_counts

        return binned_cooccur_counts(coords, labels, thresholds, n_cls)

    coords = np.ascontiguousarray(coords, dtype=np.float32)
    out = auto_cooccur_counts(
        jnp.asarray(coords),
        jnp.asarray(labels.astype(np.int32)),
        jnp.asarray(np.asarray(thresholds, dtype=np.float32)),
        n_cls,
        row_tile=row_tile,
    )
    from squidpy_tpu.utils import to_host

    counts = combine_digits(to_host(out, dtype=np.float64))  # (L, C, C)
    return np.transpose(counts, (1, 2, 0))


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
