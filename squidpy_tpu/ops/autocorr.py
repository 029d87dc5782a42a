"""Spatial autocorrelation kernels: Moran's I and Geary's C, batched over genes.

The reference delegates scoring to scanpy's numba CSR kernels and runs each
permutation as a full SpMV over the row-permuted weight matrix
(/root/reference/src/squidpy/gr/_ppatterns.py:200-280). Here:

- scores run as one batched ELL pass over a gene block. The neighbor axis is
  walked as a ``lax.scan`` whose step issues ``group`` gathers back-to-back
  (grouped unroll): XLA overlaps the independent gathers, which measures ~1.3x
  faster than one gather per step on the v5e at (1M, 512) — the per-step
  accumulator round-trip through HBM disappears — while live gather temps stay
  bounded at ``group``  ``(n, g)`` buffers (a full unroll is marginally faster
  but holds every gather live and OOMs at wide blocks);
- score-only mode never materializes ``u = W z``: the Moran numerator
  ``Σ_i z_i (Wz)_i`` and the Geary numerator ``Σ_ij w_ij (x_i - x_j)²`` are
  accumulated per neighbor slot directly into a ``(g,)`` vector, so the only
  ``(n, g)``-sized traffic is the gathers themselves;
- permutations exploit the algebra of row-permuted weights: with
  ``u = W z``, ``zᵀ P W z = Σ_i z_i u_{p(i)}`` (and the analogous 3-term
  expansion for Geary), so each permutation is an O(n) gather-dot on
  precomputed vectors instead of a fresh SpMV — a ~k_max× reduction in work
  versus the reference's formulation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from squidpy_tpu.utils import chunked_vmap

__all__ = [
    "spmv_genes",
    "spmv_genes_bucketed",
    "moran_scores",
    "moran_scores_bucketed",
    "geary_scores",
    "geary_scores_bucketed",
    "moran_perm_scores",
    "geary_perm_scores",
    "moran_scores_from_u",
    "geary_scores_from_u",
]

# Gathers issued per scan step. Measured at (1M cells, k=6, 512 genes) on one
# v5e: group=1 → 140 ms, group=3 → 107 ms, full unroll → 96 ms but with all
# k gather temps live (OOM at g=1024). 3 is the bandwidth/memory sweet spot.
DEFAULT_GATHER_GROUP = 3


def _slot(indices: jax.Array, weights: jax.Array, k: jax.Array) -> tuple[jax.Array, jax.Array]:
    idx = jax.lax.dynamic_index_in_dim(indices, k, axis=1, keepdims=False)
    w = jax.lax.dynamic_index_in_dim(weights, k, axis=1, keepdims=False)
    return idx, w


def _grouped_neighbor_sum(
    indices: jax.Array,
    weights: jax.Array,
    contrib,
    init: jax.Array,
    *,
    group: int,
) -> jax.Array:
    """Accumulate ``contrib(idx_k, w_k)`` over the padded neighbor axis.

    Scans over ``k_max // group`` steps of ``group`` statically-unrolled
    contributions each (so XLA overlaps the gathers inside a step), with a
    statically-unrolled epilogue for the remainder.
    """
    k_max = indices.shape[1]
    if k_max == 0:
        return init
    group = max(1, min(int(group), k_max))
    n_full = k_max // group

    def step(acc: jax.Array, s: jax.Array):
        for j in range(group):
            idx, w = _slot(indices, weights, s * group + j)
            acc = acc + contrib(idx, w)
        return acc, None

    acc = init
    if n_full:
        acc, _ = jax.lax.scan(step, acc, jnp.arange(n_full))
    for k in range(n_full * group, k_max):
        idx, w = _slot(indices, weights, jnp.asarray(k))
        acc = acc + contrib(idx, w)
    return acc


@partial(jax.jit, static_argnames=("group",))
def spmv_genes(
    indices: jax.Array,
    weights: jax.Array,
    x: jax.Array,
    *,
    group: int = DEFAULT_GATHER_GROUP,
) -> jax.Array:
    """``W @ x`` for ``x`` of shape ``(n, g)`` over a padded ELL graph.

    Peak memory is ``group + 1`` buffers of ``(n, g)`` (the in-flight gathers
    plus the accumulator), independent of ``k_max``.
    """
    return _grouped_neighbor_sum(
        indices, weights, lambda idx, w: w[:, None] * x[idx, :], jnp.zeros_like(x), group=group
    )


@partial(jax.jit, static_argnames=("group",))
def moran_scores(
    indices: jax.Array,
    weights: jax.Array,
    x: jax.Array,
    s0: jax.Array,
    *,
    group: int = DEFAULT_GATHER_GROUP,
) -> jax.Array:
    """Moran's I per gene: ``I_g = (n / S0) * (zᵀ W z) / (zᵀ z)``; ``x`` is ``(n, g)``.

    The numerator accumulates per neighbor slot directly into ``(g,)`` —
    ``u = W z`` is never materialized.
    """
    n = x.shape[0]
    z = x - jnp.mean(x, axis=0, keepdims=True)
    num = _grouped_neighbor_sum(
        indices,
        weights,
        lambda idx, w: jnp.sum((w[:, None] * z) * z[idx, :], axis=0),
        jnp.zeros((x.shape[1],), x.dtype),
        group=group,
    )
    den = jnp.sum(z * z, axis=0)
    return (n / s0) * num / den


# -- degree-bucketed variants -------------------------------------------
# For skewed-degree graphs (radius graphs with dense cores) the padded ELL
# walks k_max slots for every row; SpatialGraph.degree_buckets partitions rows
# so each bucket only walks its own k_b. The bucket loop is Python over <= 4
# statically-shaped pieces — one dispatch each.


@partial(jax.jit, static_argnames=("group",))
def _spmv_rows(
    indices: jax.Array, weights: jax.Array, x: jax.Array, *, group: int
) -> jax.Array:
    """``(W x)`` restricted to a bucket's rows: (n_b, g)."""
    init = jnp.zeros((indices.shape[0],) + x.shape[1:], x.dtype)
    return _grouped_neighbor_sum(
        indices, weights, lambda idx, w: w[:, None] * x[idx, :] if x.ndim == 2 else w * x[idx],
        init, group=group,
    )


def spmv_genes_bucketed(
    buckets: list[tuple[jax.Array, jax.Array, jax.Array]],
    x: jax.Array,
    *,
    group: int = DEFAULT_GATHER_GROUP,
) -> jax.Array:
    """``W @ x`` over degree buckets; scatters each bucket's rows into place."""
    u = jnp.zeros_like(x)
    for rows, idx, w in buckets:
        u = u.at[rows].set(_spmv_rows(idx, w, x, group=group))
    return u


@partial(jax.jit, static_argnames=("group",))
def _moran_num_rows(
    indices: jax.Array, weights: jax.Array, rows: jax.Array, z: jax.Array, *, group: int
) -> jax.Array:
    z_rows = z[rows, :]
    return _grouped_neighbor_sum(
        indices,
        weights,
        lambda idx, w: jnp.sum((w[:, None] * z_rows) * z[idx, :], axis=0),
        jnp.zeros((z.shape[1],), z.dtype),
        group=group,
    )


def moran_scores_bucketed(
    buckets: list[tuple[jax.Array, jax.Array, jax.Array]],
    x: jax.Array,
    s0: jax.Array,
    *,
    group: int = DEFAULT_GATHER_GROUP,
) -> jax.Array:
    """Moran's I per gene over degree buckets (same result as ``moran_scores``)."""
    n = x.shape[0]
    z = x - jnp.mean(x, axis=0, keepdims=True)
    num = sum(_moran_num_rows(idx, w, rows, z, group=group) for rows, idx, w in buckets)
    den = jnp.sum(z * z, axis=0)
    return (n / s0) * num / den


@partial(jax.jit, static_argnames=("group",))
def _geary_num_rows(
    indices: jax.Array, weights: jax.Array, rows: jax.Array, x: jax.Array, *, group: int
) -> jax.Array:
    x_rows = x[rows, :]

    def contrib(idx: jax.Array, w: jax.Array) -> jax.Array:
        diff = x_rows - x[idx, :]
        return jnp.sum(w[:, None] * (diff * diff), axis=0)

    return _grouped_neighbor_sum(
        indices, weights, contrib, jnp.zeros((x.shape[1],), x.dtype), group=group
    )


def geary_scores_bucketed(
    buckets: list[tuple[jax.Array, jax.Array, jax.Array]],
    x: jax.Array,
    s0: jax.Array,
    *,
    group: int = DEFAULT_GATHER_GROUP,
) -> jax.Array:
    """Geary's C per gene over degree buckets (same result as ``geary_scores``)."""
    n = x.shape[0]
    num = sum(_geary_num_rows(idx, w, rows, x, group=group) for rows, idx, w in buckets)
    z = x - jnp.mean(x, axis=0, keepdims=True)
    den = jnp.sum(z * z, axis=0)
    return ((n - 1) / (2.0 * s0)) * num / den


def moran_scores_from_u(z: jax.Array, u: jax.Array, s0: jax.Array) -> jax.Array:
    """Moran's I from precomputed centered values and ``u = W z``.

    Used by the permutation path so the SpMV that produces ``u`` is paid once
    for both the observed score and the null.
    """
    n = z.shape[0]
    return (n / s0) * jnp.sum(z * u, axis=0) / jnp.sum(z * z, axis=0)


@partial(jax.jit, static_argnames=("group",))
def geary_scores(
    indices: jax.Array,
    weights: jax.Array,
    x: jax.Array,
    s0: jax.Array,
    *,
    group: int = DEFAULT_GATHER_GROUP,
) -> jax.Array:
    """Geary's C per gene: ``C_g = ((n-1) / (2 S0)) * Σ w_ij (x_i - x_j)² / Σ (x_i - x̄)²``."""
    n = x.shape[0]

    def contrib(idx: jax.Array, w: jax.Array) -> jax.Array:
        diff = x - x[idx, :]
        return jnp.sum(w[:, None] * (diff * diff), axis=0)

    num = _grouped_neighbor_sum(
        indices, weights, contrib, jnp.zeros((x.shape[1],), x.dtype), group=group
    )
    z = x - jnp.mean(x, axis=0, keepdims=True)
    den = jnp.sum(z * z, axis=0)
    return ((n - 1) / (2.0 * s0)) * num / den


@partial(
    jax.jit,
    static_argnames=("chunk_size", "gather_bf16", "z_bf16"),
    # z and u exist only for this call at the caller: donating them gives
    # XLA their HBM for the per-perm gather temporaries (peak matters at
    # 1M cells × 2048-gene superblocks)
    donate_argnums=(0, 1),
)
def moran_perm_scores(
    z: jax.Array,
    u: jax.Array,
    perms: jax.Array,
    s0: jax.Array,
    *,
    chunk_size: int | None = None,
    gather_bf16: bool = False,
    z_bf16: bool = False,
) -> jax.Array:
    """Moran's I under row-permutation of W, batched over permutations.

    ``z`` centered values ``(n, g)``, ``u = W z`` precomputed, ``perms``
    ``(n_perms, n)`` permutation index batches. Matches the reference's
    ``morans_i(g[idx_shuffle, :], vals)`` semantics exactly.

    ``gather_bf16``: gather ``u`` in bf16 — the per-perm O(n·g) row gather
    is the whole permutation-mode cost and the gather engine is
    bandwidth-limited (measured ~200-280 GB/s at ≥2 KB rows), so halving the
    gathered bytes over a 2×-wider superblock is a direct win.
    ``z_bf16``: additionally stream ``z`` in bf16, halving the sequential
    read too (and the HBM held by the superblock, which allows width 2048).
    Null sims shift ≲1e-3 relative — the denominator is still accumulated in
    f32, products accumulate in f32, and the shift is far below the
    Monte-Carlo resolution of a permutation null; scores and analytic
    p-values never use this path.
    """
    n = z.shape[0]
    # denominator at ≥f32 precision regardless of how z arrives (callers may
    # buffer z in bf16 at scale); f64 inputs keep the f64 parity path
    den_t = jnp.promote_types(z.dtype, jnp.float32)
    den = jnp.sum(jnp.square(z.astype(den_t)), axis=0)
    if z_bf16:
        z = z.astype(jnp.bfloat16)
    u_g = u.astype(jnp.bfloat16) if gather_bf16 else u

    def one(perm: jax.Array) -> jax.Array:
        # mixed-precision product: an explicit f32 cast of the gathered
        # (n, g) block would materialize a second full-size buffer (measured
        # HBM OOM at 1M×1024); dtype promotion keeps the convert inside the
        # fused multiply-reduce
        return (n / s0) * jnp.sum(z * u_g[perm, :], axis=0) / den

    if chunk_size is None:
        bytes_per_perm = 8 * z.shape[0] * max(z.shape[1], 1)
        chunk_size = max(1, min(perms.shape[0], int(1e9 // max(bytes_per_perm, 1))))
    return chunked_vmap(one, perms, chunk_size=chunk_size)


@jax.jit
def geary_scores_from_u(
    z: jax.Array,
    u: jax.Array,
    row_sums: jax.Array,
    col_sums: jax.Array,
    s0: jax.Array,
) -> jax.Array:
    """Geary's C from precomputed centered values and ``u = W z``.

    ``Σ_ij w_ij (z_i - z_j)² = Σ_i r_i z_i² - 2 zᵀu + Σ_j c_j z_j²`` with
    ``r``/``c`` the row/column sums of W. Used by the permutation path so the
    SpMV that produces ``u`` is paid once for both the observed score and the
    null (the reference recomputes the full pass per call,
    gr/_ppatterns.py:518).
    """
    n = z.shape[0]
    num = jnp.sum((row_sums + col_sums)[:, None] * (z * z) - 2.0 * (z * u), axis=0)
    den = jnp.sum(z * z, axis=0)
    return ((n - 1) / (2.0 * s0)) * num / den


@partial(
    jax.jit,
    static_argnames=("chunk_size", "gather_bf16", "z_bf16"),
    donate_argnums=(0, 1),
)
def geary_perm_scores(
    z: jax.Array,
    u: jax.Array,
    r: jax.Array,
    cg: jax.Array,
    perms: jax.Array,
    s0: jax.Array,
    *,
    chunk_size: int | None = None,
    gather_bf16: bool = False,
    z_bf16: bool = False,
) -> jax.Array:
    """Geary's C under row-permutation of W — same gather cost as Moran's I.

    With ``W' = P W`` (the reference's ``g[idx_shuffle, :]`` semantics):
    ``Σ_ij w'_ij (z_i - z_j)² = Σ_i [z_i² r_{p(i)} - 2 z_i u_{p(i)}] + c_g``
    where ``u = W z``, ``r`` = row sums of W, and — because ``p`` is a
    bijection — the third term ``Σ_i (W z²)_{p(i)} = Σ_i (W z²)_i
    = Σ_j colsum_j z_j² = c_g`` is a permutation-INVARIANT per-gene constant.
    No ``W z²`` SpMV and no third gathered buffer are needed (round-4 builds
    paid both; the 1M full-panel cost was 2.2× Moran's for it).

    ``gather_bf16``/``z_bf16`` as in :func:`moran_perm_scores`; ``cg`` must be
    computed from full-precision ``z`` by the caller (it is perm-invariant, so
    any error in it shifts observed and null identically — but f32 is free).
    """
    n = z.shape[0]
    # denominator at ≥f32 precision regardless of how z arrives (callers may
    # buffer z in bf16 at scale); f64 inputs keep the f64 parity path
    den_t = jnp.promote_types(z.dtype, jnp.float32)
    den = jnp.sum(jnp.square(z.astype(den_t)), axis=0)
    if z_bf16:
        z = z.astype(jnp.bfloat16)
    u_g = u.astype(jnp.bfloat16) if gather_bf16 else u
    # the whole per-perm expression must stay in ONE dtype: a single ≥f32
    # operand (r) promotes the (n, g) products to f32 and MATERIALIZES them
    # (measured at 1M×2048: ~10 s/perm of HBM churn, then OOM — vs the
    # all-bf16 fused multiply-reduce at ~1 ms/perm/512 genes). TPU reduces
    # bf16 with f32 accumulators, so the sum itself is fine; r's bf16
    # rounding shifts sims ≲1e-3 relative, the Moran-documented tradeoff.
    r_g = r.astype(jnp.bfloat16) if gather_bf16 else r.astype(den_t)
    cg = cg.astype(den_t)

    def one(perm: jax.Array) -> jax.Array:
        num = jnp.sum(z * (z * r_g[perm, None] - 2.0 * u_g[perm, :]), axis=0)
        return ((n - 1) / (2.0 * s0)) * (num.astype(den_t) + cg) / den

    if chunk_size is None:
        bytes_per_perm = 8 * z.shape[0] * max(z.shape[1], 1)
        chunk_size = max(1, min(perms.shape[0], int(1e9 // max(bytes_per_perm, 1))))
    return chunked_vmap(one, perms, chunk_size=chunk_size)
