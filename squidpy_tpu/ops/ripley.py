"""Ripley-statistic kernels: pair counting and Poisson point-process sampling.

Replaces the reference's sklearn KDTree ``two_point_correlation`` pass
(/root/reference/src/squidpy/gr/_ripley.py:206-227) with a tiled MXU
pairwise-distance sweep, and its scalar rejection sampler (``_ppp``, :230-271)
with batched vectorized rejection against the hull triangulation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import ConvexHull, Delaunay

from squidpy_tpu.ops.knn import pairwise_sq_dists as pairwise_expanded
from squidpy_tpu.ops.knn import pairwise_sq_dists_exact as pairwise_sq_dists

__all__ = [
    "pair_counts_cumulative",
    "ppp_sample",
    "batched_nn_distances",
    "batched_pair_counts",
]


@partial(jax.jit, static_argnames=("row_tile",))
def _pair_counts_device(
    points: jax.Array, m_real: jax.Array, support_sq: jax.Array, row_tile: int
) -> jax.Array:
    """Ordered pair counts (excl. self-pairs) with ``d² ≤ support_sq[r]``.

    The distance matrix is symmetric, so only upper-triangle ``(tile, tile)``
    blocks are swept (strict ``i < j`` mask — which also kills self-pairs
    by index, avoiding MXU f32 noise on expanded self-distances) and the
    ordered count is twice the triangular count. Square blocks keep each
    distance tile small enough to stay resident across the threshold loop.
    """
    m = points.shape[0]
    n_tiles = (m + row_tile - 1) // row_tile
    p_pad = jnp.pad(points, ((0, n_tiles * row_tile - m), (0, 0)))
    ti, tj = np.triu_indices(n_tiles)
    ti = jnp.asarray(ti.astype(np.int32))
    tj = jnp.asarray(tj.astype(np.int32))

    def block(tt: tuple[jax.Array, jax.Array]) -> jax.Array:
        t_i, t_j = tt
        rows = jax.lax.dynamic_slice_in_dim(p_pad, t_i * row_tile, row_tile)
        cols = jax.lax.dynamic_slice_in_dim(p_pad, t_j * row_tile, row_tile)
        d2 = pairwise_sq_dists(rows, cols)
        gi = t_i * row_tile + jnp.arange(row_tile, dtype=jnp.int32)
        gj = t_j * row_tile + jnp.arange(row_tile, dtype=jnp.int32)
        # mask padding by INDEX (m_real is traced, so bucketed shapes share
        # one executable); sentinel coordinates cannot be trusted in f32 —
        # two equal sentinels cancel to d² ≈ 0 in the expanded form
        valid = (gi[:, None] < gj[None, :]) & (gj[None, :] < m_real)

        def per_thresh(thr: jax.Array) -> jax.Array:
            return jnp.sum(jnp.where(valid & (d2 <= thr), 1, 0))

        return jax.lax.map(per_thresh, support_sq)

    # per-block counts (each ≤ tile² < 2^24) reduce on device in groups of
    # 512 blocks (512·tile² < 2^31, still exact int32); only the small
    # (n_groups, L) partial table crosses the tunnel, and the final sum
    # happens on host in int64 — a full on-device int32 total would overflow
    # past ~46k points (m²/2 > 2^31)
    per_block = jax.lax.map(block, (ti, tj))  # (B, L) int32
    b = per_block.shape[0]
    group = 512
    pad_b = (-b) % group
    if pad_b:
        per_block = jnp.pad(per_block, ((0, pad_b), (0, 0)))
    return jnp.sum(per_block.reshape(-1, group, per_block.shape[1]), axis=1)


def pair_counts_cumulative(
    points: np.ndarray, support: np.ndarray, *, row_tile: int = 1024, method: str = "auto"
) -> np.ndarray:
    """#ordered pairs (i, j), i≠j, with ``d_ij ≤ support[r]`` — the KDTree
    ``two_point_correlation(...) - n`` quantity of the reference's L function.

    ``method='auto'`` switches to the spatially binned dual-tree sweep
    (:mod:`squidpy_tpu.ops.pairbins`, class-free ``C = 1`` instance) at scale;
    the dense triangular sweep remains the small-n path and parity oracle.
    """
    if method not in ("auto", "dense", "binned"):
        raise ValueError(f"Unknown pair-count method `{method}`.")
    if method == "binned" or (method == "auto" and points.shape[0] >= 100_000):
        from squidpy_tpu.ops.pairbins import binned_ordered_pair_counts

        return binned_ordered_pair_counts(points, support)

    points = np.ascontiguousarray(points, dtype=np.float32)
    m = points.shape[0]
    # below row_tile, bucket to 256 so small clusters of different sizes
    # still share executables (tile == m would compile per distinct size)
    tile = row_tile if m >= row_tile else min(256, row_tile)
    # bucket the point count to the tile multiple so per-cluster calls of
    # similar size share ONE compiled executable (each distinct raw shape
    # would otherwise pay a fresh 20-60s remote compile); padding rows are
    # excluded by the traced m_real index mask
    pad = (-m) % tile
    if pad:
        points = np.concatenate(
            [points, np.zeros((pad, points.shape[1]), np.float32)], axis=0
        )
    blocks = _pair_counts_device(
        jnp.asarray(points),
        jnp.asarray(m, dtype=jnp.int32),
        jnp.asarray((np.asarray(support, dtype=np.float64) ** 2).astype(np.float32)),
        tile,
    )
    # triangular counts doubled to ordered pairs; int64 host sum (exact)
    return 2.0 * np.asarray(blocks, dtype=np.int64).sum(axis=0).astype(np.float64)


@partial(jax.jit, static_argnames=("chunk",))
def _batched_nn_device(queries: jax.Array, clouds: jax.Array, chunk: int) -> jax.Array:
    from squidpy_tpu.utils._utils import chunked_vmap

    def one(cloud: jax.Array) -> jax.Array:
        # expanded MXU form selects the neighbor; the exact difference-form
        # recompute on the selection matches cross_knn's output contract
        d2 = pairwise_expanded(queries, cloud)
        nb = cloud[jnp.argmin(d2, axis=1)]
        return jnp.sqrt(jnp.sum(jnp.square(nb - queries), axis=-1))

    return chunked_vmap(one, clouds, chunk_size=chunk)


def batched_nn_distances(queries: np.ndarray, clouds: np.ndarray) -> np.ndarray:
    """Exact nearest-neighbor distance from each query to each simulated
    cloud: ``(m, d) × (S, n, d) → (S, m)`` in ONE device dispatch.

    The envelope counterpart of per-simulation ``cross_knn(queries, cloud,
    1)`` calls (the reference loops its KDTree queries one simulation at a
    time, gr/_ripley.py:158-176)."""
    queries = jnp.asarray(np.ascontiguousarray(queries, dtype=np.float32))
    clouds_d = jnp.asarray(np.ascontiguousarray(clouds, dtype=np.float32))
    m, n = queries.shape[0], clouds_d.shape[1]
    # ~64 MB of (chunk, m, n) f32 distance temporaries per step
    chunk = max(1, min(clouds_d.shape[0], 16_000_000 // max(m * n, 1)))
    return np.asarray(_batched_nn_device(queries, clouds_d, chunk))


@partial(jax.jit, static_argnames=("chunk",))
def _batched_pairs_device(clouds: jax.Array, support_sq: jax.Array, chunk: int) -> jax.Array:
    from squidpy_tpu.utils._utils import chunked_vmap

    n = clouds.shape[1]
    iu = jnp.arange(n, dtype=jnp.int32)
    tri = iu[:, None] < iu[None, :]

    def one(cloud: jax.Array) -> jax.Array:
        d2 = pairwise_sq_dists(cloud, cloud)  # difference form: threshold-safe

        def per_thresh(thr: jax.Array) -> jax.Array:
            return jnp.sum(jnp.where(tri & (d2 <= thr), 1, 0))

        return jax.lax.map(per_thresh, support_sq)

    return chunked_vmap(one, clouds, chunk_size=chunk)


def batched_pair_counts(clouds: np.ndarray, support: np.ndarray) -> np.ndarray:
    """Ordered pair counts ``(S, L)`` with ``d ≤ support[r]`` for every
    simulated cloud in one device dispatch — the L-mode envelope batch.
    Exact for ``n ≤ 65k`` per cloud (triangular int32 bound)."""
    clouds = np.ascontiguousarray(clouds, dtype=np.float32)
    S, n = clouds.shape[:2]
    if n > 65_000:
        raise ValueError(f"batched_pair_counts is exact only for n ≤ 65k per cloud, got {n}.")
    support_sq = (np.asarray(support, dtype=np.float64) ** 2).astype(np.float32)
    chunk = max(1, min(S, int(64_000_000 // max(n * n, 1)) or 1))
    tri = np.asarray(
        _batched_pairs_device(jnp.asarray(clouds), jnp.asarray(support_sq), chunk),
        dtype=np.int64,
    )
    return 2.0 * tri.astype(np.float64)


def ppp_sample(
    hull: ConvexHull,
    n_simulations: int,
    n_observations: int,
    rng: np.random.Generator,
) -> np.ndarray:
    """Simulate a Poisson point process on a convex hull.

    Batched rejection sampling: draw uniform points in the bounding box, keep
    those inside the hull triangulation (vectorized ``find_simplex``), repeat
    until filled. Same distribution as the reference's one-at-a-time sampler.
    """
    vxs = hull.points[hull.vertices]
    deln = Delaunay(vxs)
    lo = vxs.min(0)
    hi = vxs.max(0)
    # acceptance probability = hull area / bbox area
    bbox_area = np.prod(hi - lo)
    accept = max(hull.volume / bbox_area, 1e-3)

    result = np.empty((n_simulations, n_observations, 2))
    for s in range(n_simulations):
        filled = 0
        while filled < n_observations:
            need = n_observations - filled
            batch = int(need / accept * 1.2) + 16
            pts = rng.uniform(lo, hi, size=(batch, 2))
            inside = deln.find_simplex(pts) >= 0
            good = pts[inside][:need]
            result[s, filled : filled + len(good)] = good
            filled += len(good)
    return result.squeeze()
