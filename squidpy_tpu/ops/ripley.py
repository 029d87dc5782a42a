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

from squidpy_tpu.ops.knn import pairwise_sq_dists_exact as pairwise_sq_dists

__all__ = ["pair_counts_cumulative", "ppp_sample"]


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
