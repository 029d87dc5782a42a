"""Exact brute-force k-nearest-neighbor search on TPU.

Replaces the reference's sklearn ``NearestNeighbors`` tree queries
(/root/reference/src/squidpy/gr/neighbors.py:189-206). On TPU, an exact tiled
brute-force search is the right algorithm: squared distances for a row tile
against all points are one ``(tile, d) @ (d, n)`` matmul on the MXU, and a
streaming top-k over column tiles keeps memory at ``O(tile * (k + col_tile))``
regardless of ``n``. Spatial data is 2-3D, so the matmul is bandwidth-bound —
the column-tile scan is laid out to keep the coordinate block resident in
VMEM across row tiles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "auto_knn",
    "brute_force_knn",
    "brute_force_knn_approx",
    "cross_knn",
    "pairwise_sq_dists",
    "radius_neighbors",
]

# above this size the O(n²) device sweep loses to a host tree (C, O(n log n));
# both are exact, so the dispatch is purely a performance decision
_BRUTE_FORCE_MAX_N = 50_000

# pair evaluations per brute-force device call (~seconds each on v5e);
# module-level so tests can shrink it to exercise the chunked path
_PAIRS_PER_DISPATCH = 40_000_000_000


def auto_knn(coords: "np.ndarray", k: int) -> tuple["np.ndarray", "np.ndarray"]:
    """Exact kNN with automatic engine dispatch: device MXU brute force for
    small/medium n, multi-threaded host KDTree beyond the O(n²) crossover."""
    coords = np.ascontiguousarray(coords)
    n = coords.shape[0]
    if n <= _BRUTE_FORCE_MAX_N:
        return brute_force_knn(coords, k)
    if k >= n:
        raise ValueError(f"Expected `n_neighs` < number of observations ({n}), found `{k}`.")
    # scipy cKDTree is ~1.7x faster than sklearn here (9.3s vs 15.5s at 1M
    # points, workers=-1); query k+1 then drop the self entry per row
    from scipy.spatial import cKDTree

    d, i = cKDTree(coords).query(coords, k=k + 1, workers=-1)
    self_pos = i == np.arange(n)[:, None]
    # duplicates can push the self index out of the top k+1 — then drop the
    # farthest entry instead (any k of the tied nearest are correct)
    drop = np.where(self_pos.any(axis=1), self_pos.argmax(axis=1), k)
    keep = np.ones((n, k + 1), dtype=bool)
    keep[np.arange(n), drop] = False
    return d[keep].reshape(n, k), i[keep].reshape(n, k).astype(np.int32)


def pairwise_sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distances ``(m, n)`` between row sets ``a`` and ``b``."""
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True)
    cross = a @ b.T
    return jnp.maximum(a2 + b2.T - 2.0 * cross, 0.0)


def pairwise_sq_dists_exact(a: jax.Array, b: jax.Array) -> jax.Array:
    """Difference-form squared distances for THRESHOLD comparisons.

    The expanded ``|a|²−2ab+|b|²`` form is unusable for threshold compares on
    TPU: the MXU truncates f32 matmul inputs to bf16 at default precision
    (measured d² error ~1e-2·|p|²_max), and even ``Precision.HIGHEST`` leaves
    the error anchored to ``ulp(|p|²_max)`` — near-threshold pairs mis-bin
    when coordinates are large relative to the distances of interest. The
    per-dimension difference form ``Σ(a_d−b_d)²`` runs on the VPU in full f32
    with error ~ulp(d²) *of the distance itself* (a few parts in 10⁷), and
    XLA fuses the per-dim broadcasts without materializing an (m, n, d)
    intermediate. kNN keeps the fast expanded MXU form (only relative order
    matters there).
    """
    d2 = jnp.zeros((a.shape[0], b.shape[0]), a.dtype)
    for dim in range(a.shape[1]):
        diff = a[:, dim][:, None] - b[:, dim][None, :]
        d2 = d2 + diff * diff
    return d2


@partial(jax.jit, static_argnames=("k", "row_tile", "col_tile", "exclude_self", "chunk_tiles"))
def _knn_device_chunk(
    coords: jax.Array,
    n_real: jax.Array,
    row_lo_tile: jax.Array,
    k: int,
    row_tile: int,
    col_tile: int,
    exclude_self: bool,
    chunk_tiles: int,
) -> tuple[jax.Array, jax.Array]:
    """kNN of ``chunk_tiles`` row tiles starting at row tile ``row_lo_tile``
    against ALL of ``coords`` (pre-padded to tile multiples by the caller).

    At 1M points the full sweep is ~1e12 pair evaluations; a single such
    device call runs for minutes and gets the axon worker killed (observed:
    "TPU worker process crashed or restarted"). The host wrapper therefore
    dispatches bounded chunks of row tiles through ONE shared executable
    (``row_lo_tile`` is traced, so every chunk reuses the compile).
    """
    n_pad, d = coords.shape
    n_col_tiles = n_pad // col_tile
    col_ids = jnp.arange(n_pad, dtype=jnp.int32)

    def row_block(t: jax.Array) -> tuple[jax.Array, jax.Array]:
        r = row_lo_tile + t
        rows = jax.lax.dynamic_slice_in_dim(coords, r * row_tile, row_tile)
        row_idx = r * row_tile + jnp.arange(row_tile, dtype=jnp.int32)

        def col_step(carry, c):
            best_d, best_i = carry
            cols = jax.lax.dynamic_slice_in_dim(coords, c * col_tile, col_tile)
            cidx = jax.lax.dynamic_slice_in_dim(col_ids, c * col_tile, col_tile)
            d2 = pairwise_sq_dists(rows, cols)
            invalid = cidx[None, :] >= n_real
            if exclude_self:
                invalid = invalid | (cidx[None, :] == row_idx[:, None])
            d2 = jnp.where(invalid, jnp.inf, d2)
            cand_d = jnp.concatenate([best_d, d2], axis=1)
            cand_i = jnp.concatenate([best_i, jnp.broadcast_to(cidx[None, :], d2.shape)], axis=1)
            neg_top, top_pos = jax.lax.top_k(-cand_d, k)
            return (-neg_top, jnp.take_along_axis(cand_i, top_pos, axis=1)), None

        init = (
            jnp.full((row_tile, k), jnp.inf, dtype=coords.dtype),
            jnp.zeros((row_tile, k), dtype=jnp.int32),
        )
        (best_d, best_i), _ = jax.lax.scan(col_step, init, jnp.arange(n_col_tiles))
        return best_d, best_i

    d2, idx = jax.lax.map(row_block, jnp.arange(chunk_tiles))
    d2 = d2.reshape(chunk_tiles * row_tile, k)
    idx = idx.reshape(chunk_tiles * row_tile, k)
    # recompute exact distances via the difference form: the |a|²-2ab+|b|²
    # expansion loses precision for near-coincident points
    nb = coords[idx]
    row0 = row_lo_tile * row_tile
    q = jax.lax.dynamic_slice_in_dim(coords, row0, chunk_tiles * row_tile)
    diff = nb - q[:, None, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1)), idx


@partial(jax.jit, static_argnames=("k", "row_tile", "col_tile", "exclude_self", "chunk_tiles", "recall_target"))
def _knn_device_chunk_approx(
    coords: jax.Array,
    n_real: jax.Array,
    row_lo_tile: jax.Array,
    k: int,
    row_tile: int,
    col_tile: int,
    exclude_self: bool,
    chunk_tiles: int,
    recall_target: float,
) -> tuple[jax.Array, jax.Array]:
    """Brute-force sweep with TPU PartialReduce selection (`approx_min_k`).

    Per column tile the k best candidates come from one single-pass
    PartialReduce (no carried merge — carrying best-so-far THROUGH
    approx_min_k compounds its misses: measured 39% agreement); the
    per-tile winners stack and ONE exact top_k merges them. Measured at
    (1M, 16, k=15): 54 s vs 168 s for the exact lax.top_k merge sweep,
    98.5% neighbor agreement at recall_target=0.99 (recall 0.999 falls
    back to sort and costs 2.2× the exact path — don't raise it).
    """
    n_pad, d = coords.shape
    n_col_tiles = n_pad // col_tile
    col_ids = jnp.arange(n_pad, dtype=jnp.int32)

    def row_block(t: jax.Array) -> tuple[jax.Array, jax.Array]:
        r = row_lo_tile + t
        rows = jax.lax.dynamic_slice_in_dim(coords, r * row_tile, row_tile)
        row_idx = r * row_tile + jnp.arange(row_tile, dtype=jnp.int32)

        def col_step(c: jax.Array) -> tuple[jax.Array, jax.Array]:
            cols = jax.lax.dynamic_slice_in_dim(coords, c * col_tile, col_tile)
            cidx = jax.lax.dynamic_slice_in_dim(col_ids, c * col_tile, col_tile)
            d2 = pairwise_sq_dists(rows, cols)
            invalid = cidx[None, :] >= n_real
            if exclude_self:
                invalid = invalid | (cidx[None, :] == row_idx[:, None])
            d2 = jnp.where(invalid, jnp.inf, d2)
            vals, arg = jax.lax.approx_min_k(
                d2, k, recall_target=recall_target, aggregate_to_topk=True
            )
            return vals, cidx[arg]

        vals, idxs = jax.lax.map(col_step, jnp.arange(n_col_tiles))
        vals = jnp.moveaxis(vals, 0, 1).reshape(row_tile, n_col_tiles * k)
        idxs = jnp.moveaxis(idxs, 0, 1).reshape(row_tile, n_col_tiles * k)
        neg_top, pos = jax.lax.top_k(-vals, k)  # exact final merge
        return -neg_top, jnp.take_along_axis(idxs, pos, axis=1)

    d2, idx = jax.lax.map(row_block, jnp.arange(chunk_tiles))
    d2 = d2.reshape(chunk_tiles * row_tile, k)
    idx = idx.reshape(chunk_tiles * row_tile, k)
    nb = coords[idx]
    q = jax.lax.dynamic_slice_in_dim(coords, row_lo_tile * row_tile, chunk_tiles * row_tile)
    diff = nb - q[:, None, :]
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1)), idx


def brute_force_knn_approx(
    coords: np.ndarray,
    k: int,
    *,
    exclude_self: bool = True,
    recall_target: float = 0.99,
    row_tile: int = 1024,
    col_tile: int = 8192,
) -> tuple[np.ndarray, np.ndarray]:
    """High-recall approximate kNN for FEATURE-space graphs at scale.

    The reference's niche/cluster graphs are themselves approximate (scanpy
    ``pp.neighbors`` → pynndescent); this is the TPU counterpart — the same
    tiled MXU distance sweep as :func:`brute_force_knn` with single-pass
    PartialReduce selection per tile. ~3× faster at 1M (54 s vs 168 s),
    ≥98.5% neighbor agreement (measured). On CPU backends ``approx_min_k``
    lowers to the exact top-k, so results are exact there.
    """
    coords = np.ascontiguousarray(coords, dtype=np.float32)
    n = coords.shape[0]
    if k >= n:
        raise ValueError(f"Expected `n_neighs` < number of observations ({n}), found `{k}`.")
    row_tile = min(row_tile, max(8, n))
    col_tile = min(col_tile, max(128, n))
    n_row_tiles = (n + row_tile - 1) // row_tile
    chunk_tiles = max(1, min(n_row_tiles, int(_PAIRS_PER_DISPATCH // max(n * row_tile, 1))))
    n_col_tiles = (n + col_tile - 1) // col_tile
    n_chunks = (n_row_tiles + chunk_tiles - 1) // chunk_tiles
    n_pad = max(n_row_tiles * row_tile, n_col_tiles * col_tile, n_chunks * chunk_tiles * row_tile)
    coords_p = jnp.asarray(
        np.concatenate([coords, np.zeros((n_pad - n, coords.shape[1]), np.float32)])
    )
    n_dev = jnp.asarray(n, jnp.int32)
    parts = [
        _knn_device_chunk_approx(
            coords_p, n_dev, jnp.asarray(c * chunk_tiles, jnp.int32),
            k, row_tile, col_tile, exclude_self, chunk_tiles, recall_target,
        )
        for c in range(n_chunks)
    ]
    d = np.concatenate([np.asarray(p[0]) for p in parts])[:n]
    i = np.concatenate([np.asarray(p[1]) for p in parts])[:n]
    order = np.argsort(d, axis=1, kind="stable")
    return np.take_along_axis(d, order, axis=1), np.take_along_axis(i, order, axis=1)


@partial(jax.jit, static_argnames=("k", "row_tile", "col_tile", "exclude_self"))
def _knn_device(coords: jax.Array, k: int, row_tile: int, col_tile: int, exclude_self: bool) -> tuple[jax.Array, jax.Array]:
    n, d = coords.shape
    n_row_tiles = (n + row_tile - 1) // row_tile
    n_col_tiles = (n + col_tile - 1) // col_tile
    n_pad_rows = n_row_tiles * row_tile
    n_pad_cols = n_col_tiles * col_tile

    # one padded buffer serves both row and column slicing; phantom points are
    # masked out by index, not by coordinate
    n_pad = max(n_pad_rows, n_pad_cols)
    coords_p = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    col_ids = jnp.arange(n_pad_cols, dtype=jnp.int32)

    def row_block(r: jax.Array) -> tuple[jax.Array, jax.Array]:
        rows = jax.lax.dynamic_slice_in_dim(coords_p, r * row_tile, row_tile)
        row_idx = r * row_tile + jnp.arange(row_tile, dtype=jnp.int32)

        def col_step(carry: tuple[jax.Array, jax.Array], c: jax.Array) -> tuple[tuple[jax.Array, jax.Array], None]:
            best_d, best_i = carry
            cols = jax.lax.dynamic_slice_in_dim(coords_p, c * col_tile, col_tile)
            cidx = jax.lax.dynamic_slice_in_dim(col_ids, c * col_tile, col_tile)
            d2 = pairwise_sq_dists(rows, cols)
            invalid = cidx[None, :] >= n
            if exclude_self:
                invalid = invalid | (cidx[None, :] == row_idx[:, None])
            d2 = jnp.where(invalid, jnp.inf, d2)
            # merge candidates with running best
            cand_d = jnp.concatenate([best_d, d2], axis=1)
            cand_i = jnp.concatenate([best_i, jnp.broadcast_to(cidx[None, :], d2.shape)], axis=1)
            neg_top, top_pos = jax.lax.top_k(-cand_d, k)
            new_d = -neg_top
            new_i = jnp.take_along_axis(cand_i, top_pos, axis=1)
            return (new_d, new_i), None

        init = (
            jnp.full((row_tile, k), jnp.inf, dtype=coords.dtype),
            jnp.zeros((row_tile, k), dtype=jnp.int32),
        )
        (best_d, best_i), _ = jax.lax.scan(col_step, init, jnp.arange(n_col_tiles))
        return best_d, best_i

    dists2, idx = jax.lax.map(row_block, jnp.arange(n_row_tiles))
    dists2 = dists2.reshape(n_pad_rows, k)[:n]
    idx = idx.reshape(n_pad_rows, k)[:n]
    # recompute exact distances via the difference form: the |a|²-2ab+|b|²
    # expansion loses precision for near-coincident points
    nb = coords[idx]
    diff = nb - coords[:, None, :]
    exact = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    return exact, idx


def brute_force_knn(
    coords: np.ndarray,
    k: int,
    *,
    exclude_self: bool = True,
    row_tile: int = 1024,
    col_tile: int = 8192,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact euclidean kNN: returns ``(distances, indices)`` of shape ``(n, k)``.

    Results are sorted by ascending distance, matching sklearn's
    ``NearestNeighbors.kneighbors`` output contract.
    """
    coords = np.ascontiguousarray(coords, dtype=np.float32)
    n = coords.shape[0]
    if k >= n:
        raise ValueError(f"Expected `n_neighs` < number of observations ({n}), found `{k}`.")
    row_tile = min(row_tile, max(8, n))
    col_tile = min(col_tile, max(128, n))
    # bound pair evaluations per device call: one monolithic 1M×1M dispatch
    # runs for minutes and gets the remote worker killed (see
    # _knn_device_chunk); every chunk reuses one compiled executable
    n_row_tiles = (n + row_tile - 1) // row_tile
    chunk_tiles = max(1, min(n_row_tiles, int(_PAIRS_PER_DISPATCH // max(n * row_tile, 1))))
    if chunk_tiles >= n_row_tiles:
        d, i = _knn_device(jnp.asarray(coords), k, row_tile, col_tile, exclude_self)
        d = np.asarray(d)
        i = np.asarray(i)
    else:
        n_col_tiles = (n + col_tile - 1) // col_tile
        n_pad = max(n_row_tiles * row_tile, n_col_tiles * col_tile)
        # pad rows so every chunk is exactly chunk_tiles row tiles wide
        # (one executable); index masking keeps phantom rows inert
        n_chunks = (n_row_tiles + chunk_tiles - 1) // chunk_tiles
        n_pad = max(n_pad, n_chunks * chunk_tiles * row_tile)
        coords_p = jnp.asarray(
            np.concatenate([coords, np.zeros((n_pad - n, coords.shape[1]), np.float32)])
        )
        n_dev = jnp.asarray(n, jnp.int32)
        parts = [
            _knn_device_chunk(
                coords_p, n_dev, jnp.asarray(c * chunk_tiles, jnp.int32),
                k, row_tile, col_tile, exclude_self, chunk_tiles,
            )
            for c in range(n_chunks)
        ]
        d = np.concatenate([np.asarray(p[0]) for p in parts])[:n]
        i = np.concatenate([np.asarray(p[1]) for p in parts])[:n]
    order = np.argsort(d, axis=1, kind="stable")
    return np.take_along_axis(d, order, axis=1), np.take_along_axis(i, order, axis=1)


@partial(jax.jit, static_argnames=("k", "row_tile"))
def _cross_knn_device(queries: jax.Array, data: jax.Array, k: int, row_tile: int) -> tuple[jax.Array, jax.Array]:
    m = queries.shape[0]
    n_tiles = (m + row_tile - 1) // row_tile
    q_pad = jnp.pad(queries, ((0, n_tiles * row_tile - m), (0, 0)))

    def block(t: jax.Array) -> tuple[jax.Array, jax.Array]:
        rows = jax.lax.dynamic_slice_in_dim(q_pad, t * row_tile, row_tile)
        d2 = pairwise_sq_dists(rows, data)
        neg_top, idx = jax.lax.top_k(-d2, k)
        return -neg_top, idx

    d2, idx = jax.lax.map(block, jnp.arange(n_tiles))
    d2 = d2.reshape(-1, k)[:m]
    idx = idx.reshape(-1, k)[:m]
    nb = data[idx]
    diff = nb - queries[:, None, :]
    exact = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    return exact, idx


def cross_knn(queries: np.ndarray, data: "np.ndarray | jax.Array", k: int, *, row_tile: int = 2048) -> tuple[np.ndarray, np.ndarray]:
    """k nearest points of ``data`` for each query point (self-matches allowed),
    sorted ascending — the ``tree.kneighbors(queries)`` contract. ``data``
    may already live on device (no host round-trip)."""
    queries = np.ascontiguousarray(queries, dtype=np.float32)
    if isinstance(data, jax.Array):
        data = data.astype(jnp.float32) if data.dtype != jnp.float32 else data
    else:
        data = np.ascontiguousarray(data, dtype=np.float32)
    k = min(k, data.shape[0])
    if queries.shape[0] == 0 or k == 0:
        # sklearn's tree.query on an empty query set returns empty results;
        # match that rather than tracing a zero-row device kernel
        return (
            np.zeros((queries.shape[0], k), dtype=np.float32),
            np.zeros((queries.shape[0], k), dtype=np.int32),
        )
    d, i = _cross_knn_device(jnp.asarray(queries), jnp.asarray(data), k, min(row_tile, max(8, queries.shape[0])))
    d = np.asarray(d)
    i = np.asarray(i)
    order = np.argsort(d, axis=1, kind="stable")
    return np.take_along_axis(d, order, axis=1), np.take_along_axis(i, order, axis=1)


def radius_neighbors(
    coords: np.ndarray,
    radius: float,
    *,
    row_tile: int = 2048,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All neighbors within ``radius`` (inclusive), excluding self.

    Returns CSR-style ``(indptr, indices, distances)``. A single device pass
    computes each tile's exact difference-form distance block; counts and
    neighbor lists derive from the SAME block on host — two passes with
    different distance formulations disagree at threshold boundaries
    (the expansion form drifts on large coordinate offsets and on the MXU).
    """
    coords = np.ascontiguousarray(coords, dtype=np.float32)
    n = coords.shape[0]
    cj = jnp.asarray(coords)
    r2 = float(radius) ** 2

    @jax.jit
    def tile_dists(rows: jax.Array) -> jax.Array:
        diff = rows[:, None, :] - cj[None, :, :]
        return jnp.sum(diff * diff, axis=-1)

    step = min(row_tile, max(8, n))
    idx_parts: list[np.ndarray] = []
    dist_parts: list[np.ndarray] = []
    counts = np.zeros(n, dtype=np.int64)
    for start in range(0, n, step):
        stop = min(start + step, n)
        d2 = np.asarray(tile_dists(cj[start:stop]))
        for i in range(start, stop):
            row = d2[i - start]
            mask = row <= r2
            mask[i] = False
            cols = np.where(mask)[0]
            counts[i] = len(cols)
            idx_parts.append(cols.astype(np.int32))
            dist_parts.append(np.sqrt(row[cols]).astype(np.float32))

    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    indices = np.concatenate(idx_parts) if idx_parts else np.empty(0, dtype=np.int32)
    dists = np.concatenate(dist_parts) if dist_parts else np.empty(0, dtype=np.float32)
    return indptr, indices, dists
