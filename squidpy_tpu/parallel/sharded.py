"""Sharded variants of the core statistics for multi-chip meshes.

Sharding layout (SURVEY.md §2.2, §7): the **cell axis** of the padded ELL
graph is sharded across the mesh; the label vector is replicated (4 bytes/cell
— a few MB even at 10M cells), so neighbor gathers stay shard-local without
halo exchange, and per-shard cluster-pair counts reduce with one ``psum`` over
ICI. The **gene axis** of the expression matrix shards embarrassingly for
autocorrelation (the graph is replicated; ~100 MB at 1M cells × k=6).

Results are bitwise independent of the device count for the count kernels
(integer accumulation) — the sharding-invariance contract mirroring the
reference's n_jobs-invariance tests (tests/graph/test_nhood.py:62-71).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from squidpy_tpu.ops.autocorr import moran_scores
from squidpy_tpu.utils import chunked_vmap

__all__ = [
    "sharded_pair_counts",
    "sharded_permuted_pair_counts",
    "sharded_permuted_pair_counts_cols",
    "auto_permuted_pair_counts_cols",
    "sharded_moran_scores",
    "sharded_ligrec_counts",
    "sharded_cooccur_counts",
    "auto_permuted_pair_counts",
    "auto_ligrec_counts",
    "auto_cooccur_counts",
    "sharded_binned_pair_counts",
    "auto_binned_pair_counts",
    "auto_sepal_iters",
    "batch0_sharded",
]


def _pair_counts_local(indices, mask, row_labels, full_labels, n_cls):
    """Per-shard cluster-pair counts; identical math to
    :func:`squidpy_tpu.ops.nhood.cluster_pair_counts` but with the source-row
    labels taken from the shard and neighbor labels from the replicated table.
    int32, exact at any shard size (psum over int shards stays exact)."""
    from squidpy_tpu.ops.nhood import exact_pair_counts

    return exact_pair_counts(indices, mask, row_labels.astype(jnp.int32), full_labels.astype(jnp.int32), n_cls)


def sharded_pair_counts(
    mesh: Mesh,
    indices: jax.Array,
    mask: jax.Array,
    labels: jax.Array,
    n_cls: int,
) -> jax.Array:
    """Cluster-pair counts with the cell axis sharded over ``mesh``.

    ``indices``/``mask`` rows are sharded; ``labels`` is replicated. One psum
    over the cell axis produces the replicated (n_cls, n_cls) result.
    """
    axis = mesh.axis_names[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis), P()),
        out_specs=P(),
    )
    def f(idx_s, mask_s, row_labels_s, full_labels):
        part = _pair_counts_local(idx_s, mask_s, row_labels_s, full_labels, n_cls)
        return jax.lax.psum(part, axis)

    return f(indices, mask, labels, labels)


def sharded_permuted_pair_counts(
    mesh: Mesh,
    indices: jax.Array,
    mask: jax.Array,
    shuffled_labels: jax.Array,
    n_cls: int,
    *,
    chunk_size: int | None = None,
) -> jax.Array:
    """Batched permutation counts with cells sharded and the permutation batch
    replicated: each device counts its row shard for every permutation, then
    one psum merges shards. Bitwise equal to the single-device result."""
    axis = mesh.axis_names[0]
    n, k = indices.shape
    if chunk_size is None:
        n_dev = mesh.size
        bytes_per_perm = 4 * (n // max(n_dev, 1)) * (k * n_cls + n_cls + k)
        chunk_size = max(1, min(shuffled_labels.shape[0], int(2e9 // max(bytes_per_perm, 1))))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(None, axis), P(None, None)),
        out_specs=P(),
    )
    def f(idx_s, mask_s, row_lab_s, full_lab):
        # row_lab_s: (n_perms, n/shard) — the shard's slice of each shuffle
        def one(row_labels, full_labels):
            return _pair_counts_local(idx_s, mask_s, row_labels, full_labels, n_cls)

        parts = chunked_vmap(one, (row_lab_s, full_lab), chunk_size=chunk_size)
        return jax.lax.psum(parts, axis)

    return f(indices, mask, shuffled_labels, shuffled_labels)


def sharded_permuted_pair_counts_cols(
    mesh: Mesh,
    indices: jax.Array,
    mask: jax.Array,
    shuffled_cols: jax.Array,
    n_cls: int,
) -> jax.Array:
    """Column-layout batched permutation counts with the cell axis sharded.

    ``shuffled_cols`` is ``(n, n_perms)``; each device holds its row shard as
    the source labels plus the full replicated table for neighbor gathers, and
    one int32 psum merges the shards — bitwise equal to the single-device
    kernel (:func:`squidpy_tpu.ops.nhood.permuted_pair_counts_cols`).
    """
    from squidpy_tpu.ops.nhood import _pair_counts_cols_kernel

    axis = mesh.axis_names[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(None, None)),
        out_specs=P(),
    )
    def f(idx_s, mask_s, src_cols_s, table_cols):
        part = _pair_counts_cols_kernel(idx_s, mask_s, src_cols_s, table_cols, n_cls)
        return jax.lax.psum(part, axis)

    return f(indices, mask, shuffled_cols, shuffled_cols)


def auto_permuted_pair_counts_cols(
    indices: jax.Array,
    mask: jax.Array,
    shuffled_cols: jax.Array,
    n_cls: int,
) -> jax.Array:
    """Column-layout permutation counts, cell-sharded over all local devices
    when more than one is available (padded rows are mask-false and contribute
    nothing). Bitwise equal to the single-device kernel."""
    from squidpy_tpu.ops.nhood import permuted_pair_counts_cols
    from squidpy_tpu.parallel.mesh import cell_mesh

    n_dev = jax.device_count()
    if n_dev <= 1:
        return permuted_pair_counts_cols(indices, mask, shuffled_cols, n_cls)

    n = indices.shape[0]
    pad = (-n) % n_dev
    if pad:
        indices = jnp.pad(indices, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
        shuffled_cols = jnp.pad(shuffled_cols, ((0, pad), (0, 0)))
    return sharded_permuted_pair_counts_cols(cell_mesh(), indices, mask, shuffled_cols, n_cls)


def auto_permuted_pair_counts(
    indices: jax.Array,
    mask: jax.Array,
    shuffled_labels: jax.Array,
    n_cls: int,
) -> jax.Array:
    """Batched permutation counts, sharded over all local devices when more
    than one is available (cell axis padded to the mesh size; padded rows are
    mask-false and contribute nothing). Bitwise equal to the single-device
    kernel — the sharding-invariance contract."""
    from squidpy_tpu.ops.nhood import permuted_pair_counts
    from squidpy_tpu.parallel.mesh import cell_mesh

    n_dev = jax.device_count()
    if n_dev <= 1:
        return permuted_pair_counts(indices, mask, shuffled_labels, n_cls)

    n = indices.shape[0]
    pad = (-n) % n_dev
    if pad:
        indices = jnp.pad(indices, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
        shuffled_labels = jnp.pad(shuffled_labels, ((0, 0), (0, pad)))
    return sharded_permuted_pair_counts(cell_mesh(), indices, mask, shuffled_labels, n_cls)


def sharded_moran_scores(
    mesh: Mesh,
    indices: jax.Array,
    weights: jax.Array,
    x: jax.Array,
    s0: float,
    *,
    gene_axis: str | None = None,
) -> jax.Array:
    """Moran's I with the gene axis sharded over the mesh (graph replicated)."""
    axis = gene_axis or mesh.axis_names[0]
    x_sharding = NamedSharding(mesh, P(None, axis))
    rep = NamedSharding(mesh, P())
    x = jax.device_put(x, x_sharding)
    indices = jax.device_put(indices, rep)
    weights = jax.device_put(weights, rep)

    @partial(jax.jit, out_shardings=NamedSharding(mesh, P(axis)))
    def f(idx, w, xx):
        return moran_scores(idx, w, xx, jnp.asarray(s0, xx.dtype))

    return f(indices, weights, x)


def sharded_ligrec_counts(
    mesh: Mesh,
    x: jax.Array,
    shuffled_labels: jax.Array,
    counts_per_cluster: jax.Array,
    rec: jax.Array,
    lig: jax.Array,
    c1: jax.Array,
    c2: jax.Array,
    m_sum: jax.Array,
    n_cls: int,
    *,
    chunk_size: int | None = None,
    exact_bf16: bool = False,
) -> jax.Array:
    """Ligrec exceedance counts with the **permutation axis** sharded.

    This is the direct TPU mapping of the reference's permutation-level data
    parallelism (SURVEY §2.2: joblib fans permutation chunks over a loky pool,
    /root/reference/src/squidpy/gr/_ligrec.py:766-782): each device computes
    complete permutations for its slice of the batch — identical per-perm math
    to the single-device kernel — and the integer exceedance counts merge with
    one ``psum``. Exactness of integer accumulation makes the result bitwise
    independent of the device count.

    ``shuffled_labels`` rows beyond the true permutation count (padding for
    divisibility) must carry weight 0 via ``perm_weights`` handled by
    :func:`auto_ligrec_counts`.
    """
    return _sharded_ligrec_weighted(
        mesh, x, shuffled_labels,
        jnp.ones((shuffled_labels.shape[0],), jnp.float32),
        counts_per_cluster, rec, lig, c1, c2, m_sum, n_cls,
        chunk_size=chunk_size, exact_bf16=exact_bf16,
    )


def _sharded_ligrec_weighted(
    mesh: Mesh,
    x: jax.Array,
    shuffled_labels: jax.Array,
    perm_weights: jax.Array,
    counts_per_cluster: jax.Array,
    rec: jax.Array,
    lig: jax.Array,
    c1: jax.Array,
    c2: jax.Array,
    m_sum: jax.Array,
    n_cls: int,
    *,
    chunk_size: int | None = None,
    exact_bf16: bool = False,
) -> jax.Array:
    from squidpy_tpu.ops.ligrec import _perm_counts_scan

    axis = mesh.axis_names[0]
    inv_counts = (1.0 / jnp.where(counts_per_cluster == 0, 1.0, counts_per_cluster)).astype(x.dtype)
    perms_per_shard = max(1, shuffled_labels.shape[0] // mesh.size)
    if chunk_size is None:
        # same even-chunk policy as the single-device kernel, per shard
        chunk_max = int(max(1, min(perms_per_shard, 1.2e9 // max(4 * x.shape[0] * n_cls, 1))))
        n_chunks = -(-perms_per_shard // chunk_max)
        chunk_size = -(-perms_per_shard // n_chunks)
    chunk_size = min(chunk_size, perms_per_shard)
    # each shard's perm count must be chunk-divisible: pad per shard is not
    # expressible, so require divisibility here (auto wrapper pads globally)
    if perms_per_shard % chunk_size:
        chunk_size = 1 if perms_per_shard == 1 else next(
            c for c in range(chunk_size, 0, -1) if perms_per_shard % c == 0
        )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def f(x_r, lab_s, w_s, rec_r, lig_r, c1_r, c2_r, m_sum_r):
        part = _perm_counts_scan(
            x_r, lab_s, w_s.astype(x_r.dtype), inv_counts,
            rec_r, lig_r, c1_r, c2_r, m_sum_r, n_cls, chunk_size, exact_bf16,
        )
        return jax.lax.psum(part, axis)

    return f(x, shuffled_labels, perm_weights, rec, lig, c1, c2, m_sum)


def auto_ligrec_counts(
    x: jax.Array,
    shuffled_labels: jax.Array,
    counts_per_cluster: jax.Array,
    rec: jax.Array,
    lig: jax.Array,
    c1: jax.Array,
    c2: jax.Array,
    m_sum: jax.Array,
    n_cls: int,
    exact_bf16: bool = False,
) -> jax.Array:
    """Perm-sharded ligrec counts across all local devices when available
    (permutation axis padded with zero-weight rows for divisibility);
    single-device kernel otherwise. Bitwise equal either way."""
    from squidpy_tpu.ops.ligrec import ligrec_perm_counts
    from squidpy_tpu.parallel.mesh import default_mesh

    n_dev = jax.device_count()
    if n_dev <= 1:
        return ligrec_perm_counts(
            x, shuffled_labels, counts_per_cluster, rec, lig, c1, c2, m_sum, n_cls,
            exact_bf16=exact_bf16,
        )
    n_perms = shuffled_labels.shape[0]
    pad = (-n_perms) % n_dev
    weights = jnp.ones((n_perms + pad,), jnp.float32).at[n_perms:].set(0.0)
    if pad:
        shuffled_labels = jnp.concatenate(
            [shuffled_labels, jnp.repeat(shuffled_labels[:1], pad, axis=0)], axis=0
        )
    return _sharded_ligrec_weighted(
        default_mesh(axis_name="perms"), x, shuffled_labels, weights,
        counts_per_cluster, rec, lig, c1, c2, m_sum, n_cls, exact_bf16=exact_bf16,
    )


def _cooccur_block_setup(
    coords: jax.Array, labels: jax.Array, n_cls: int, tile: int
) -> tuple[jax.Array, jax.Array, np.ndarray, np.ndarray, int]:
    """Shared triangular-sweep preparation: tile-padded coordinates/one-hots
    plus the upper-triangle block-pair lists. One helper keeps the single-
    and multi-device paths structurally identical (the bitwise
    device-count-invariance contract depends on them agreeing)."""
    from squidpy_tpu.ops.cooccur import triangular_block_pairs

    n = coords.shape[0]
    t = min(tile, max(8, n))
    n_pad = (-(-n // t)) * t
    coords_p = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    onehot_p = jnp.pad(
        jax.nn.one_hot(labels, n_cls, dtype=coords.dtype), ((0, n_pad - n), (0, 0))
    )
    ti, tj = triangular_block_pairs(n, t)
    return coords_p, onehot_p, ti, tj, t


def sharded_cooccur_counts(
    mesh: Mesh,
    coords: jax.Array,
    labels: jax.Array,
    thresholds: jax.Array,
    n_cls: int,
    *,
    tile: int = 2048,
) -> jax.Array:
    """Co-occurrence pair counts ``(2, L, C, C)`` digits with the
    **triangular block-pair list** sharded across the mesh.

    The symmetric O(n²) sweep visits only upper-triangle ``(tile, tile)``
    blocks (half the distance work of a full row sweep); the block-pair list
    is round-robin sharded so every device sweeps an equal number of blocks
    against the replicated coordinates, and the exact integer digit pairs
    merge with one ``psum`` — bitwise equal to the single-device kernel.
    """
    from squidpy_tpu.ops.cooccur import (
        cooccur_block_pairs_device,
        ordered_from_upper_digits,
    )

    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    n = coords.shape[0]
    coords_p, onehot_p, ti, tj, t = _cooccur_block_setup(coords, labels, n_cls, tile)
    pad_b = (-len(ti)) % n_dev
    if pad_b:
        ti = np.concatenate([ti, np.full(pad_b, -1, np.int32)])
        tj = np.concatenate([tj, np.zeros(pad_b, np.int32)])

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P()),
        out_specs=P(),
    )
    def f(coords_r, oh_r, ti_s, tj_s, thr):
        from squidpy_tpu.ops.cooccur import digit_normalize

        d = cooccur_block_pairs_device(coords_r, oh_r, n, ti_s, tj_s, thr, n_cls, t, vary_axis=axis)
        a1 = jax.lax.psum(d[0], axis)
        a0 = jax.lax.psum(d[1], axis)
        return digit_normalize(a1, a0)

    upper = f(coords_p, onehot_p, jnp.asarray(ti), jnp.asarray(tj), thresholds)
    return ordered_from_upper_digits(upper)


def auto_cooccur_counts(
    coords: jax.Array,
    labels: jax.Array,
    thresholds: jax.Array,
    n_cls: int,
    *,
    row_tile: int = 2048,
) -> jax.Array:
    """Co-occurrence counts digits ``(2, L, C, C)``: triangular block-pair
    sweep, pair-sharded across all local devices when available. Bitwise
    equal at any device count (exact integer digits)."""
    from squidpy_tpu.ops.cooccur import (
        cooccur_block_pairs_device,
        ordered_from_upper_digits,
    )
    from squidpy_tpu.parallel.mesh import default_mesh

    n = coords.shape[0]
    n_dev = jax.device_count()
    if n_dev > 1:
        return sharded_cooccur_counts(
            default_mesh(axis_name="pairs"), coords, labels, thresholds, n_cls,
            tile=row_tile,
        )
    coords_p, onehot_p, ti, tj, t = _cooccur_block_setup(coords, labels, n_cls, row_tile)
    upper = cooccur_block_pairs_device(
        coords_p, onehot_p, n, jnp.asarray(ti), jnp.asarray(tj), thresholds, n_cls, t
    )
    return ordered_from_upper_digits(upper)


def sharded_binned_pair_counts(
    mesh: Mesh,
    coords_s: np.ndarray,
    labels_s: np.ndarray,
    plan,  # BinnedPairPlan
    n_cls: int,
) -> jax.Array:
    """Binned boundary-block pair counts with the **work-item list** sharded
    across the mesh (round-robin over (block, threshold-group) items; exact
    integer digits merge with one ``psum`` — bitwise device-count-invariant).
    The analytic full-block half of the statistic is host-side and
    device-independent."""
    from squidpy_tpu.ops.cooccur import digit_normalize
    from squidpy_tpu.ops.pairbins import binned_pair_counts_device

    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    n = plan.n
    coords_p = jnp.pad(jnp.asarray(coords_s), ((0, plan.n_pad - n), (0, 0)))
    onehot_p = jnp.pad(
        jax.nn.one_hot(jnp.asarray(labels_s), n_cls, dtype=jnp.float32),
        ((0, plan.n_pad - n), (0, 0)),
    )
    ti, tj, rf, gid = plan.ti, plan.tj, plan.rfull, plan.gid
    pad_b = (-len(ti)) % n_dev
    if pad_b:
        ti = np.concatenate([ti, np.full(pad_b, -1, np.int32)])
        tj = np.concatenate([tj, np.zeros(pad_b, np.int32)])
        rf = np.concatenate([rf, np.zeros(pad_b, np.int32)])
        gid = np.concatenate([gid, np.zeros(pad_b, np.int32)])

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(),
    )
    def f(coords_r, oh_r, ti_s, tj_s, rf_s, gid_s, thr_g, offs):
        d = binned_pair_counts_device(
            coords_r, oh_r, n, ti_s, tj_s, rf_s, gid_s, thr_g, offs,
            n_cls, plan.tile, plan.gsize, vary_axis=axis,
        )
        a1 = jax.lax.psum(d[0], axis)
        a0 = jax.lax.psum(d[1], axis)
        return digit_normalize(a1, a0)

    return f(
        coords_p, onehot_p, jnp.asarray(ti), jnp.asarray(tj), jnp.asarray(rf),
        jnp.asarray(gid), jnp.asarray(plan.thr_groups), jnp.asarray(plan.offsets),
    )


def auto_binned_pair_counts(
    coords_s: np.ndarray,
    labels_s: np.ndarray,
    plan,  # BinnedPairPlan
    n_cls: int,
) -> jax.Array:
    """Binned pair-count digits ``(2, G, gsize, C, C)``: item-sharded across
    all local devices when available, single-device otherwise. Bitwise equal
    at any device count (exact integer digits)."""
    from squidpy_tpu.ops.pairbins import binned_pair_counts_device
    from squidpy_tpu.parallel.mesh import default_mesh

    if jax.device_count() > 1:
        return sharded_binned_pair_counts(
            default_mesh(axis_name="pairs"), coords_s, labels_s, plan, n_cls
        )
    n = plan.n
    coords_p = jnp.pad(jnp.asarray(coords_s), ((0, plan.n_pad - n), (0, 0)))
    onehot_p = jnp.pad(
        jax.nn.one_hot(jnp.asarray(labels_s), n_cls, dtype=jnp.float32),
        ((0, plan.n_pad - n), (0, 0)),
    )
    return binned_pair_counts_device(
        coords_p, onehot_p, n, jnp.asarray(plan.ti), jnp.asarray(plan.tj),
        jnp.asarray(plan.rfull), jnp.asarray(plan.gid),
        jnp.asarray(plan.thr_groups), jnp.asarray(plan.offsets),
        n_cls, plan.tile, plan.gsize,
    )


def auto_sepal_iters(
    conc0: jax.Array,
    sat: jax.Array,
    sat_idx: jax.Array,
    unsat: jax.Array,
    unsat_to_sat_pos: jax.Array,
    use_hex: bool,
    n_iter: int,
    dt: float,
    thresh: float,
) -> jax.Array:
    """Sepal convergence iterations with the **gene axis** sharded.

    Each device runs its own independent ``while_loop`` over its gene shard
    (graph/stencil arrays replicated), so shards stop as soon as *their*
    genes converge — no per-iteration collectives, and per-gene results are
    bitwise identical to the single-device kernel. Replaces the reference's
    thread pool over genes (/root/reference/src/squidpy/gr/_sepal.py:199-206).
    Padding replicates the first gene column (zero columns would never
    converge and pin a shard at ``n_iter``).
    """
    from squidpy_tpu.ops.sepal import sepal_diffusion
    from squidpy_tpu.parallel.mesh import default_mesh

    n_dev = jax.device_count()
    n_genes = conc0.shape[1]
    if n_dev <= 1 or n_genes < n_dev:
        return sepal_diffusion(
            conc0, sat, sat_idx, unsat, unsat_to_sat_pos, use_hex, n_iter, dt, thresh
        )
    pad = (-n_genes) % n_dev
    if pad:
        conc0 = jnp.concatenate([conc0, jnp.repeat(conc0[:, :1], pad, axis=1)], axis=1)
    mesh = default_mesh(axis_name="genes")
    axis = mesh.axis_names[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(), P(None, None), P(), P()),
        out_specs=P(axis),
        # the while_loop carry mixes shard-varying (conc) and literal-derived
        # (prev_ent/active/done) components; skip the varying-axes check
        check_vma=False,
    )
    def f(conc_s, sat_r, sat_idx_r, unsat_r, u2s_r):
        return sepal_diffusion(
            conc_s, sat_r, sat_idx_r, unsat_r, u2s_r, use_hex, n_iter, dt, thresh
        )

    out = f(conc0, sat, sat_idx, unsat, unsat_to_sat_pos)
    return out[:n_genes] if pad else out


def batch0_sharded(x: jax.Array) -> tuple[jax.Array, int]:
    """Shard ``x`` along axis 0 over all local devices (pad rows replicated
    from row 0 for divisibility; caller strips to the returned true length).

    This is the crop-batch data parallelism for image featurization
    (reference: ``parallelize`` over ``adata.obs_names``,
    /root/reference/src/squidpy/im/_feature.py:90-97): per-crop computations
    are independent, so GSPMD partitions the downstream jitted kernel without
    any collective until the host gathers results.
    """
    from squidpy_tpu.parallel.mesh import default_mesh

    n = x.shape[0]
    n_dev = jax.device_count()
    if n_dev <= 1 or n < n_dev:
        return x, n
    pad = (-n) % n_dev
    if pad:
        x = jnp.concatenate([x, jnp.repeat(x[:1], pad, axis=0)], axis=0)
    mesh = default_mesh(axis_name="crops")
    sharding = NamedSharding(mesh, P("crops", *([None] * (x.ndim - 1))))
    return jax.device_put(x, sharding), n
