"""Sepal: spatially variable genes via simulated diffusion.

API/semantics parity with /root/reference/src/squidpy/gr/_sepal.py:33-363
(grid graphs with max_neighs ∈ {4, 6}; score = dt × iterations to entropy
convergence). The per-gene diffusion loop runs as one batched device
``while_loop`` (:mod:`squidpy_tpu.ops.sepal`) instead of numba + threads.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any, Literal

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy.sparse import csr_matrix, issparse, isspmatrix_csr
from sklearn.metrics import pairwise_distances

from squidpy_tpu._constants._pkg_constants import Key
from squidpy_tpu.gr._utils import (
    _assert_connectivity_key,
    _assert_non_empty_sequence,
    _assert_spatial_basis,
    _extract_expression,
    _save_data,
    extract_adata_if_sdata,
)
from squidpy_tpu.utils import logg

__all__ = ["sepal"]


def sepal(
    adata: Any,
    max_neighs: Literal[4, 6],
    genes: str | Sequence[str] | None = None,
    n_iter: int | None = 30000,
    dt: float = 0.001,
    thresh: float = 1e-8,
    connectivity_key: str = Key.obsp.spatial_conn(),
    spatial_key: str = Key.obsm.spatial,
    layer: str | None = None,
    use_raw: bool = False,
    copy: bool = False,
    n_jobs: int | None = None,
    show_progress_bar: bool = True,
    *,
    table_key: str | None = None,
    gene_block_size: int = 512,
) -> pd.DataFrame | None:
    """Identify spatially variable genes with Sepal (diffusion simulation).

    Stores ``uns['sepal_score']``. NaN scores mean no convergence within
    ``n_iter`` — same contract as the reference.
    """
    adata = extract_adata_if_sdata(adata, table_key=table_key)
    _assert_connectivity_key(adata, connectivity_key)
    _assert_spatial_basis(adata, key=spatial_key)
    if max_neighs not in (4, 6):
        raise ValueError(f"Expected `max_neighs` to be either `4` or `6`, found `{max_neighs}`.")

    spatial = np.asarray(adata.obsm[spatial_key], dtype=np.float64)

    if genes is None:
        genes = adata.var_names.values
        if "highly_variable" in adata.var.columns:
            genes = genes[np.asarray(adata.var["highly_variable"].values, dtype=bool)]
    genes = _assert_non_empty_sequence(genes, name="genes")

    g = adata.obsp[connectivity_key]
    if not isspmatrix_csr(g):
        g = csr_matrix(g)
    g.eliminate_zeros()

    max_n = np.diff(g.indptr).max()
    if max_n != max_neighs:
        raise ValueError(f"Expected `max_neighs={max_neighs}`, found node with `{max_n}` neighbors.")

    sat, sat_idx, unsat, nearest_sat = _compute_idxs(g, spatial, max_neighs)
    # positions of nearest saturated nodes within the (sorted) `sat` array
    unsat_to_sat_pos = np.searchsorted(sat, nearest_sat).astype(np.int32)

    vals, genes = _extract_expression(adata, genes=genes, use_raw=use_raw, layer=layer)
    start = logg.info(f"Calculating sepal score for `{len(genes)}` genes on device")

    # session-scoped device expression: reuse/create the cached device X
    # (ships once, shared with spatial_autocorr/ligrec — _core/device_x.py)
    from squidpy_tpu._core.device_x import device_expression

    n_vars_src = adata.raw.n_vars if (use_raw and adata.raw is not None) else adata.n_vars
    dev_handle = device_expression(
        adata, layer=layer, use_raw=use_raw, create=2 * len(genes) >= n_vars_src
    )
    dev_cols = dev_handle.columns_of(list(map(str, genes))) if dev_handle is not None else None

    use_hex = max_neighs == 6
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    sat_j = jnp.asarray(sat)
    sat_idx_j = jnp.asarray(sat_idx)
    unsat_j = jnp.asarray(unsat)
    pos_j = jnp.asarray(unsat_to_sat_pos)

    # the diffusion while_loop holds several (n, g) f32 buffers (state +
    # rematerialized temps): (1M, 512) fails the compile-time HBM check at
    # 17.8 GB on a 16 GB chip — cap cells×genes per block (~2.7e8 keeps
    # ~9 GB peak, measured safe at 1M×256)
    per_block_budget = 270_000_000
    if adata.n_obs * gene_block_size > per_block_budget:
        gene_block_size = max(64, (per_block_budget // adata.n_obs) // 64 * 64)

    scores_parts: list[np.ndarray] = []
    for c0 in range(0, len(genes), gene_block_size):
        if dev_cols is not None:
            conc = dev_handle.dense_block(dev_cols[c0 : c0 + gene_block_size]).astype(dtype)
        else:
            block = vals[:, c0 : c0 + gene_block_size]
            if issparse(block):
                block = np.asarray(block.todense())
            conc = jnp.asarray(np.ascontiguousarray(block), dtype=dtype)
        from squidpy_tpu.parallel.sharded import auto_sepal_iters

        iters = auto_sepal_iters(
            conc, sat_j, sat_idx_j, unsat_j, pos_j, use_hex, int(n_iter), float(dt), float(thresh)
        )
        scores_parts.append(np.asarray(iters, dtype=np.float64) * dt)
    score = np.concatenate(scores_parts) if scores_parts else np.empty(0)

    key_added = "sepal_score"
    sepal_score = pd.DataFrame(score, index=genes, columns=[key_added])
    if sepal_score[key_added].isna().any():
        logg.warning("Found `NaN` in sepal scores, consider increasing `n_iter` to a higher value")
    sepal_score = sepal_score.sort_values(by=key_added, ascending=False)

    if copy:
        logg.info("Finish", time=start)
        return sepal_score

    _save_data(adata, attr="uns", key=key_added, data=sepal_score, time=start)


def _compute_idxs(
    g: csr_matrix, spatial: np.ndarray, sat_thresh: int, metric: str = "l1"
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Saturated/unsaturated node prep (reference: gr/_sepal.py:308-363),
    fully vectorized."""
    degrees = np.diff(g.indptr)
    nodes = np.arange(g.shape[0])
    sat = nodes[degrees == sat_thresh]
    unsat = nodes[degrees < sat_thresh]

    # neighbor table of saturated nodes: ragged-free since all have sat_thresh
    sat_idx = g.indices[
        (g.indptr[sat][:, None] + np.arange(sat_thresh)[None, :]).ravel()
    ].reshape(len(sat), sat_thresh).astype(np.int32)

    # nearest saturated neighbor of each unsaturated node: first saturated
    # node among its graph neighbors, else closest saturated node by `metric`
    is_sat = np.zeros(g.shape[0], dtype=bool)
    is_sat[sat] = True
    nearest_sat = np.full(len(unsat), -1, dtype=np.int64)
    for k, u in enumerate(unsat):
        neigh = g.indices[g.indptr[u] : g.indptr[u + 1]]
        sat_neigh = neigh[is_sat[neigh]]
        if len(sat_neigh):
            nearest_sat[k] = sat_neigh[0]
    missing = nearest_sat < 0
    if missing.any():
        dist = pairwise_distances(spatial[unsat[missing]], spatial[sat], metric=metric)
        nearest_sat[missing] = sat[np.argmin(dist, axis=1)]
    return sat, sat_idx, unsat, nearest_sat.astype(np.int32)
