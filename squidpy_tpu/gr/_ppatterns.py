"""Point-pattern spatial statistics: spatial autocorrelation and co-occurrence.

API/semantics parity with /root/reference/src/squidpy/gr/_ppatterns.py:56-559.
Scores and permutations run on device (:mod:`squidpy_tpu.ops.autocorr`,
:mod:`squidpy_tpu.ops.cooccur`); analytic moments/p-values are closed-form
host numpy following the same Cliff & Ord formulas.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any, Literal

import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy import sparse as sp
from scipy import stats

from squidpy_tpu._constants._constants import SpatialAutocorr
from squidpy_tpu._constants._pkg_constants import Key
from squidpy_tpu._core.graph import SpatialGraph
from squidpy_tpu._core.index_cipher import MIN_CIPHER_N, cipher_index_batch
from squidpy_tpu._core.rng import permutation_batch, spawn_keys
from squidpy_tpu.gr._utils import (
    _assert_categorical_obs,
    _assert_connectivity_key,
    _assert_spatial_basis,
    _save_data,
    extract_adata_if_sdata,
)
from squidpy_tpu.ops.autocorr import (
    geary_perm_scores,
    geary_scores,
    geary_scores_bucketed,
    geary_scores_from_u,
    moran_perm_scores,
    moran_scores,
    moran_scores_bucketed,
    moran_scores_from_u,
    spmv_genes,
    spmv_genes_bucketed,
)
from squidpy_tpu.ops.cooccur import co_occurrence_counts, co_occurrence_probs
from squidpy_tpu.utils import NDArrayA, assert_positive, deprecated_params, logg
from squidpy_tpu.utils._stats import multipletests
from squidpy_tpu.utils._validators import assert_key_in_adata

__all__ = ["spatial_autocorr", "co_occurrence"]


def _to_dense_block(X: Any, col_slice: slice) -> np.ndarray:
    import jax

    block = X[:, col_slice]
    if sp.issparse(block):
        block = np.asarray(block.todense())
    # float64 when x64 is enabled (CPU parity tests); float32 on TPU
    dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
    return np.ascontiguousarray(np.asarray(block, dtype=dtype))


def spatial_autocorr(
    adata: Any,
    connectivity_key: str = Key.obsp.spatial_conn(),
    genes: str | int | Sequence[str] | Sequence[int] | None = None,
    mode: SpatialAutocorr | Literal["moran", "geary"] = "moran",
    transformation: bool = True,
    n_perms: int | None = None,
    two_tailed: bool = False,
    corr_method: str | None = "fdr_bh",
    attr: Literal["obs", "X", "obsm"] = "X",
    layer: str | None = None,
    seed: int | None = None,
    use_raw: bool = False,
    copy: bool = False,
    n_jobs: int | None = None,
    backend: str = "loky",
    show_progress_bar: bool = True,
    *,
    table_key: str | None = None,
    gene_block_size: int | None = None,
    cache: bool | str = False,
) -> pd.DataFrame | None:
    """Global spatial autocorrelation (Moran's I or Geary's C) per feature.

    Scores are one batched ELL SpMV per gene block; the permutation null
    reuses the precomputed ``W z`` so each permutation is an O(n) gather-dot
    (see :mod:`squidpy_tpu.ops.autocorr`). Analytic normality p-values follow
    Cliff & Ord (reference formulas at gr/_ppatterns.py:501-559, including the
    corrected Geary variance from issue #1183).

    ``cache`` (``True`` or a directory) memoizes the raw scores and
    permutation sims on disk keyed by graph/expression/seed; requires an
    explicit ``seed`` when ``n_perms`` is set, and is skipped (with a warning)
    for expression matrices too large to fingerprint cheaply.

    Stores the result DataFrame under ``uns['moranI']`` / ``uns['gearyC']``.
    """
    adata = extract_adata_if_sdata(adata, table_key=table_key)
    _assert_connectivity_key(adata, connectivity_key)

    def extract_X(adata: Any, genes: Any) -> tuple[Any, Sequence[Any]]:
        if genes is None:
            if "highly_variable" in adata.var:
                genes = adata.var_names.values[np.asarray(adata.var["highly_variable"], dtype=bool)]
            else:
                genes = adata.var_names.values
        elif isinstance(genes, str):
            genes = [genes]
        genes = list(genes)
        if not use_raw:
            subset = adata[:, genes]
            return (subset.X if layer is None else subset.layers[layer]), genes
        if adata.raw is None:
            raise AttributeError("No `.raw` attribute found. Try specifying `use_raw=False`.")
        genes = [g for g in genes if g in set(adata.raw.var_names)]
        return adata.raw[:, genes].X, genes

    def extract_obs(adata: Any, cols: Any) -> tuple[Any, Sequence[Any]]:
        if cols is None:
            df = adata.obs.select_dtypes(include=np.number)
            return df.to_numpy(), list(df.columns)
        if isinstance(cols, str):
            cols = [cols]
        return adata.obs[list(cols)].to_numpy(), list(cols)

    def extract_obsm(adata: Any, ixs: Any) -> tuple[Any, Sequence[Any]]:
        assert_key_in_adata(adata, layer, attr="obsm")
        if ixs is None:
            ixs = list(np.arange(np.asarray(adata.obsm[layer]).shape[1]))
        ixs = list(np.ravel([ixs]))
        return np.asarray(adata.obsm[layer])[:, ixs], ixs

    if attr == "X":
        vals, index = extract_X(adata, genes)
    elif attr == "obs":
        vals, index = extract_obs(adata, genes)
    elif attr == "obsm":
        vals, index = extract_obsm(adata, genes)
    else:
        raise NotImplementedError(f"Extracting from `adata.{attr}` is not yet implemented.")

    # session-scoped device expression: X ships once (narrowest lossless
    # container) and every gene block is sliced/densified on device — shared
    # with ligrec/sepal via the same adata.uns cache (_core/device_x.py)
    dev_handle = dev_cols = None
    if attr == "X":
        from squidpy_tpu._core.device_x import device_expression

        n_vars_src = adata.raw.n_vars if (use_raw and adata.raw is not None) else adata.n_vars
        dev_handle = device_expression(
            adata, layer=layer, use_raw=use_raw,
            # don't force the whole matrix onto the device for a small gene
            # subset; an already-cached handle is reused either way
            create=2 * len(index) >= n_vars_src,
        )
        if dev_handle is not None:
            dev_cols = dev_handle.columns_of(list(map(str, index)))

    mode = SpatialAutocorr(mode)
    params: dict[str, Any] = {"mode": mode.s, "transformation": transformation, "two_tailed": two_tailed}
    if mode == SpatialAutocorr.MORAN:
        params["stat"] = "I"
        params["expected"] = -1.0 / (adata.shape[0] - 1)
        params["ascending"] = False
    else:
        params["stat"] = "C"
        params["expected"] = 1.0
        params["ascending"] = True

    g_csr = sp.csr_matrix(adata.obsp[connectivity_key], copy=True)
    if transformation:  # l1 row-normalize
        row_sums = np.asarray(g_csr.sum(axis=1)).ravel()
        scale = np.divide(1.0, row_sums, out=np.zeros_like(row_sums, dtype=float), where=row_sums != 0)
        g_csr = sp.diags(scale) @ g_csr
        g_csr = sp.csr_matrix(g_csr)

    graph = SpatialGraph.from_csr(g_csr)
    # skewed-degree graphs (radius graphs with dense cores): run the ELL
    # passes per degree bucket so rows only pay their own k_b, not the
    # global k_max (None for kNN graphs and anything already tight)
    buckets = graph.degree_buckets()
    if buckets is not None:
        logg.info(f"Using `{len(buckets)}` degree buckets for the skewed graph")

    def _spmv(y: Any, group: int | None = None) -> Any:
        kw = {} if group is None else {"group": group}
        if buckets is not None:
            return spmv_genes_bucketed(buckets, y, **kw)
        return spmv_genes(graph.indices, graph.weights, y, **kw)

    def _moran(y: Any, s0_: Any) -> Any:
        if buckets is not None:
            return moran_scores_bucketed(buckets, y, s0_)
        return moran_scores(graph.indices, graph.weights, y, s0_)

    def _geary(y: Any, s0_: Any) -> Any:
        if buckets is not None:
            return geary_scores_bucketed(buckets, y, s0_)
        return geary_scores(graph.indices, graph.weights, y, s0_)

    s0 = float(g_csr.sum())
    if s0 == 0.0:
        # edgeless graph: the statistic is undefined (the reference's numpy
        # path yields 0/0 → NaN with a RuntimeWarning); propagate NaN rather
        # than raising ZeroDivisionError from the Python-scalar `n / s0`
        logg.warning("The spatial graph has no edges; autocorrelation scores will be `NaN`")
        s0 = float("nan")
    n_cells, n_feats = np.asarray(vals).shape if not sp.issparse(vals) else vals.shape
    if gene_block_size is None:
        # keep the (n_cells, block) expression buffer + grouped-unroll gather
        # slabs within ~2.5 GB of HBM; measured on the v5e at 1M cells with
        # forced readbacks: 512-wide blocks are the sweet spot (0.095 s/block
        # fused score kernel → 2.75 s / 15k genes; wider rows amortize gather
        # issue cost, 1024 OOMs the unrolled gathers), so prefer 512 whenever
        # memory allows
        gene_block_size = int(np.clip(2.5e9 // max(4 * n_cells, 1), 64, 512))

    start = logg.info(f"Calculating {mode}'s statistic for `{n_perms}` permutations on device")

    if n_perms is not None:
        assert_positive(n_perms, name="n_perms")
        keys = spawn_keys(seed, n_perms)
        if n_cells >= MIN_CIPHER_N:
            # O(n) keyed index cipher: no per-permutation sort
            perms_idx = cipher_index_batch(keys, n_cells)
        else:
            perms_idx = permutation_batch(keys, jnp.arange(n_cells))
    else:
        perms_idx = None

    import jax

    n_dev = jax.device_count()
    gene_sharding = None
    if n_dev > 1:
        # genes are embarrassingly parallel: shard the gene axis over all
        # local devices (graph arrays are replicated by jit automatically)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from squidpy_tpu.parallel.mesh import default_mesh

        gene_sharding = NamedSharding(default_mesh(axis_name="genes"), P(None, "genes"))

    # permutation gather precision: the per-perm O(n·g) row gather of u = Wz
    # is the entire permutation-mode cost, and the gather engine saturates
    # (~150 GB/s) only at ~2 KB rows. At scale, gather u in bf16 over a
    # 2×-wider gene superblock: same 2 KB rows, half the bytes per gene —
    # null sims shift ~1e-3 relative (products still accumulate full
    # precision against z), far below permutation resolution. Scores and
    # analytic p-values never touch this path.
    gather_bf16 = (not jax.config.jax_enable_x64) and n_cells >= (1 << 19)
    # at scale z also streams in bf16, which frees the HBM for a 4×-wide
    # superblock (2048-gene = 4 KB gather rows, the measured gather-engine
    # sweet spot); sims shift ≲1e-3 relative — see ops/autocorr.py. Geary
    # buffers the SAME two (n, w) vectors as Moran: the third term of the
    # permuted numerator, Σ_i (W z²)_{p(i)}, is permutation-invariant (p is a
    # bijection) and collapses to a per-gene constant Σ_j colsum_j z_j².
    perm_width = 4 * gene_block_size if gather_bf16 else gene_block_size

    def _score_blocks() -> dict[str, np.ndarray]:
        score_parts: list[np.ndarray] = []
        sims_parts: list[np.ndarray] = []
        # cast to the backend float BEFORE jnp.asarray: an explicit f64
        # numpy operand on a non-x64 backend emits a truncation warning
        host_float = np.float64 if jax.config.jax_enable_x64 else np.float32
        row_sums_dev = jnp.asarray(np.asarray(g_csr.sum(axis=1), dtype=host_float).ravel())
        col_sums_dev = None
        if mode == SpatialAutocorr.GEARY:
            col_sums_dev = jnp.asarray(np.asarray(g_csr.sum(axis=0), dtype=host_float).ravel())

        perm_buf: list[tuple[Any, ...]] = []  # stripped (z, u[, cg]) device parts
        perm_cols = 0

        def _flush_perms() -> None:
            nonlocal perm_buf, perm_cols
            if not perm_buf:
                return
            zc = jnp.concatenate([p[0] for p in perm_buf], axis=1) if len(perm_buf) > 1 else perm_buf[0][0]
            uc = jnp.concatenate([p[1] for p in perm_buf], axis=1) if len(perm_buf) > 1 else perm_buf[0][1]
            if mode == SpatialAutocorr.MORAN:
                sims_parts.append(
                    np.asarray(
                        moran_perm_scores(
                            zc, uc, perms_idx, s0,
                            gather_bf16=gather_bf16, z_bf16=gather_bf16,
                        )
                    )
                )
            else:
                cgc = jnp.concatenate([p[2] for p in perm_buf]) if len(perm_buf) > 1 else perm_buf[0][2]
                sims_parts.append(
                    np.asarray(
                        geary_perm_scores(
                            zc, uc, row_sums_dev, cgc, perms_idx, s0,
                            gather_bf16=gather_bf16, z_bf16=gather_bf16,
                        )
                    )
                )
            perm_buf = []
            perm_cols = 0

        for start_col in range(0, n_feats, gene_block_size):
            if dev_cols is not None:
                xb = dev_handle.dense_block(dev_cols[start_col : start_col + gene_block_size])
                n_block = xb.shape[1]
                pad_g = 0
                if gene_sharding is not None:
                    pad_g = (-n_block) % n_dev
                    if pad_g:
                        xb = jnp.pad(xb, ((0, 0), (0, pad_g)))
                    xb = jax.device_put(xb, gene_sharding)
            else:
                block = _to_dense_block(vals, slice(start_col, start_col + gene_block_size))
                n_block = block.shape[1]
                pad_g = 0
                if gene_sharding is not None:
                    pad_g = (-n_block) % n_dev
                    if pad_g:
                        block = np.pad(block, ((0, 0), (0, pad_g)))
                    xb = jax.device_put(jnp.asarray(block), gene_sharding)
                else:
                    xb = jnp.asarray(block)

            def _strip(arr: np.ndarray) -> np.ndarray:
                return arr[..., :n_block] if pad_g else arr

            if perms_idx is not None:
                # the permutation identities need u = W z anyway — pay the
                # SpMV once and derive the observed score from it
                zb = xb - jnp.mean(xb, axis=0, keepdims=True)
                xb = None  # free 1 block of HBM before the SpMV's gather temps
                # at 1M×512 the SpMV's `group` in-flight (n, g) gather temps
                # plus the buffered previous superblock half exceed HBM with
                # group=3 (measured RESOURCE_EXHAUSTED); group=2 costs ~8%
                spmv_group = 2 if n_cells * min(gene_block_size, n_block or 1) * 4 > 1_500_000_000 else None
                ub = _spmv(zb, group=spmv_group)
                # buffered u (and v) drop to bf16 at once so the f32 SpMV
                # output frees before the next block (HBM headroom at 1M×1024)
                gdt = jnp.bfloat16 if gather_bf16 else zb.dtype
                if mode == SpatialAutocorr.MORAN:
                    score_parts.append(_strip(np.asarray(moran_scores_from_u(zb, ub, s0))))
                    # z buffers in bf16 too at scale: the sims denominator is
                    # re-accumulated in f32 inside moran_perm_scores
                    perm_buf.append((
                        (zb[:, :n_block] if pad_g else zb).astype(gdt),
                        (ub[:, :n_block] if pad_g else ub).astype(gdt),
                    ))
                else:
                    # observed score + the perm-invariant third term both come
                    # pointwise from zb/ub — no W z² SpMV, no third buffer
                    score_parts.append(
                        _strip(np.asarray(geary_scores_from_u(zb, ub, row_sums_dev, col_sums_dev, s0)))
                    )
                    cgb = jnp.sum(col_sums_dev[:, None] * (zb * zb), axis=0)
                    perm_buf.append((
                        (zb[:, :n_block] if pad_g else zb).astype(gdt),
                        (ub[:, :n_block] if pad_g else ub).astype(gdt),
                        (cgb[:n_block] if pad_g else cgb),
                    ))
                perm_cols += n_block
                if perm_cols >= perm_width:
                    _flush_perms()
            elif mode == SpatialAutocorr.MORAN:
                score_parts.append(_strip(np.asarray(_moran(xb, s0))))
            else:
                score_parts.append(_strip(np.asarray(_geary(xb, s0))))
        _flush_perms()
        out = {"score": np.concatenate(score_parts) if score_parts else np.empty(0)}
        if sims_parts:
            out["sims"] = np.concatenate(sims_parts, axis=1)
        return out

    if cache:
        if n_perms is not None and seed is None:
            logg.warning("`cache` requires an explicit `seed`; caching is disabled for this call")
            cache = False
        elif (vals.data.nbytes if sp.issparse(vals) else np.asarray(vals).nbytes) > 512e6:
            logg.warning("`cache`: expression matrix too large to fingerprint cheaply; caching is disabled")
            cache = False
    if cache:
        memo_arrays: dict[str, Any] = {
            "g_data": g_csr.data, "g_indices": g_csr.indices, "g_indptr": g_csr.indptr,
        }
        if sp.issparse(vals):
            v = vals.tocsr()
            memo_arrays.update(x_data=v.data, x_indices=v.indices, x_indptr=v.indptr)
        else:
            memo_arrays["x"] = np.asarray(vals)
        from squidpy_tpu.utils._memoize import memoize_arrays

        result = memoize_arrays(
            cache, f"spatial_autocorr_{params['mode']}", memo_arrays,
            {"seed": seed, "n_perms": n_perms, "transformation": transformation},
            _score_blocks,
        )
    else:
        result = _score_blocks()
    score = result["score"]
    sims = result.get("sims")

    with np.errstate(divide="ignore", invalid="ignore"):
        pval_results = _score_pvalues(
            score, sims, g_csr, mode=mode, expected=params["expected"], two_tailed=two_tailed
        )

    df = pd.DataFrame({str(params["stat"]): score, **pval_results}, index=index)

    if corr_method is not None:
        for pv in [c for c in df.columns if "pval" in c]:
            _, pvals_adj, _, _ = multipletests(df[pv].values, alpha=0.05, method=corr_method)
            df[f"{pv}_{corr_method}"] = pvals_adj

    df.sort_values(by=params["stat"], ascending=params["ascending"], inplace=True)

    if copy:
        logg.info("Finish", time=start)
        return df

    _save_data(adata, attr="uns", key=str(params["mode"]) + str(params["stat"]), data=df, time=start)


@deprecated_params({"n_splits": "1.10.0", "n_jobs": "1.10.0", "backend": "1.10.0", "show_progress_bar": "1.10.0"})
def co_occurrence(
    adata: Any,
    cluster_key: str,
    spatial_key: str = Key.obsm.spatial,
    interval: int | NDArrayA = 50,
    copy: bool = False,
    *,
    table_key: str | None = None,
    use_pallas: bool = False,
) -> tuple[NDArrayA, NDArrayA] | None:
    """Co-occurrence probability of clusters across distance thresholds.

    Device kernel: tiled pairwise-distance blocks on the MXU with per-threshold
    one-hot class reductions (:mod:`squidpy_tpu.ops.cooccur`). With
    ``use_pallas=True`` the fused Pallas kernel
    (:mod:`squidpy_tpu.ops.pallas_pairs`) keeps the O(n²) distance block in
    VMEM — identical counts, but the first call pays a long Mosaic compile on
    this environment's remote-compile path. Stores
    ``uns['{cluster_key}_co_occurrence'] = {'occ', 'interval'}``.
    """
    adata = extract_adata_if_sdata(adata, table_key=table_key)
    _assert_categorical_obs(adata, key=cluster_key)
    _assert_spatial_basis(adata, key=spatial_key)

    spatial = np.asarray(adata.obsm[spatial_key], dtype=np.float32)
    original_clust = adata.obs[cluster_key]
    labs = np.asarray(original_clust.cat.codes.to_numpy(), dtype=np.int32)
    n_cls = len(original_clust.cat.categories)

    if isinstance(interval, int):
        thresh_min, thresh_max = _find_min_max(spatial)
        interval = np.linspace(thresh_min, thresh_max, num=interval, dtype=np.float32)
    else:
        interval = np.asarray(sorted(interval), dtype=np.float32)
    if len(interval) <= 1:
        raise ValueError(f"Expected interval to be of length `>= 2`, found `{len(interval)}`.")

    start = logg.info(f"Calculating co-occurrence probabilities for `{len(interval)}` intervals on device")
    thresholds = (interval[1:].astype(np.float64) ** 2).astype(np.float32)
    if use_pallas:
        from squidpy_tpu.ops.pallas_pairs import cooccur_counts_pallas

        counts = cooccur_counts_pallas(spatial, labs, thresholds, n_cls)
    else:
        counts = co_occurrence_counts(spatial, labs, thresholds, n_cls)
    out = co_occurrence_probs(counts)

    if copy:
        logg.info("Finish", time=start)
        return out, interval

    _save_data(
        adata, attr="uns", key=Key.uns.co_occurrence(cluster_key),
        data={"occ": out, "interval": interval}, time=start,
    )


def _find_min_max(spatial: NDArrayA) -> tuple[float, float]:
    """Distance-threshold heuristics (reference: gr/_ppatterns.py:452-462)."""
    coord_sum = np.sum(spatial, axis=1)
    min_idx, min_idx2 = np.argpartition(coord_sum, 2)[:2]
    max_idx = np.argmax(coord_sum)
    thres_max = float(np.linalg.norm(spatial[min_idx] - spatial[max_idx])) / 2.0
    thres_min = float(np.linalg.norm(spatial[min_idx] - spatial[min_idx2]))
    return np.float32(thres_min), np.float32(thres_max)


def _normality_variance(w: Any, mode: SpatialAutocorr) -> float:
    """Variance of the statistic under the normality assumption.

    Cliff & Ord (1981) closed forms in terms of the weight-matrix moments
    ``S0 = ΣΣ w_ij``, ``S1 = ½ ΣΣ (w_ij + w_ji)²`` and
    ``S2 = Σ_i (Σ_j w_ij + Σ_j w_ji)²``. Geary's C has its own sampling
    variance, distinct from Moran's (the reference fixed this in upstream
    issue #1183; behavior anchored at /root/reference/src/squidpy/gr/
    _ppatterns.py:501-559 and locked by the naive-numpy parity tests in
    tests/test_ppatterns.py).
    """
    n = w.shape[0]
    s0 = float(w.sum())
    if s0 == 0.0:  # edgeless graph: variance undefined (see spatial_autocorr)
        return float("nan")
    sym = w + w.transpose()
    sym_sq = sym.multiply(sym) if sp.issparse(sym) else np.multiply(sym, sym)
    s1 = float(sym_sq.sum()) / 2.0
    degree = np.asarray(w.sum(axis=1)).ravel() + np.asarray(w.sum(axis=0)).ravel()
    s2 = float(np.square(degree).sum())

    if mode == SpatialAutocorr.MORAN:
        mean_sq = 1.0 / (n - 1) ** 2  # E[I]² under H0
        return (n * n * s1 - n * s2 + 3.0 * s0 * s0) / ((n * n - 1) * s0 * s0) - mean_sq
    if mode == SpatialAutocorr.GEARY:
        return ((n - 1) * (2.0 * s1 + s2) - 4.0 * s0 * s0) / (2.0 * (n + 1) * s0 * s0)
    raise AssertionError(f"Unexpected mode `{mode}`.")


def _directional_tail(z: NDArrayA) -> NDArrayA:
    """P(Z beyond z) in the direction z points — the one-tailed p-value."""
    return np.asarray(stats.norm.cdf(-np.abs(z)))


def _score_pvalues(
    score: NDArrayA,
    sims: NDArrayA | None,
    w: Any,
    *,
    mode: SpatialAutocorr,
    expected: float,
    two_tailed: bool,
) -> dict[str, Any]:
    """Analytic (normality) and permutation p-values for autocorrelation scores.

    Output keys follow the reference contract
    (/root/reference/src/squidpy/gr/_ppatterns.py:443-500): ``pval_norm`` /
    ``var_norm`` always; ``pval_sim`` / ``pval_z_sim`` / ``var_sim`` when a
    permutation null ``sims`` of shape ``(n_perms, n_feats)`` is given.
    ``pval_z_sim`` stays one-tailed regardless of ``two_tailed``, matching
    the reference.
    """
    var_norm = _normality_variance(w, mode)
    z_norm = (score - expected) / np.sqrt(var_norm)
    p_norm = _directional_tail(z_norm)
    if two_tailed:
        p_norm = p_norm * 2.0
    out: dict[str, Any] = {"pval_norm": p_norm, "var_norm": var_norm}

    if sims is not None:
        n_perms = sims.shape[0]
        z_sim = (score - sims.mean(axis=0)) / sims.std(axis=0)
        out["pval_z_sim"] = _directional_tail(z_sim)
        n_ge = (sims >= score).sum(axis=0)
        # count the smaller tail, i.e. how extreme the observed score is
        tail_count = np.minimum(n_ge, n_perms - n_ge)
        out["pval_sim"] = (tail_count + 1) / (n_perms + 1)
        out["var_sim"] = sims.var(axis=0)
    return out
