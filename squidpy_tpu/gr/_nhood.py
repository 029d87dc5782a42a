"""Neighborhood enrichment, centrality scores, interaction matrix.

API/semantics parity with /root/reference/src/squidpy/gr/_nhood.py:145-480.
The permutation test runs entirely on device: all ``n_perms`` shuffles are a
batched ``jax.random.permutation`` and the counting kernel is one vmapped
gather+matmul (:mod:`squidpy_tpu.ops.nhood`) instead of a numba loop per
permutation across a process pool. ``n_jobs``/``backend`` are accepted for API
compatibility and ignored.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from functools import partial
from typing import Any, NamedTuple

import jax.numpy as jnp
import networkx as nx
import numpy as np
import pandas as pd

from squidpy_tpu._constants._constants import Centrality
from squidpy_tpu._constants._pkg_constants import Key
from squidpy_tpu._core.graph import SpatialGraph, graph_from_adata
from squidpy_tpu._core.rng import permutation_batch, shuffle_group_batch, spawn_keys
from squidpy_tpu.gr._utils import (
    _assert_categorical_obs,
    _assert_connectivity_key,
    _save_data,
    extract_adata_if_sdata,
)
from squidpy_tpu.ops.nhood import cluster_pair_counts, permuted_pair_counts
from squidpy_tpu.utils import NDArrayA, assert_positive, logg, to_host

__all__ = ["nhood_enrichment", "centrality_scores", "interaction_matrix", "NhoodEnrichmentResult"]


class NhoodEnrichmentResult(NamedTuple):
    zscore: NDArrayA
    counts: NDArrayA


def nhood_enrichment(
    adata: Any,
    cluster_key: str,
    library_key: str | None = None,
    connectivity_key: str | None = None,
    n_perms: int = 1000,
    numba_parallel: bool = False,
    seed: int | None = None,
    copy: bool = False,
    n_jobs: int | None = None,
    backend: str = "loky",
    show_progress_bar: bool = True,
    *,
    table_key: str | None = None,
    cache: bool | str = False,
) -> NhoodEnrichmentResult | None:
    """Compute neighborhood enrichment by permutation test.

    z-score = (observed count − mean(permuted counts)) / std(permuted counts),
    per cluster pair; counts are directed stored-edge counts (reference
    semantics, /root/reference/src/squidpy/gr/_nhood.py:208-230).

    ``cache`` (``True`` or a directory) memoizes the permutation-count batch
    on disk keyed by graph/labels/seed, so re-running the identical seeded
    call skips the device computation (requires an explicit ``seed``).

    Stores ``uns['{cluster_key}_nhood_enrichment'] = {'zscore', 'count'}``.
    """
    adata = extract_adata_if_sdata(adata, table_key=table_key)
    connectivity_key = Key.obsp.spatial_conn(connectivity_key)
    _assert_categorical_obs(adata, cluster_key)
    _assert_connectivity_key(adata, connectivity_key)
    assert_positive(n_perms, name="n_perms")

    original_clust = adata.obs[cluster_key]
    int_clust = np.asarray(original_clust.cat.codes.to_numpy(), dtype=np.int32)
    n_cls = len(original_clust.cat.categories)

    graph = graph_from_adata(adata, connectivity_key)
    labels_dev = jnp.asarray(int_clust)

    start = logg.info(f"Calculating neighborhood enrichment using `{n_perms}` permutations on device")
    count = np.asarray(
        cluster_pair_counts(graph.indices, graph.mask, labels_dev, n_cls), dtype=np.int64
    ).astype(np.uint32)

    lib_codes = None
    if library_key is not None:
        _assert_categorical_obs(adata, key=library_key)
        lib_codes = adata.obs[library_key].cat.codes.to_numpy()

    def _compute_perms() -> dict[str, NDArrayA]:
        keys = spawn_keys(seed, n_perms)
        if lib_codes is not None:
            shuffled = shuffle_group_batch(keys, labels_dev, lib_codes)
        else:
            shuffled = permutation_batch(keys, labels_dev)
        from squidpy_tpu.parallel.sharded import auto_permuted_pair_counts

        return {
            "perms": to_host(
                auto_permuted_pair_counts(graph.indices, graph.mask, shuffled, n_cls),
                dtype=np.float64,
            )
        }

    if cache and seed is None:
        logg.warning("`cache` requires an explicit `seed`; caching is disabled for this call")
        cache = False
    if cache:
        from scipy import sparse as _sp

        from squidpy_tpu.utils._memoize import memoize_arrays

        adj = _sp.csr_matrix(adata.obsp[connectivity_key])
        arrays = {"indptr": adj.indptr, "indices": adj.indices, "labels": int_clust}
        if lib_codes is not None:
            arrays["libs"] = lib_codes
        perms = memoize_arrays(
            cache, "nhood_enrichment", arrays,
            {"seed": seed, "n_perms": n_perms, "n_cls": n_cls}, _compute_perms,
        )["perms"]
    else:
        perms = _compute_perms()["perms"]
    # zero-variance pairs (e.g. singleton clusters) yield NaN, matching the
    # reference; suppress only the warning
    with np.errstate(invalid="ignore", divide="ignore"):
        zscore = (count - perms.mean(axis=0)) / perms.std(axis=0)

    if copy:
        logg.info("Finish", time=start)
        return NhoodEnrichmentResult(zscore=zscore, counts=count)

    _save_data(
        adata,
        attr="uns",
        key=Key.uns.nhood_enrichment(cluster_key),
        data={"zscore": zscore, "count": count},
        time=start,
    )


def centrality_scores(
    adata: Any,
    cluster_key: str,
    score: str | Iterable[str] | None = None,
    connectivity_key: str | None = None,
    copy: bool = False,
    n_jobs: int | None = None,
    backend: str = "loky",
    show_progress_bar: bool = False,
    *,
    table_key: str | None = None,
) -> pd.DataFrame | None:
    """Compute group centrality scores per cluster.

    Valid scores: ``closeness_centrality``, ``average_clustering``,
    ``degree_centrality`` (reference: gr/_nhood.py:246-313; graph-algorithmic,
    runs on host networkx — the graphs per cluster are small).
    """
    adata = extract_adata_if_sdata(adata, table_key=table_key)
    connectivity_key = Key.obsp.spatial_conn(connectivity_key)
    _assert_categorical_obs(adata, cluster_key)
    _assert_connectivity_key(adata, connectivity_key)

    if isinstance(score, (str, Centrality)):
        centrality = [score]
    elif score is None:
        centrality = [c.s for c in Centrality]
    else:
        centrality = list(score)
    centralities = [Centrality(c) for c in centrality]

    graph = nx.Graph(adata.obsp[connectivity_key])
    cat = adata.obs[cluster_key].cat.categories.values
    clusters = adata.obs[cluster_key].values

    fun_dict = {}
    for c in centralities:
        if c == Centrality.CLOSENESS:
            fun_dict[c.s] = partial(nx.algorithms.centrality.group_closeness_centrality, graph)
        elif c == Centrality.DEGREE:
            fun_dict[c.s] = partial(nx.algorithms.centrality.group_degree_centrality, graph)
        elif c == Centrality.CLUSTERING:
            fun_dict[c.s] = partial(nx.algorithms.cluster.average_clustering, graph)
        else:
            raise NotImplementedError(f"Centrality `{c}` is not yet implemented.")

    start = logg.info(f"Calculating centralities `{centralities}`")
    res_list = []
    for method, fun in fun_dict.items():
        values = []
        for c in cat:
            idx = np.where(clusters == c)[0]
            values.append(fun(idx))
        res_list.append(pd.DataFrame(values, columns=[method], index=cat))
    df = pd.concat(res_list, axis=1)

    if copy:
        return df
    _save_data(adata, attr="uns", key=Key.uns.centrality_scores(cluster_key), data=df, time=start)


def interaction_matrix(
    adata: Any,
    cluster_key: str,
    connectivity_key: str | None = None,
    normalized: bool = False,
    copy: bool = False,
    weights: bool = False,
    *,
    table_key: str | None = None,
) -> NDArrayA | None:
    """Compute the cluster interaction matrix (reference: gr/_nhood.py:344-424).

    Stores ``uns['{cluster_key}_interactions']``.
    """
    adata = extract_adata_if_sdata(adata, table_key=table_key)
    connectivity_key = Key.obsp.spatial_conn(connectivity_key)
    _assert_categorical_obs(adata, cluster_key)
    _assert_connectivity_key(adata, connectivity_key)

    cats = adata.obs[cluster_key]
    mask = ~pd.isnull(cats).values
    cats = cats.loc[mask]
    if not len(cats):
        raise RuntimeError(f"After removing NaNs in `adata.obs[{cluster_key!r}]`, none remain.")

    g = adata.obsp[connectivity_key]
    g = g[mask, :][:, mask]
    n_cats = len(cats.cat.categories)
    int_clust = np.asarray(cats.cat.codes.to_numpy(), dtype=np.int32)

    graph = SpatialGraph.from_csr(g)
    w = graph.weights if weights else None
    output = np.asarray(
        cluster_pair_counts(graph.indices, graph.mask, jnp.asarray(int_clust), n_cats, weights=w),
        dtype=np.float64,
    )
    is_int = np.issubdtype(g.dtype, np.integer) or np.issubdtype(g.dtype, np.bool_)
    if is_int or not weights:
        output = output.astype(int) if is_int else output
    if not weights and not is_int:
        output = output.astype(float)

    if normalized:
        output = output / output.sum(axis=1).reshape((-1, 1))

    if copy:
        return output
    _save_data(adata, attr="uns", key=Key.uns.interaction_matrix(cluster_key), data=output)
