"""Ripley's F / G / L statistics.

API/semantics parity with /root/reference/src/squidpy/gr/_ripley.py:27-271:
same support construction (convex hull area, ``max_dist = sqrt(area/2)``),
same F/G/L definitions and Monte-Carlo envelope, same result dict layout.

TPU-first execution: nearest-neighbor queries and pair counting run on
device (:mod:`squidpy_tpu.ops.knn`, :mod:`squidpy_tpu.ops.ripley`), and —
unlike the reference's one-KDTree-query-per-simulation envelope loop
(gr/_ripley.py:158-176) — ALL ``n_simulations`` Monte-Carlo statistics are
computed in one batched device dispatch (:func:`batched_nn_distances` /
:func:`batched_pair_counts`); only the PPP rejection sampling stays on host
(it must replay each simulation's own spawned RNG stream).
"""

from __future__ import annotations

from typing import Any, Literal

import numpy as np
import pandas as pd
from scipy.spatial import ConvexHull

from squidpy_tpu._constants._constants import RipleyStat
from squidpy_tpu._constants._pkg_constants import Key
from squidpy_tpu.gr._utils import (
    _assert_categorical_obs,
    _assert_spatial_basis,
    _save_data,
    extract_adata_if_sdata,
)
from squidpy_tpu.ops.knn import cross_knn
from squidpy_tpu.ops.ripley import (
    batched_nn_distances,
    batched_pair_counts,
    pair_counts_cumulative,
    ppp_sample,
)
from squidpy_tpu.utils import NDArrayA, logg

__all__ = ["ripley"]


def _ecdf(distances: NDArrayA, support: NDArrayA) -> NDArrayA:
    """Empirical CDF of NN distances over the support bins (normalized by
    the in-range count, matching the reference's histogram construction)."""
    counts, _ = np.histogram(distances, bins=support)
    return np.concatenate(([0.0], np.cumsum(counts) / counts.sum()))


def _ecdf_rows(distances: NDArrayA, support: NDArrayA) -> NDArrayA:
    """Row-wise `_ecdf` for a (S, m) distance matrix → (S, n_steps).

    One searchsorted pass over all simulations beats S histogram calls;
    bin semantics match ``np.histogram(bins=support)`` exactly: right-open
    bins, the last bin closed, out-of-range values dropped."""
    L = len(support)
    idx = np.searchsorted(support, distances, side="right")
    idx = np.where(distances == support[-1], L - 1, idx)  # closed last bin
    valid = (idx >= 1) & (idx <= L - 1)
    S = distances.shape[0]
    counts = np.zeros((S, L - 1), dtype=np.int64)
    rows = np.broadcast_to(np.arange(S)[:, None], distances.shape)[valid]
    np.add.at(counts, (rows, idx[valid] - 1), 1)
    denom = counts.sum(axis=1, keepdims=True).astype(float)
    cdf = np.cumsum(counts, axis=1) / denom
    return np.concatenate([np.zeros((S, 1)), cdf], axis=1)


def _l_transform(ordered_pairs: NDArrayA, n: int, area: float) -> NDArrayA:
    """Variance-stabilized L from cumulative ordered pair counts."""
    k_estimate = (ordered_pairs / n) * (area / n)
    return np.sqrt(k_estimate / np.pi)


def _reshape_res(results: NDArrayA, columns: Any, index: NDArrayA, var_name: str) -> pd.DataFrame:
    df = pd.DataFrame(results, columns=columns, index=index)
    df.index.set_names(["bins"], inplace=True)
    df = df.melt(var_name=var_name, value_name="stats", ignore_index=False)
    df[var_name] = df[var_name].astype("category")
    df.reset_index(inplace=True)
    return df


def ripley(
    adata: Any,
    cluster_key: str,
    mode: Literal["F", "G", "L"] = "F",
    spatial_key: str = Key.obsm.spatial,
    metric: str = "euclidean",
    n_neigh: int = 2,
    n_simulations: int = 100,
    n_observations: int = 1000,
    max_dist: float | None = None,
    n_steps: int = 50,
    seed: int | None = None,
    copy: bool = False,
    *,
    table_key: str | None = None,
) -> dict[str, pd.DataFrame | NDArrayA] | None:
    r"""Ripley's F, G or L statistics for point processes, with MC envelopes.

    Stores ``uns['{cluster_key}_ripley_{mode}'] = {'{mode}_stat', 'sims_stat',
    'bins', 'pvalues'}``.
    """
    adata = extract_adata_if_sdata(adata, table_key=table_key)
    _assert_categorical_obs(adata, key=cluster_key)
    _assert_spatial_basis(adata, key=spatial_key)
    if metric != "euclidean":
        # ValueError with this message is the reference's contract
        # (/root/reference/src/squidpy/gr/_ripley.py metric validation)
        raise ValueError(
            f"Unsupported metric `{metric}` — the TPU distance kernels are euclidean-only."
        )
    mode = RipleyStat(mode)
    coords = np.asarray(adata.obsm[spatial_key], dtype=np.float64)
    labels = adata.obs[cluster_key]
    codes = labels.cat.codes.to_numpy()

    hull = ConvexHull(coords)
    area = hull.volume
    support = np.linspace(0.0, (area / 2) ** 0.5 if max_dist is None else max_dist, n_steps)

    # only categories with members — an empty cluster has no point cloud to
    # query (the reference's LabelEncoder fits on present values only)
    present = np.unique(codes)
    categories = labels.cat.categories.values[present]

    start = logg.info(
        f"Calculating Ripley's {mode} statistic for `{len(present)}` clusters "
        f"and `{n_simulations}` simulations"
    )
    obs_rng, *sim_rngs = (
        np.random.default_rng(s) for s in np.random.SeedSequence(seed).spawn(n_simulations + 1)
    )

    # --- observed curve per cluster ---------------------------------------
    # F draws a fresh PPP reference set per cluster from the shared stream
    # (the last draw is reused by the envelope, as in the reference)
    ref_pts: NDArrayA | None = None
    observed: list[NDArrayA] = []
    for code in present:
        members = coords[codes == code]
        if mode == RipleyStat.L:
            curve = _l_transform(pair_counts_cumulative(members, support), len(coords), area)
        else:
            if mode == RipleyStat.F:
                ref_pts = ppp_sample(hull, 1, n_observations, rng=obs_rng)
                queries = ref_pts
            elif mode == RipleyStat.G:
                queries = coords[codes != code]
            else:
                raise NotImplementedError(f"Mode `{mode.s!r}` is not yet implemented.")
            nn_d, _ = cross_knn(queries, members, n_neigh)
            curve = _ecdf(nn_d.squeeze(), support)
        observed.append(curve)
    obs_mat = np.stack(observed)  # (n_cls, n_steps)

    # --- Monte-Carlo envelope: one batched device pass ---------------------
    # each simulation's PPP replays its own spawned RNG (bit-identical to a
    # serial loop); the statistics for all S clouds run as one dispatch
    clouds = np.stack([ppp_sample(hull, 1, n_observations, rng=r) for r in sim_rngs])
    if mode == RipleyStat.L:
        sims_mat = np.stack(
            [_l_transform(row, len(coords), area) for row in batched_pair_counts(clouds, support)]
        )
    else:
        env_queries = ref_pts if mode == RipleyStat.F else coords
        nn_all = batched_nn_distances(env_queries, clouds)  # (S, m)
        sims_mat = _ecdf_rows(nn_all, support)

    exceed = (sims_mat[None, :, :] >= obs_mat[:, None, :]).sum(axis=1)
    pvalues = (1.0 + exceed) / (n_simulations + 1)
    pvalues = np.minimum(pvalues, 1.0 - pvalues)

    res = {
        f"{mode}_stat": _reshape_res(obs_mat.T, columns=categories, index=support, var_name=cluster_key),
        "sims_stat": _reshape_res(sims_mat.T, columns=np.arange(n_simulations), index=support, var_name="simulations"),
        "bins": support,
        "pvalues": pvalues,
    }

    if copy:
        logg.info("Finish", time=start)
        return res

    _save_data(adata, attr="uns", key=Key.uns.ripley(cluster_key, mode.s), data=res, time=start)
