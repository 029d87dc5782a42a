"""Ripley's F / G / L statistics.

API/semantics parity with /root/reference/src/squidpy/gr/_ripley.py:27-271:
same support construction (convex hull area, ``max_dist = sqrt(area/2)``),
same F/G/L definitions and Monte-Carlo envelope, same result dict layout.
Nearest-neighbor queries and pair counting run on device
(:mod:`squidpy_tpu.ops.knn`, :mod:`squidpy_tpu.ops.ripley`); the PPP sampler
is batched host rejection sampling on the hull triangulation.
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
from squidpy_tpu.ops.ripley import pair_counts_cumulative, ppp_sample
from squidpy_tpu.utils import NDArrayA, logg

__all__ = ["ripley"]


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
    coordinates = np.asarray(adata.obsm[spatial_key], dtype=np.float64)
    clusters = adata.obs[cluster_key]

    mode = RipleyStat(mode)

    N = coordinates.shape[0]
    hull = ConvexHull(coordinates)
    area = hull.volume
    if max_dist is None:
        max_dist = (area / 2) ** 0.5
    support = np.linspace(0, max_dist, n_steps)

    cluster_idx = clusters.cat.codes.to_numpy()
    # only categories with members — an empty cluster has no point cloud to
    # query (the reference's LabelEncoder fits on present values only)
    present = np.unique(cluster_idx)
    categories = clusters.cat.categories.values[present]
    code_list = list(present)
    n_cls = len(categories)
    obs_arr = np.empty((n_cls, n_steps))

    start = logg.info(
        f"Calculating Ripley's {mode} statistic for `{n_cls}` clusters and `{n_simulations}` simulations"
    )
    obs_rng, *sim_rngs = [np.random.default_rng(s) for s in np.random.SeedSequence(seed).spawn(n_simulations + 1)]

    random = None
    for i, code in enumerate(code_list):
        coord_c = coordinates[cluster_idx == code, :]
        if mode == RipleyStat.F:
            random = ppp_sample(hull, n_simulations=1, n_observations=n_observations, rng=obs_rng)
            distances, _ = cross_knn(random, coord_c, n_neigh)
            bins, obs_stats = _f_g_function(distances.squeeze(), support)
        elif mode == RipleyStat.G:
            distances, _ = cross_knn(coordinates[cluster_idx != code, :], coord_c, n_neigh)
            bins, obs_stats = _f_g_function(distances.squeeze(), support)
        elif mode == RipleyStat.L:
            bins, obs_stats = _l_function(coord_c, support, N, area)
        else:
            raise NotImplementedError(f"Mode `{mode.s!r}` is not yet implemented.")
        obs_arr[i] = obs_stats

    sims = np.empty((n_simulations, len(bins)))
    pvalues = np.ones((n_cls, len(bins)))

    for i in range(n_simulations):
        random_i = ppp_sample(hull, n_simulations=1, n_observations=n_observations, rng=sim_rngs[i])
        if mode == RipleyStat.F:
            distances_i, _ = cross_knn(random, random_i, 1)
            _, stats_i = _f_g_function(distances_i.squeeze(), support)
        elif mode == RipleyStat.G:
            distances_i, _ = cross_knn(coordinates, random_i, 1)
            _, stats_i = _f_g_function(distances_i.squeeze(), support)
        elif mode == RipleyStat.L:
            _, stats_i = _l_function(random_i, support, N, area)
        else:
            raise NotImplementedError(f"Mode `{mode.s!r}` is not yet implemented.")

        for j in range(obs_arr.shape[0]):
            pvalues[j] += stats_i >= obs_arr[j]
        sims[i] = stats_i

    pvalues /= n_simulations + 1
    pvalues = np.minimum(pvalues, 1 - pvalues)

    obs_df = _reshape_res(obs_arr.T, columns=categories, index=bins, var_name=cluster_key)
    sims_df = _reshape_res(sims.T, columns=np.arange(n_simulations), index=bins, var_name="simulations")

    res = {f"{mode}_stat": obs_df, "sims_stat": sims_df, "bins": bins, "pvalues": pvalues}

    if copy:
        logg.info("Finish", time=start)
        return res

    _save_data(adata, attr="uns", key=Key.uns.ripley(cluster_key, mode.s), data=res, time=start)


def _reshape_res(results: NDArrayA, columns: Any, index: NDArrayA, var_name: str) -> pd.DataFrame:
    df = pd.DataFrame(results, columns=columns, index=index)
    df.index.set_names(["bins"], inplace=True)
    df = df.melt(var_name=var_name, value_name="stats", ignore_index=False)
    df[var_name] = df[var_name].astype("category")
    df.reset_index(inplace=True)
    return df


def _f_g_function(distances: NDArrayA, support: NDArrayA) -> tuple[NDArrayA, NDArrayA]:
    """Empirical CDF of NN distances over the support bins."""
    counts, bins = np.histogram(distances, bins=support)
    fracs = np.cumsum(counts) / counts.sum()
    return bins, np.concatenate((np.zeros((1,), dtype=float), fracs))


def _l_function(points: NDArrayA, support: NDArrayA, n: int, area: float) -> tuple[NDArrayA, NDArrayA]:
    """Ripley K via cumulative ordered pair counts, variance-stabilized to L."""
    pairs = pair_counts_cumulative(points, support)
    intensity = n / area
    k_estimate = (pairs / n) / intensity
    l_estimate = np.sqrt(k_estimate / np.pi)
    return support, l_estimate
