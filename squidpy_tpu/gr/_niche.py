"""Niche (spatial domain) detection.

API/semantics parity with /root/reference/src/squidpy/gr/_niche.py:31-1051:
flavors ``neighborhood`` (n-hop weighted neighbor-category profiles →
cluster), ``utag`` (L1-normalized A @ X → PCA → cluster), ``cellcharter``
(k-hop mean/variance feature aggregation → embedding → GMM), and
``spatialleiden`` (gated on the optional external package). The linear
algebra (profiles, A @ X, k-hop aggregation) runs through the device SpMV;
graph clustering uses :mod:`squidpy_tpu.models.clustering` (Louvain standing
in for leiden — scanpy/leidenalg are not available in this environment).
"""

from __future__ import annotations

import contextlib
from typing import Any, Literal

import numpy as np
import pandas as pd
from scipy import sparse as sps
from scipy.spatial import distance as sp_distance
from sklearn.metrics import f1_score

from squidpy_tpu._core.graph import SpatialGraph
from squidpy_tpu.gr._utils import extract_adata_if_sdata
from squidpy_tpu.models.clustering import gmm_cluster, graph_cluster, pca_embed, zscore
from squidpy_tpu.utils import logg
from squidpy_tpu.utils._validators import assert_key_in_adata

__all__ = ["calculate_niche"]


def calculate_niche(
    data: Any,
    flavor: Literal["neighborhood", "utag", "cellcharter", "spatialleiden"],
    library_key: str | None = None,
    mask: pd.Series | None = None,
    groups: str | None = None,
    n_neighbors: int | None = None,
    resolutions: float | tuple[float, float] | list[float | tuple[float, float]] | None = None,
    min_niche_size: int | None = None,
    scale: bool = True,
    abs_nhood: bool = False,
    distance: int | None = None,
    n_hop_weights: list[float] | None = None,
    aggregation: str | None = None,
    n_components: int | None = None,
    random_state: int = 42,
    spatial_connectivities_key: str = "spatial_connectivities",
    latent_connectivities_key: str = "connectivities",
    layer_ratio: float = 1.0,
    n_iterations: int = -1,
    use_weights: bool | tuple[bool, bool] = True,
    use_rep: str | None = None,
    inplace: bool = True,
    *,
    table_key: str | None = None,
) -> Any | None:
    """Calculate niches (spatial domains); labels land in ``adata.obs``.

    Result columns follow the reference's naming:
    ``nhood_niche_res={res}`` / ``utag_niche_res={res}`` /
    ``cellcharter_niche`` (+ ``lib={id}_`` value prefixes with ``library_key``).
    """
    if flavor == "cellcharter" and aggregation is None:
        aggregation = "mean"
    if distance is None:
        distance = 3 if flavor == "cellcharter" else 1
    if flavor == "cellcharter" and n_components is None:
        n_components = 10

    _validate_niche_args(data, flavor, library_key, table_key, groups, n_neighbors, resolutions, aggregation)

    if resolutions is None:
        resolutions = [0.5]

    orig_adata = extract_adata_if_sdata(data, table_key=table_key)
    adata = orig_adata.copy()

    assert_key_in_adata(adata, spatial_connectivities_key, attr="obsp")
    if flavor == "spatialleiden":
        assert_key_in_adata(adata, latent_connectivities_key, attr="obsp")

    result_columns = _get_result_columns(flavor=flavor, resolutions=resolutions)

    if library_key is not None:
        assert_key_in_adata(adata, library_key, attr="obs")
        logg.info(f"Stratifying by library_key '{library_key}'")
        for col in result_columns:
            adata.obs[col] = "not_a_niche"
        for lib_id in adata.obs[library_key].unique():
            lib_mask_rows = adata.obs[library_key] == lib_id
            lib_indices = adata.obs.index[np.asarray(lib_mask_rows)]
            if len(lib_indices) == 0:
                logg.warning(f"Library '{lib_id}' contains no cells, skipping")
                continue
            lib_adata = adata[np.asarray(lib_mask_rows)].copy()
            lib_mask = mask[mask.index.isin(lib_indices)] if mask is not None else None
            lib_result = calculate_niche(
                lib_adata,
                flavor=flavor,
                library_key=None,
                mask=lib_mask,
                groups=groups,
                n_neighbors=n_neighbors,
                resolutions=None if flavor == "cellcharter" else resolutions,
                min_niche_size=min_niche_size,
                scale=scale,
                abs_nhood=abs_nhood,
                distance=None if flavor == "utag" else distance,
                n_hop_weights=n_hop_weights,
                aggregation=aggregation,
                n_components=n_components,
                random_state=random_state,
                spatial_connectivities_key=spatial_connectivities_key,
                latent_connectivities_key=latent_connectivities_key,
                layer_ratio=layer_ratio,
                n_iterations=n_iterations,
                use_weights=use_weights,
                use_rep=use_rep,
                inplace=False,
            )
            for col in result_columns:
                if col in lib_result.obs.columns:
                    prefixed = lib_result.obs[col].apply(
                        lambda x, lib=lib_id: f"lib={lib}_{x}" if x != "not_a_niche" else x
                    )
                    adata.obs.loc[lib_indices, col] = prefixed.values
    else:
        if flavor == "neighborhood":
            _get_nhood_profile_niches(
                adata, mask, groups, n_neighbors, resolutions, min_niche_size,
                scale, abs_nhood, distance, n_hop_weights, spatial_connectivities_key, random_state,
            )
        elif flavor == "utag":
            _get_utag_niches(adata, n_neighbors, resolutions, spatial_connectivities_key, random_state)
        elif flavor == "cellcharter":
            _get_cellcharter_niches(
                adata, distance, aggregation, n_components, random_state,
                spatial_connectivities_key, use_rep,
            )
        elif flavor == "spatialleiden":
            _get_spatialleiden_domains(
                adata, spatial_connectivities_key, latent_connectivities_key, resolutions,
                layer_ratio, use_weights, n_iterations, random_state,
            )

    if not inplace:
        return adata
    if hasattr(data, "tables"):
        data.tables[table_key] = adata
    else:
        for col in result_columns:
            if col in orig_adata.obs.columns:
                logg.info(f"Overwriting existing column '{col}'")
                with contextlib.suppress(KeyError):
                    del orig_adata.obs[col]
            if f"{col}_colors" in orig_adata.uns:
                with contextlib.suppress(KeyError):
                    del orig_adata.uns[f"{col}_colors"]
            orig_adata.obs[col] = adata.obs[col]
    return None


def _get_result_columns(flavor: str, resolutions: Any) -> list[str]:
    if flavor == "cellcharter":
        return ["cellcharter_niche"]
    if not isinstance(resolutions, list):
        resolutions = [resolutions]
    prefix = {"neighborhood": "nhood_niche", "utag": "utag_niche", "spatialleiden": "spatialleiden"}[flavor]
    return [f"{prefix}_res={res}" for res in resolutions]


def _dense_X(adata: Any) -> np.ndarray:
    X = adata.X
    return np.asarray(X.todense()) if sps.issparse(X) else np.asarray(X, dtype=float)


def _device_X(adata: Any) -> Any:
    """(n, g) f32 expression on device, shipped through the session handle
    (u8/u16/CSC containers — the tunnel moves incompressible f32 at
    ~25 MB/s; see _core/device_x.py) with a dense-f32 fallback."""
    import jax.numpy as jnp

    from squidpy_tpu._core.device_x import device_expression

    handle = device_expression(adata)
    if handle is not None:
        return handle.full_dense().astype(jnp.float32)
    return jnp.asarray(_dense_X(adata), jnp.float32)


def _get_nhood_profile_niches(
    adata: Any,
    mask: pd.Series | None,
    groups: str,
    n_neighbors: int,
    resolutions: Any,
    min_niche_size: int | None,
    scale: bool,
    abs_nhood: bool,
    distance: int,
    n_hop_weights: list[float] | None,
    spatial_connectivities_key: str,
    random_state: int,
) -> None:
    """Neighbor-category profiles (+ weighted n-hop sums) → clustering."""
    adj = sps.csr_matrix(adata.obsp[spatial_connectivities_key])
    if distance > 1:
        if n_hop_weights is None:
            n_hop_weights = [1] * distance
        elif len(n_hop_weights) < distance:
            n_hop_weights = n_hop_weights + [n_hop_weights[-1]] * (distance - len(n_hop_weights))

    if adata.n_obs >= _DEVICE_HOPS_MIN_N:
        # the profile stays a device array end-to-end: z-scoring and the
        # feature-kNN both run on device, so only cluster labels ever cross
        # the tunnel (a (1M, C) f32 profile alone is ~50 MB at ~25 MB/s)
        features = _nhood_profiles_device(
            adata, groups, adj, abs_nhood, distance, n_hop_weights, as_frame=False
        )
        idx_all = adata.obs.index
    else:
        profile = _neighborhood_profile(adata, groups, adj, abs_nhood)
        if distance > 1:
            weighted = n_hop_weights[0] * profile
            hop_adj = adj.copy()
            for n_hop in range(1, distance):
                hop_adj = hop_adj @ adj
                weighted = weighted + n_hop_weights[n_hop] * _neighborhood_profile(adata, groups, hop_adj, abs_nhood)
            if not abs_nhood:
                weighted = weighted / sum(n_hop_weights)
            profile = weighted
        features = profile.to_numpy(copy=True).astype(float)
        idx_all = profile.index

    if scale:
        features = zscore(features)

    if mask is not None:
        keep = np.asarray(idx_all.isin(mask.index[mask]))
        features_used = np.asarray(features)[keep]
    else:
        keep = None
        features_used = features

    resolutions = resolutions if isinstance(resolutions, list) else [resolutions]
    for res in resolutions:
        niche_key = f"nhood_niche_res={res}"
        if niche_key in adata.obs.columns:  # re-runs overwrite (DataFrame.pop takes no default)
            adata.obs.pop(niche_key)
        adata.uns.pop(f"{niche_key}_colors", None)

        labels = graph_cluster(features_used, n_neighbors, resolution=float(res) if not isinstance(res, tuple) else float(res[0]), random_state=random_state)
        if keep is None:
            adata.obs[niche_key] = labels
        else:
            col = np.full(len(idx_all), "not_a_niche", dtype=object)
            col[keep] = labels
            adata.obs[niche_key] = col

        if min_niche_size is not None:
            counts = adata.obs[niche_key].value_counts()
            to_filter = set(counts[counts < min_niche_size].index)
            adata.obs[niche_key] = [
                "not_a_niche" if v in to_filter else v for v in adata.obs[niche_key]
            ]


def _neighborhood_profile(adata: Any, groups: str, adj: sps.spmatrix, abs_nhood: bool) -> pd.DataFrame:
    """obs × category (absolute or relative) neighbor-category frequencies.

    Matches the reference's ``_calculate_neighborhood_profile``
    (gr/_niche.py:600-640): the relative frequency divides by the *maximum*
    neighbor count, and the nonzero pattern (not the weights) defines
    neighborship.
    """
    adj = sps.csr_matrix(adj)
    cats = pd.Categorical(np.asarray(adata.obs[groups]))
    unique_categories = np.unique(np.asarray(adata.obs[groups].values))
    cat_to_pos = {c: i for i, c in enumerate(unique_categories)}
    codes = np.array([cat_to_pos[c] for c in np.asarray(cats)], dtype=np.int64)

    n = adj.shape[0]
    deg = np.diff(adj.indptr)
    rows = np.repeat(np.arange(n), deg)
    abs_freq = np.zeros((n, len(unique_categories)), dtype=np.int64)
    np.add.at(abs_freq, (rows, codes[adj.indices]), 1)

    k = int(deg.max()) if n else 1
    if abs_nhood:
        return pd.DataFrame(abs_freq, index=adata.obs.index)
    return pd.DataFrame(abs_freq / k, index=adata.obs.index)


def _nhood_profiles_device(
    adata: Any,
    groups: str,
    adj: sps.spmatrix,
    abs_nhood: bool,
    distance: int,
    n_hop_weights: list[float] | None,
    as_frame: bool = True,
) -> "pd.DataFrame | Any":
    """Device n-hop neighbor-category profiles.

    Same numbers as the host path (``_neighborhood_profile`` over the
    ``hop_adj = hop_adj @ adj`` chain) but the ``A^k`` *patterns* come from
    :func:`squidpy_tpu.ops.hops.hop_reach` and the per-category counts are
    SpMVs of the one-hot matrix — no host spgemm, no 40M-nnz matrices
    through the tunnel. Counts are integers (exact in f32). With
    ``as_frame=False`` the profile is returned as the device array itself
    (row order = ``adata.obs.index``) so downstream stages can stay in HBM."""
    import jax.numpy as jnp

    from squidpy_tpu.ops.autocorr import spmv_genes
    from squidpy_tpu.ops.hops import ell_sentinel, hop_reach

    n = adj.shape[0]
    unique_categories = np.unique(np.asarray(adata.obs[groups].values))
    cat_to_pos = {c: i for i, c in enumerate(unique_categories)}
    codes = np.array([cat_to_pos[c] for c in np.asarray(adata.obs[groups])], dtype=np.int64)
    onehot = jnp.asarray(np.eye(len(unique_categories), dtype=np.float32)[codes])

    bi, bw = ell_sentinel(adj)
    bi_d, bw_d = jnp.asarray(bi), jnp.asarray(bw)

    def profile_of(idx, deg_max):
        counts = spmv_genes(idx, (idx < n).astype(jnp.float32), onehot)
        return counts if abs_nhood else counts / deg_max

    deg1 = int(np.diff(adj.indptr).max()) if n else 1
    profile = profile_of(bi_d, deg1)
    if distance > 1:
        weighted = n_hop_weights[0] * profile
        for n_hop, (idx, deg) in enumerate(hop_reach(bi_d, bw_d, distance), start=1):
            weighted = weighted + n_hop_weights[n_hop] * profile_of(idx, int(jnp.max(deg)))
        if not abs_nhood:
            weighted = weighted / sum(n_hop_weights)
        profile = weighted
    if not as_frame:
        return profile
    return pd.DataFrame(np.asarray(profile, dtype=float), index=adata.obs.index)


def _get_utag_niches(
    adata: Any, n_neighbors: int, resolutions: Any, spatial_connectivities_key: str, random_state: int
) -> None:
    """UTAG: L1-normalized A @ X via the device SpMV, PCA, cluster.

    The smoothed matrix never leaves the device: SpMV → covariance-PCA run
    back to back in HBM and only the (n, n_comps) embedding's kNN pull
    crosses the tunnel (inside ``graph_cluster``)."""
    graph = SpatialGraph.from_csr(sps.csr_matrix(adata.obsp[spatial_connectivities_key])).row_normalize()
    smoothed = graph.spmv(_device_X(adata))
    emb = pca_embed(smoothed)

    resolutions = resolutions if isinstance(resolutions, list) else [resolutions]
    for res in resolutions:
        labels = graph_cluster(emb, n_neighbors, resolution=float(res) if not isinstance(res, tuple) else float(res[0]), random_state=random_state)
        adata.obs[f"utag_niche_res={res}"] = labels


def _get_cellcharter_niches(
    adata: Any,
    distance: int,
    aggregation: str,
    n_components: int,
    random_state: int,
    spatial_connectivities_key: str,
    use_rep: str | None = None,
) -> None:
    """CellCharter-style k-hop aggregated features → embedding → GMM.

    Device-resident end to end: X ships once, every hop's SpMV, the
    concatenated feature block, the covariance-PCA and the GMM EM all stay
    in HBM — only the hop adjacency structure (host scipy spgemm) and the
    final labels cross the tunnel."""
    import jax.numpy as jnp

    adjacency_matrix = sps.csr_matrix(adata.obsp[spatial_connectivities_key])
    x_dev = _device_X(adata)

    if adata.n_obs >= _DEVICE_HOPS_MIN_N:
        arr = _cellcharter_hop_features(adjacency_matrix, x_dev, distance, aggregation)
    else:
        aggregated = []
        adj_hop = _setdiag(adjacency_matrix, 0)
        adj_visited = _setdiag(adjacency_matrix.copy(), 1)
        for k in range(distance + 1):
            if k == 0:
                aggregated.append(x_dev)
                continue
            if k > 1:
                adj_hop, adj_visited = _hop(adj_hop, adjacency_matrix, adj_visited)
            adj_norm = _normalize(adj_hop)
            graph = SpatialGraph.from_csr(sps.csr_matrix(adj_norm))
            mean_m = graph.spmv(x_dev)
            if aggregation == "mean":
                aggregated.append(mean_m)
            elif aggregation == "variance":
                mean_sq = graph.spmv(x_dev * x_dev)
                aggregated.append(mean_sq - mean_m * mean_m)
            else:
                raise ValueError(
                    f"Invalid aggregation method '{aggregation}'. Please choose either 'mean' or 'variance'."
                )
        arr = jnp.concatenate(aggregated, axis=1)

    if use_rep is not None:
        assert_key_in_adata(adata, use_rep, attr="obsm")
        embedding = np.asarray(adata.obsm[use_rep])
        if embedding.shape[1] < n_components:
            raise ValueError(
                f"Embedding has {embedding.shape[1]} components, but n_components={n_components}. "
                f"Please provide an embedding with at least {n_components} components."
            )
        embedding = embedding[:, :n_components]
    else:
        logg.warning(
            "CellCharter recommends a dimensionality-reduced embedding (e.g. scVI). "
            "'use_rep' not provided — PCA will be used as proxy."
        )
        embedding = pca_embed(arr)

    niches = gmm_cluster(embedding, n_components, random_state)
    adata.obs["cellcharter_niche"] = pd.Categorical(niches)


def _get_spatialleiden_domains(
    adata: Any,
    spatial_connectivities_key: str,
    latent_connectivities_key: str,
    resolutions: Any,
    layer_ratio: float,
    use_weights: Any,
    n_iterations: int,
    random_state: int,
) -> None:
    try:
        import spatialleiden as sl
    except ImportError as e:
        raise ImportError(
            "Please install the spatialleiden algorithm: `pip install spatialleiden`."
        ) from e
    resolutions = resolutions if isinstance(resolutions, list) else [resolutions]
    for res in resolutions:
        sl.spatialleiden(
            adata,
            resolution=res,
            use_weights=use_weights,
            n_iterations=n_iterations,
            layer_ratio=layer_ratio,
            latent_neighbors_key=latent_connectivities_key,
            spatial_neighbors_key=spatial_connectivities_key,
            random_state=random_state,
            directed=False,
            key_added=f"spatialleiden_res={res}",
        )


# -- sparse helpers (reference: gr/_niche.py:659-706) ------------------------

def _cellcharter_hop_features(adjacency_matrix: sps.spmatrix, x_dev: Any, distance: int, aggregation: str) -> Any:
    """Device k-hop ring aggregation — same numbers as the host
    ``_setdiag``/``_hop``/``_normalize`` chain below, but the exact ring
    adjacencies come from :func:`squidpy_tpu.ops.hops.hop_rings` (reference
    ``prod > visited`` semantics reproduced on device) so no spgemm runs on
    host and no 40M-nnz ELL ships through the tunnel."""
    import jax.numpy as jnp

    from squidpy_tpu.ops.autocorr import spmv_genes
    from squidpy_tpu.ops.hops import ell_sentinel, hop_rings

    if aggregation not in ("mean", "variance"):
        raise ValueError(f"Invalid aggregation method '{aggregation}'. Please choose either 'mean' or 'variance'.")

    n = adjacency_matrix.shape[0]
    bi, bw = ell_sentinel(adjacency_matrix)
    bi_d, bw_d = jnp.asarray(bi), jnp.asarray(bw)
    # hop 1 = setdiag(A, 0), row-normalized by *weighted* degree (_normalize)
    self_col = jnp.arange(n, dtype=jnp.int32)[:, None]
    r1_idx = jnp.where(bi_d == self_col, jnp.int32(n), bi_d)
    r1_w = jnp.where(r1_idx < n, bw_d, 0.0)
    rs = jnp.sum(r1_w, axis=1, keepdims=True)
    hops = [(r1_idx, jnp.where(rs > 0, r1_w / rs, 0.0))]
    if distance >= 2:
        for idx, deg in hop_rings(bi_d, bw_d, distance):
            d = jnp.maximum(deg.astype(jnp.float32), 1.0)[:, None]
            hops.append((idx, jnp.where(idx < n, 1.0 / d, 0.0)))

    feats = [x_dev]
    for idx, w in hops:
        mean_m = spmv_genes(idx, w, x_dev)
        if aggregation == "mean":
            feats.append(mean_m)
        else:
            feats.append(spmv_genes(idx, w, x_dev * x_dev) - mean_m * mean_m)
    return jnp.concatenate(feats, axis=1)


_DEVICE_HOPS_MIN_N = 20_000


def _setdiag(adjacency_matrix: sps.spmatrix, value: int) -> sps.csr_matrix:
    adjacency_matrix = adjacency_matrix.tolil()
    adjacency_matrix.setdiag(value)
    adjacency_matrix = adjacency_matrix.tocsr()
    if value == 0:
        adjacency_matrix.eliminate_zeros()
    return adjacency_matrix


def _hop(
    adj_hop: sps.spmatrix, adj: sps.spmatrix, adj_visited: sps.spmatrix | None = None
) -> tuple[sps.spmatrix, sps.spmatrix]:
    adj_hop = adj_hop @ adj
    if adj_visited is not None:
        adj_hop = (adj_hop > adj_visited).astype(float)
        adj_visited = adj_visited + adj_hop
    return adj_hop, adj_visited


def _normalize(adj: sps.spmatrix) -> sps.spmatrix:
    deg = np.asarray(adj.sum(axis=1)).squeeze()
    with np.errstate(divide="ignore"):
        deg_inv = 1.0 / deg
    deg_inv[~np.isfinite(deg_inv)] = 0
    return sps.spdiags(deg_inv, 0, len(deg_inv), len(deg_inv)) @ adj


# -- niche metrics (reference: gr/_niche.py:767-800) -------------------------

def _fide_score(adata: Any, niche_key: str, average: bool) -> Any:
    """F1-score of intra-domain edges: high = spatially continuous niches."""
    i, j = adata.obsp["spatial_connectivities"].nonzero()
    niche_labels = adata.obs.iloc[i][niche_key]
    neighbor_labels = adata.obs.iloc[j][niche_key]
    return f1_score(niche_labels, neighbor_labels, average="macro" if average else None)


def _jensen_shannon_divergence(adata: Any, niche_key: str, library_key: str) -> Any:
    """Mean pairwise Jensen-Shannon distance of niche-label distributions
    across slides. (The reference's version passes a single matrix to
    ``scipy.spatial.distance.jensenshannon``, which requires two vectors —
    here the pairwise mean is computed explicitly.)"""
    niche_labels = sorted(adata.obs[niche_key].unique())
    dists = []
    for _, slide in adata.obs.groupby(library_key, observed=True):
        counts = slide[niche_key].value_counts(normalize=True)
        dists.append([counts.get(label, 0) for label in niche_labels])
    arr = np.array(dists)
    if len(arr) < 2:
        return 0.0
    vals = [
        sp_distance.jensenshannon(arr[i], arr[j])
        for i in range(len(arr))
        for j in range(i + 1, len(arr))
    ]
    return float(np.mean(vals))


def _validate_niche_args(
    data: Any,
    flavor: str,
    library_key: str | None,
    table_key: str | None,
    groups: str | None,
    n_neighbors: int | None,
    resolutions: Any,
    aggregation: str | None,
) -> None:
    if flavor not in ("neighborhood", "utag", "cellcharter", "spatialleiden"):
        raise ValueError(
            f"Invalid flavor `{flavor!r}`. Valid options: "
            f"['neighborhood', 'utag', 'cellcharter', 'spatialleiden']."
        )
    if hasattr(data, "tables") and table_key is None:
        raise TypeError("missing required keyword-only argument: 'table_key'")
    if flavor == "neighborhood":
        if groups is None:
            raise ValueError("flavor='neighborhood' requires `groups`.")
        if n_neighbors is None:
            raise ValueError("flavor='neighborhood' requires `n_neighbors`.")
        if resolutions is None:
            raise ValueError("flavor='neighborhood' requires `resolutions`.")
    if flavor == "utag":
        if n_neighbors is None:
            raise ValueError("flavor='utag' requires `n_neighbors`.")
        if resolutions is None:
            raise ValueError("flavor='utag' requires `resolutions`.")
    if flavor == "cellcharter" and aggregation not in ("mean", "variance"):
        raise ValueError(
            f"Invalid aggregation method '{aggregation}'. Please choose either 'mean' or 'variance'."
        )
