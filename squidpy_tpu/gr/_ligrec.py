"""Receptor-ligand analysis (CellPhoneDB-style permutation test).

API/semantics parity with /root/reference/src/squidpy/gr/_ligrec.py:149-879:
``PermutationTestABC.prepare`` (complex policies min/all, uppercase/dedup,
gene filtering), ``test`` (threshold mask, NaN semantics, sparse result
frames, FDR along clusters/interactions) and the ``ligrec`` functional
façade. The permutation hot loop runs on device
(:mod:`squidpy_tpu.ops.ligrec`). Omnipath fetching stays a host op and is
gated on the optional ``omnipath`` package.
"""

from __future__ import annotations

from abc import ABC
from collections.abc import Iterable, Mapping
from itertools import product
from types import MappingProxyType
from typing import Any, Literal

import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy.sparse import csc_matrix, issparse

from squidpy_tpu._constants._constants import ComplexPolicy, CorrAxis
from squidpy_tpu._constants._pkg_constants import Key
from squidpy_tpu._core.rng import permutation_batch, spawn_keys
from squidpy_tpu.gr._utils import (
    _assert_categorical_obs,
    _genesymbols,
    _save_data,
    extract_adata_if_sdata,
)
from squidpy_tpu.utils import assert_positive, check_tuple_needles, logg
from squidpy_tpu.utils._stats import multipletests

__all__ = ["ligrec", "PermutationTest", "PermutationTestABC"]

SOURCE = "source"
TARGET = "target"


# below this (interaction-filtered) element count, x64 runs take the exact
# float64 host path (golden-pickle parity); above it, f32 + the device
# expression handle
_EXACT_SIZE_LIMIT = 4_000_000


def _fdr_correct(
    pvals: pd.DataFrame,
    corr_method: str,
    corr_axis: Literal["interactions", "clusters"] | CorrAxis,
    alpha: float = 0.05,
) -> pd.DataFrame:
    """FDR-correct p-values along the requested axis."""

    def fdr(pvals_col: pd.Series) -> pd.arrays.SparseArray:
        _, qvals, _, _ = multipletests(
            np.nan_to_num(pvals_col.values.astype(float), copy=True, nan=1.0),
            method=corr_method,
            alpha=alpha,
        )
        qvals[np.isnan(pvals_col.values.astype(float))] = np.nan
        return pd.arrays.SparseArray(qvals, dtype=qvals.dtype, fill_value=np.nan)

    corr_axis = CorrAxis(corr_axis)
    if corr_axis == CorrAxis.CLUSTERS:
        return pvals.apply(fdr)
    if corr_axis == CorrAxis.INTERACTIONS:
        return pvals.T.apply(fdr).T
    raise NotImplementedError(f"FDR correction for `{corr_axis}` is not implemented.")


class PermutationTestABC(ABC):
    """Receptor-ligand interaction testing.

    Workflow::

        pt = PermutationTest(adata).prepare(interactions)
        res = pt.test("clusters")
    """

    def __init__(self, adata: Any, use_raw: bool = True):
        if not hasattr(adata, "obs") or not hasattr(adata, "var_names"):
            raise TypeError(f"Expected `adata` to be an AnnData, found `{type(adata).__name__}`.")
        if not adata.n_obs:
            raise ValueError("No cells are in `adata.obs_names`.")
        if not adata.n_vars:
            raise ValueError("No genes are in `adata.var_names`.")

        self._adata = adata
        self._use_raw = bool(use_raw)
        self._had_nan = False
        if use_raw:
            if adata.raw is None:
                raise AttributeError("No `.raw` attribute found. Try specifying `use_raw=False`.")
            if adata.raw.shape[0] != adata.n_obs:
                raise ValueError(
                    f"Expected `{adata.n_obs}` cells in `.raw` object, found `{adata.raw.shape[0]}`."
                )
            data_obj = adata.raw
        else:
            data_obj = adata

        X = data_obj.X
        owned = issparse(X)  # whether X is our private copy (safe to mutate)
        X = np.asarray(csc_matrix(X).todense()) if issparse(X) else np.asarray(X)
        # keep the ORIGINAL dtype here: the precision decision (exact float64
        # for small/x64 runs vs float32 at scale) belongs in `_analysis`,
        # where it is taken on the interaction-FILTERED matrix — deciding on
        # the raw gene count would demote a cheap post-trim f64 run to f32
        # just because the dataset carries many unused genes
        if not np.issubdtype(X.dtype, np.floating):
            X = X.astype(np.float32)
            owned = True
        elif X.dtype == np.float16:
            X = X.astype(np.float32)
            owned = True
        # replace NaNs only when present: fillna unconditionally copies the
        # whole (possibly multi-100MB) matrix
        if np.isnan(X).any():
            X = np.nan_to_num(X, nan=0.0, posinf=np.inf, neginf=-np.inf, copy=not owned)
            self._had_nan = True  # the raw-X device handle would not reflect this cleanup
        self._data = pd.DataFrame(X, index=adata.obs_names, columns=data_obj.var_names, copy=False)

        self._interactions: pd.DataFrame | None = None
        self._filtered_data: pd.DataFrame | None = None

    def prepare(
        self,
        interactions: Any,
        complex_policy: Literal["min", "all"] | ComplexPolicy = ComplexPolicy.MIN.v,
    ) -> PermutationTestABC:
        """Validate and filter interactions; resolve protein complexes."""
        complex_policy = ComplexPolicy(complex_policy)

        if isinstance(interactions, Mapping):
            interactions = pd.DataFrame(interactions)
        if isinstance(interactions, pd.DataFrame):
            if SOURCE not in interactions.columns:
                raise KeyError(f"Column `{SOURCE!r}` is not in `interactions`.")
            if TARGET not in interactions.columns:
                raise KeyError(f"Column `{TARGET!r}` is not in `interactions`.")
            self._interactions = interactions.copy()
        elif isinstance(interactions, Iterable):
            interactions = tuple(interactions)
            if not len(interactions):
                raise ValueError("No interactions were specified.")
            if isinstance(interactions[0], str):
                interactions = list(product(interactions, repeat=2))
            elif len(interactions) == 2:
                interactions = tuple(zip(*interactions))
            if not all(len(i) == 2 for i in interactions):
                raise ValueError("Not all interactions are of length `2`.")
            self._interactions = pd.DataFrame(interactions, columns=[SOURCE, TARGET])
        else:
            raise TypeError(
                f"Expected either a `pandas.DataFrame`, `dict` or `iterable`, found `{type(interactions).__name__}`"
            )

        if self.interactions.empty:
            raise ValueError("The interactions are empty")

        # gene symbols are case-normalized on both sides before any matching
        self._data.columns = self._data.columns.str.upper()
        for col in (SOURCE, TARGET):
            self.interactions[col] = self.interactions[col].str.upper()
        self._dedupe_interactions()

        gene_dupes = self._data.columns.duplicated()
        if gene_dupes.any():
            logg.warning(f"Removed `{int(gene_dupes.sum())}` duplicate gene(s)")
            self._data = self._data.loc[:, ~gene_dupes]

        self._filter_interactions_complexes(complex_policy)
        self._filter_interactions_by_genes()
        self._trim_data()
        self._dedupe_interactions()
        return self

    def _dedupe_interactions(self) -> None:
        """Drop NaN-bearing and repeated (source, target) pairs, keeping the
        first occurrence so interaction metadata stays aligned."""
        self._interactions = self.interactions.dropna(subset=[SOURCE, TARGET]).drop_duplicates(
            subset=[SOURCE, TARGET]
        )

    def test(
        self,
        cluster_key: str,
        clusters: Any = None,
        n_perms: int = 1000,
        threshold: float = 0.01,
        seed: int | None = None,
        corr_method: str | None = None,
        corr_axis: Literal["interactions", "clusters"] | CorrAxis = CorrAxis.INTERACTIONS.v,
        alpha: float = 0.05,
        copy: bool = False,
        key_added: str | None = None,
        numba_parallel: bool | None = None,
        **kwargs: Any,
    ) -> Mapping[str, pd.DataFrame] | None:
        """Run the CellPhoneDB permutation test on device."""
        assert_positive(n_perms, name="n_perms")
        _assert_categorical_obs(self._adata, key=cluster_key)

        if corr_method is not None:
            corr_axis = CorrAxis(corr_axis)
        if len(self._adata.obs[cluster_key].cat.categories) <= 1:
            raise ValueError(
                f"Expected at least `2` clusters, found `{len(self._adata.obs[cluster_key].cat.categories)}`."
            )

        interactions = self.interactions[[SOURCE, TARGET]]
        # clusters as a side Series: never widen/copy the (cells x genes)
        # expression frame just to carry one categorical column
        cluster_series = pd.Series(
            self._adata.obs[cluster_key].astype("string").astype("category").values,
            index=self._filtered_data.index,
        )

        if clusters is None:
            clusters = list(map(str, self._adata.obs[cluster_key].cat.categories))
        if all(isinstance(c, str) for c in clusters):
            clusters = list(product(clusters, repeat=2))
        clusters = sorted(
            check_tuple_needles(
                clusters,
                cluster_series.cat.categories,
                msg="Invalid cluster `{0!r}`.",
                reraise=True,
            )
        )
        clusters_flat = list({c for cs in clusters for c in cs})

        row_mask = np.isin(np.asarray(cluster_series.values), clusters_flat)
        if row_mask.all():
            data = self._filtered_data  # common case: no row subset, no copy
            cat = cluster_series.cat.remove_unused_categories().cat
        else:
            data = self._filtered_data.loc[row_mask, :]
            cat = cluster_series[row_mask].cat.remove_unused_categories().cat

        cluster_mapper = dict(zip(cat.categories, range(len(cat.categories))))
        gene_mapper = dict(zip(data.columns, range(len(data.columns))))
        clusters_ = np.array([[cluster_mapper[c1], cluster_mapper[c2]] for c1, c2 in clusters], dtype=np.int32)
        interactions_ = np.vectorize(lambda g: gene_mapper[g])(interactions.values).astype(np.int32)

        start = logg.info(
            f"Running `{n_perms}` permutations on `{len(interactions)}` interactions "
            f"and `{len(clusters)}` cluster combinations on device"
        )

        # session-scoped device expression: at scale, reuse/create the cached
        # device X (ships once, shared with spatial_autocorr/sepal) instead of
        # re-shipping the trimmed matrix per call. The f64-exact small-run
        # path and any row-subset / NaN-cleaned / renamed-genes case keep the
        # host route.
        x_dev = None
        x_dev_bf16_exact = False
        import jax as _jax

        exact = bool(_jax.config.jax_enable_x64) and data.size <= _EXACT_SIZE_LIMIT
        if not exact and row_mask.all() and not self._had_nan:
            from squidpy_tpu._core.device_x import device_expression

            n_vars_src = self._adata.raw.n_vars if self._use_raw else self._adata.n_vars
            handle = device_expression(
                self._adata, use_raw=self._use_raw,
                create=2 * len(data.columns) >= n_vars_src,
            )
            if handle is not None:
                # prepare() uppercases the data columns (CellPhoneDB gene
                # convention, :165); resolve against uppercased handle names,
                # bailing out on ambiguity (two genes differing only by case)
                upper_map: dict[str, int] = {}
                for i, v in enumerate(handle.var_names):
                    u = v.upper()
                    upper_map[u] = -1 if u in upper_map else i
                try:
                    cols = np.asarray([upper_map[str(c).upper()] for c in data.columns], dtype=np.int64)
                    if (cols >= 0).all():
                        x_dev = handle.dense_block(cols)
                        x_dev_bf16_exact = handle.bf16_exact
                except KeyError:
                    x_dev = None

        res_means, res_pvalues = _analysis(
            None if x_dev is not None else data.to_numpy(),
            np.asarray(cat.codes.to_numpy(), dtype=np.int32),
            len(cat.categories),
            interactions_,
            clusters_,
            threshold=threshold,
            n_perms=n_perms,
            seed=seed,
            x_dev=x_dev,
            x_dev_bf16_exact=x_dev_bf16_exact,
        )

        index = pd.MultiIndex.from_frame(interactions, names=[SOURCE, TARGET])
        columns = pd.MultiIndex.from_tuples(clusters, names=["cluster_1", "cluster_2"])
        means_df = pd.DataFrame(
            {c: pd.arrays.SparseArray(res_means[:, i], fill_value=0) for i, c in enumerate(columns)},
            index=index,
        )
        means_df.columns = columns
        pvalues_df = pd.DataFrame(
            {c: pd.arrays.SparseArray(res_pvalues[:, i], fill_value=np.nan) for i, c in enumerate(columns)},
            index=index,
        )
        pvalues_df.columns = columns
        res = {
            "means": means_df,
            "pvalues": pvalues_df,
            "metadata": self.interactions[self.interactions.columns.difference([SOURCE, TARGET])].copy(),
        }
        res["metadata"].index = res["means"].index.copy()

        if corr_method is not None:
            logg.info(
                f"Performing FDR correction across the `{CorrAxis(corr_axis).v}` "
                f"using method `{corr_method}` at level `{alpha}`"
            )
            res["pvalues"] = _fdr_correct(res["pvalues"], corr_method, corr_axis, alpha=alpha)

        if copy:
            logg.info("Finish", time=start)
            return res

        _save_data(self._adata, attr="uns", key=Key.uns.ligrec(cluster_key, key_added), data=res, time=start)

    def _trim_data(self) -> None:
        # order-preserving unique keeps the take in near-original column order,
        # which pandas executes as a cheap contiguous block take
        wanted = set(self.interactions[SOURCE]) | set(self.interactions[TARGET])
        cols = [c for c in self._data.columns if c in wanted]
        self._filtered_data = self._data.loc[:, cols]

    def _filter_interactions_by_genes(self) -> None:
        known = self._data.columns
        keep = self.interactions[SOURCE].isin(known) & self.interactions[TARGET].isin(known)
        self._interactions = self.interactions.loc[keep]
        if self.interactions.empty:
            raise ValueError("After filtering by genes, no interactions remain.")

    def _resolve_complex_min(self, annotation: str | None, cache: dict[str, str | None]) -> str | None:
        """CellPhoneDB 'min' policy: a complex contributes its least-expressed
        member (by mean over cells); members absent from the data are ignored,
        and a complex with no present member resolves to ``None``."""
        if annotation is None:
            return None
        if "_" not in annotation:
            return annotation
        if annotation not in cache:
            members = [g for g in annotation.split("_") if g in self._data.columns]
            if len(members) > 1:
                cache[annotation] = str(self._data[members].mean().idxmin())
            else:
                cache[annotation] = members[0] if members else None
        return cache[annotation]

    def _filter_interactions_complexes(self, complex_policy: ComplexPolicy) -> None:
        """Resolve ``A_B_C`` complex annotations (semantics of reference
        /root/reference/src/squidpy/gr/_ligrec.py:489-552): ``'min'`` picks the
        member with minimum mean expression, ``'all'`` expands every
        source-member x target-member combination."""
        if complex_policy == ComplexPolicy.MIN:
            resolved: dict[str, str | None] = {}
            for col in (SOURCE, TARGET):
                self.interactions[col] = self.interactions[col].map(
                    lambda v: self._resolve_complex_min(v, resolved)
                )
        elif complex_policy == ComplexPolicy.ALL:
            member_lists = {col: self.interactions[col].map(lambda v: str(v).split("_")) for col in (SOURCE, TARGET)}
            table = self.interactions.drop(columns=[SOURCE, TARGET])
            # joining the member lists back by original row index, then
            # exploding, yields the per-row cartesian product while metadata
            # columns replicate along
            for col in (SOURCE, TARGET):
                table = table.join(member_lists[col].rename(col)).explode(col)
            self._interactions = table
        else:
            raise NotImplementedError(f"Complex policy {complex_policy!r} is not implemented.")

    @property
    def interactions(self) -> pd.DataFrame | None:
        """The interactions."""
        return self._interactions

    def __repr__(self) -> str:
        return (
            f"<{self.__class__.__name__}"
            f"[n_interaction={len(self.interactions) if self.interactions is not None else None}]>"
        )

    __str__ = __repr__


class PermutationTest(PermutationTestABC):
    """Permutation test with optional omnipath interaction fetching."""

    def prepare(
        self,
        interactions: Any = None,
        complex_policy: Literal["min", "all"] = ComplexPolicy.MIN.v,
        interactions_params: Mapping[str, Any] = MappingProxyType({}),
        transmitter_params: Mapping[str, Any] = MappingProxyType({"categories": "ligand"}),
        receiver_params: Mapping[str, Any] = MappingProxyType({"categories": "receptor"}),
        **_: Any,
    ) -> PermutationTest:
        if interactions is None:
            try:
                from omnipath.interactions import import_intercell_network
            except ImportError as e:
                raise ImportError(
                    "`interactions=None` requires the optional `omnipath` package to fetch the "
                    "intercell network. Install omnipath or pass interactions explicitly "
                    "(a DataFrame with 'source'/'target' columns)."
                ) from e
            start = logg.info("Fetching interactions from `omnipath`")
            interactions = import_intercell_network(
                interactions_params=interactions_params,
                transmitter_params=transmitter_params,
                receiver_params=receiver_params,
            )
            logg.info(f"Fetched `{len(interactions)}` interactions", time=start)
            if SOURCE in interactions.columns:
                interactions.pop(SOURCE)
            if TARGET in interactions.columns:
                interactions.pop(TARGET)
            interactions.rename(
                columns={"genesymbol_intercell_source": SOURCE, "genesymbol_intercell_target": TARGET},
                inplace=True,
            )
            interactions[SOURCE] = interactions[SOURCE].str.replace("^COMPLEX:", "", regex=True)
            interactions[TARGET] = interactions[TARGET].str.replace("^COMPLEX:", "", regex=True)

        super().prepare(interactions, complex_policy=complex_policy)
        return self


def ligrec(
    adata: Any,
    cluster_key: str,
    interactions: Any = None,
    complex_policy: Literal["min", "all"] = ComplexPolicy.MIN.v,
    threshold: float = 0.01,
    corr_method: str | None = None,
    corr_axis: Literal["interactions", "clusters"] = CorrAxis.CLUSTERS.v,
    use_raw: bool = True,
    copy: bool = False,
    key_added: str | None = None,
    gene_symbols: str | None = None,
    *,
    table_key: str | None = None,
    **kwargs: Any,
) -> Mapping[str, pd.DataFrame] | None:
    """Receptor-ligand permutation test (CellPhoneDB), all permutations batched
    on device. Stores ``uns['{cluster_key}_ligrec'] = {'means', 'pvalues',
    'metadata'}``."""
    adata = extract_adata_if_sdata(adata, table_key=table_key)
    with _genesymbols(adata, key=gene_symbols, use_raw=use_raw, make_unique=False):
        return (
            PermutationTest(adata, use_raw=use_raw)
            .prepare(interactions, complex_policy=complex_policy, **kwargs)
            .test(
                cluster_key=cluster_key,
                threshold=threshold,
                corr_method=corr_method,
                corr_axis=corr_axis,
                copy=copy,
                key_added=key_added,
                **kwargs,
            )
        )


def _is_integral(a: np.ndarray, block: int = 1 << 22) -> bool:
    """Whether every value is an exact integer, checked in ~16 MB blocks.

    A whole-array ``a != np.floor(a)`` would materialize a full float copy
    plus a full bool mask before any reduction; blockwise probing keeps the
    temporaries bounded and exits on the first fractional block.
    """
    # order='K' keeps this a VIEW for both C- and F-contiguous inputs
    # (pandas .to_numpy() is typically F-contiguous; reshape(-1) would copy
    # the whole matrix before the first block is probed)
    flat = a.ravel(order="K")
    for i in range(0, flat.size, block):
        blk = flat[i : i + block]
        if np.any(blk != np.floor(blk)):
            return False
    return True


def _analysis(
    data: np.ndarray | None,   # (n_cells, n_genes) — None when x_dev is given
    clustering: np.ndarray,    # (n_cells,) int32 codes
    n_cls: int,
    interactions: np.ndarray,  # (I, 2) [receptor, ligand] gene columns
    interaction_clusters: np.ndarray,  # (J, 2) cluster pairs
    threshold: float,
    n_perms: int,
    seed: int | None,
    x_dev: Any = None,         # device-resident expression (see device_x.py)
    x_dev_bf16_exact: bool = False,  # values bf16-exact (u8 counts): DEFAULT MXU precision suffices
) -> tuple[np.ndarray, np.ndarray]:
    """Observed means/mask on host, permutation loop on device.

    (See also ``_is_integral`` below — the integrality probe runs in bounded
    blocks so a multi-GB expression matrix never spawns full-size floor/bool
    temporaries on this page-fault-sensitive single-core host.)

    Precision policy (decided HERE, on the interaction-filtered matrix —
    the whole pipeline downstream runs in it): exact float64 for small/x64
    runs (parity with the reference's float64 pipeline, golden-pickle
    tests), float32 at scale, where this 1-core host's f64 BLAS and the
    emulated-f64 device math would dominate the call.
    """
    import jax

    if x_dev is not None:
        # device-resident expression path: per-cluster means and the
        # expression-fraction mask come from two one-hot matmuls on device
        # (HIGHEST precision on the data operand, ops/ligrec.py) — only the
        # tiny (C, G) tables cross the tunnel; X never ships here.
        from squidpy_tpu.ops.ligrec import cluster_means

        labels_dev = jnp.asarray(clustering)
        counts = np.bincount(clustering, minlength=n_cls).astype(np.float64)
        exact_bf16 = bool(x_dev_bf16_exact)
        mean = np.asarray(
            cluster_means(x_dev, labels_dev, n_cls, exact_bf16=exact_bf16)
        ).T.astype(np.float64)
        frac = np.asarray(
            cluster_means((x_dev > 0).astype(x_dev.dtype), labels_dev, n_cls, exact_bf16=True)
        ).T.astype(np.float64)
        mask = frac >= threshold
    else:
        exact = bool(jax.config.jax_enable_x64) and data.size <= _EXACT_SIZE_LIMIT
        host_t = np.float64 if exact else np.float32
        data_h = data if data.dtype == host_t else data.astype(host_t)

        # Ship the expression matrix FIRST (async device_put overlaps the host
        # mean/mask pass below) and in the narrowest lossless container: raw
        # counts are typically small non-negative integers, so a u8/u16 cast
        # moves 4-8x fewer bytes through the ~17 MB/s host<->device tunnel —
        # the measured round-2 bottleneck of this call. The widening back to
        # float happens on device.
        x_ship: np.ndarray = data_h
        if data_h.size and np.issubdtype(data_h.dtype, np.floating):
            dmax = float(data_h.max())
            dmin = float(data_h.min())
            if 0.0 <= dmin and dmax < 65536.0 and _is_integral(data_h):
                x_ship = data_h.astype(np.uint8 if dmax < 256.0 else np.uint16)
        x_dev = jnp.asarray(x_ship)
        if x_dev.dtype != data_h.dtype:
            x_dev = x_dev.astype(data_h.dtype)
        # u8 counts are bf16-exact: the perm kernel's one-hot × expression
        # matmul can run at DEFAULT MXU precision (1 pass instead of 3)
        exact_bf16 = x_ship.dtype == np.uint8

        # observed per-cluster means and expression-fraction mask
        onehot = np.zeros((len(clustering), n_cls), dtype=host_t)
        onehot[np.arange(len(clustering)), clustering] = 1.0
        counts = onehot.sum(axis=0)
        safe_counts = np.where(counts == 0, 1.0, counts).astype(host_t)
        mean = (data_h.T @ onehot) / safe_counts                               # (G, C)
        frac = ((data_h > 0).astype(host_t).T @ onehot) / safe_counts
        mask = frac >= threshold                                               # (G, C)

    rec, lig = interactions[:, 0], interactions[:, 1]
    c1, c2 = interaction_clusters[:, 0], interaction_clusters[:, 1]
    m1 = mean[rec[:, None], c1[None, :]]  # (I, J)
    m2 = mean[lig[:, None], c2[None, :]]
    both_positive = (m1 > 0) & (m2 > 0)
    mask_ok = mask[rec[:, None], c1[None, :]] & mask[lig[:, None], c2[None, :]]

    # device permutation pass matches the host precision chosen above
    keys = spawn_keys(seed, n_perms)
    shuffled = permutation_batch(keys, jnp.asarray(clustering))
    from squidpy_tpu.parallel.sharded import auto_ligrec_counts

    exceed = np.asarray(
        auto_ligrec_counts(
            x_dev,
            shuffled,
            jnp.asarray(counts, x_dev.dtype),
            jnp.asarray(rec),
            jnp.asarray(lig),
            jnp.asarray(c1),
            jnp.asarray(c2),
            jnp.asarray(m1 + m2, x_dev.dtype),
            n_cls,
            exact_bf16=exact_bf16,
        ),
        dtype=np.float64,
    )

    pvalues = exceed / n_perms
    pvalues[~(both_positive & mask_ok)] = np.nan
    res_means = np.where(both_positive, (m1 + m2) / 2.0, 0.0)
    return res_means, pvalues
