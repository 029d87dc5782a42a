"""Graph-module utilities (reference: /root/reference/src/squidpy/gr/_utils.py)."""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any

import numpy as np
import pandas as pd
from scipy import sparse as sp

from squidpy_tpu.utils import logg

__all__ = [
    "extract_adata_if_sdata",
    "_assert_categorical_obs",
    "_assert_connectivity_key",
    "_assert_spatial_basis",
    "_save_data",
    "_extract_expression",
    "_genesymbols",
    "_shuffle_group",
]


def extract_adata_if_sdata(adata: Any, table_key: str | None = None) -> Any:
    """Accept AnnData or SpatialData; return the AnnData table.

    Duck-typed on ``.tables`` so it works with a real ``spatialdata.SpatialData``
    when installed (reference: /root/reference/src/squidpy/gr/_utils.py:25-52).
    """
    if hasattr(adata, "tables"):
        tables = adata.tables
        if table_key is not None:
            if table_key not in tables:
                raise KeyError(f"Table `{table_key}` not found in `sdata.tables`.")
            return tables[table_key]
        if len(tables) != 1:
            raise ValueError(
                f"Expected exactly one table in `sdata.tables`, found `{len(tables)}`. Please specify `table_key`."
            )
        return next(iter(tables.values()))
    if table_key is not None and not hasattr(adata, "tables"):
        # AnnData passed with table_key — harmless, ignore
        pass
    return adata


def _assert_categorical_obs(adata: Any, key: str) -> None:
    if key not in adata.obs:
        raise KeyError(f"Key `{key}` not found in `adata.obs`.")
    if not isinstance(adata.obs[key].dtype, pd.CategoricalDtype):
        raise TypeError(f"Expected `adata.obs[{key!r}]` to be `categorical`, found `{adata.obs[key].dtype}`.")


def _assert_connectivity_key(adata: Any, key: str) -> None:
    if key not in adata.obsp:
        raise KeyError(
            f"Spatial connectivity key `{key}` not found in `adata.obsp`. "
            f"Please run `squidpy_tpu.gr.spatial_neighbors` first."
        )


def _assert_spatial_basis(adata: Any, key: str) -> None:
    if key not in adata.obsm:
        raise KeyError(f"Spatial basis `{key}` not found in `adata.obsm`.")


def _assert_non_empty_sequence(seq: Any, *, name: str) -> list[Any]:
    if isinstance(seq, str):
        seq = [seq]
    seq = list(seq)
    if not len(seq):
        raise ValueError(f"No {name} have been selected.")
    return seq


def _save_data(adata: Any, *, attr: str, key: str, data: Any, prefix: bool = True, time: float | None = None) -> None:
    """Write a result under a conventional key and log it."""
    obj = getattr(adata, attr)
    obj[key] = data
    if prefix:
        logg.info(f"Adding `adata.{attr}[{key!r}]`", time=time)
    elif time is not None:
        logg.info("Finish", time=time)


def _extract_expression(
    adata: Any,
    genes: list[str] | None = None,
    use_raw: bool = False,
    layer: str | None = None,
) -> tuple[np.ndarray | sp.spmatrix, list[str]]:
    """Extract (cells x genes) expression and gene names."""
    if use_raw and getattr(adata, "raw", None) is not None:
        genes = list(adata.raw.var_names) if genes is None else [g for g in genes if g in set(adata.raw.var_names)]
        return adata.raw[:, genes].X, genes
    if genes is None:
        genes = list(adata.var_names)
    sub = adata[:, genes]
    X = sub.X if layer is None else sub.layers[layer]
    return X, genes


@contextmanager
def _genesymbols(adata: Any, *, key: str | None = None, use_raw: bool = False, make_unique: bool = False):  # noqa: ANN201
    """Temporarily rename var_names to gene symbols from ``adata.var[key]``."""
    def get_obj(a: Any) -> Any:
        return a.raw if use_raw and getattr(a, "raw", None) is not None else a

    if key is None:
        yield adata
        return
    obj = get_obj(adata)
    if key not in obj.var:
        raise KeyError(f"Unable to find gene symbols in `adata.var[{key!r}]`.")
    original = obj.var.index.copy()
    try:
        obj.var.index = pd.Index(obj.var[key].astype(str))
        if make_unique and not obj.var.index.is_unique:
            seen: dict[str, int] = {}
            new = []
            for n in obj.var.index:
                if n in seen:
                    seen[n] += 1
                    new.append(f"{n}-{seen[n]}")
                else:
                    seen[n] = 0
                    new.append(n)
            obj.var.index = pd.Index(new)
        yield adata
    finally:
        obj.var.index = original


def _shuffle_group(
    cluster_annotations: np.ndarray,
    libraries: pd.Series,
    rng: np.random.Generator,
) -> np.ndarray:
    """Host-side within-library permutation (reference:
    /root/reference/src/squidpy/gr/_utils.py:185-213). Device permutations use
    :func:`squidpy_tpu._core.rng.shuffle_group_batch` instead."""
    cluster_annotations = np.asarray(cluster_annotations)
    out = cluster_annotations.copy()
    for lib in libraries.cat.categories if hasattr(libraries, "cat") else np.unique(libraries):
        mask = np.asarray(libraries == lib)
        vals = out[mask]
        rng.shuffle(vals)
        out[mask] = vals
    return out
