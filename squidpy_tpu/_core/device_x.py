"""Session-scoped device-resident expression handle.

At Xenium scale the host→device shipment of the expression matrix dominates
several statistics (ligrec re-shipped X per call; spatial_autocorr ships a
dense block per 512 genes). This handle ships X ONCE — in its narrowest
lossless container (u8/u16 for integral counts, else the backend float) —
and serves device-side dense gene blocks to every consumer
(``spatial_autocorr``, ``ligrec``, ``sepal``).

Cache protocol mirrors the device-graph cache
(:func:`squidpy_tpu._core.graph.graph_from_adata`): the handle lives on
``adata.uns`` keyed by a weak reference to the exact live X object PLUS a
strided value fingerprint, so both replacement of ``adata.X``/the layer and
in-place mutation (``adata.X[:] = ...``, ``X.data *= ...``) invalidate it.
The fingerprint samples ≤4096 strided values — adversarial edits that dodge
the sample grid while preserving shape/nnz are the only undetected case. Sparse X ships as CSC
(one transfer of the nnz arrays) and densifies blocks on device with a
segment scatter — at typical spatial sparsity that is 10-20× fewer bytes
than dense streaming.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from scipy import sparse as sp

__all__ = ["DeviceExpression", "device_expression", "HBM_BUDGET_BYTES"]

# do not pin more than this much HBM for the cached expression (v5e: 16 GB)
HBM_BUDGET_BYTES = 6_000_000_000


def _narrowest_container(x: np.ndarray) -> np.ndarray:
    """u8/u16 when losslessly integral and non-negative (raw counts), else
    the input — the ligrec round-3 shipping rule, now shared."""
    if not x.size or not np.issubdtype(x.dtype, np.floating):
        return x
    dmin = float(x.min())
    dmax = float(x.max())
    if 0.0 <= dmin and dmax < 65536.0:
        # bounded blocks: no full-size floor/bool temporaries on this host
        step = max(1, (1 << 22) // max(x.shape[1] if x.ndim == 2 else 1, 1))
        for r in range(0, x.shape[0], step):
            blk = x[r : r + step]
            if not np.array_equal(blk, np.floor(blk)):
                return x
        return x.astype(np.uint8 if dmax < 256.0 else np.uint16)
    return x


def _x_fingerprint(x: Any) -> tuple:
    """Cheap strided value checksum (≤4096 samples) + shape/nnz — catches
    in-place mutation (``adata.X[:] = ...``, ``X.data *= ...``) that weakref
    identity cannot. Deterministic, so equal data ⇒ equal fingerprint."""
    arr = x.data if sp.issparse(x) else np.asarray(x)
    if arr.ndim == 2 and not arr.flags.c_contiguous:
        arr = np.ascontiguousarray(arr[:: max(1, arr.shape[0] // 64)])
    flat = arr.ravel()
    k = flat.size
    if k == 0:
        return (tuple(x.shape), 0)
    s = flat[:: max(1, k // 4096)][:4096].astype(np.float64, copy=False)
    return (tuple(x.shape), k, float(s.sum()), float(s[0]), float(s[-1]))


class DeviceExpression:
    """Device-resident (n_cells × n_genes) expression with block access.

    ``ship_count`` tracks host→device transfers of the matrix — the contract
    tested by ``tests/test_device_x.py`` is that any number of statistic
    calls on the same live X performs exactly one shipment.
    """

    def __init__(self, x: Any, var_names: list[str]):
        self.var_names = list(map(str, var_names))
        self._col_of = {g: i for i, g in enumerate(self.var_names)}
        # duplicated names are ambiguous here (the dict keeps the LAST
        # occurrence) while the streaming fallback is positional — force
        # callers onto the fallback for those genes (columns_of → None)
        if len(self._col_of) != len(self.var_names):
            seen: set[str] = set()
            self._dup_names = {g for g in self.var_names if g in seen or seen.add(g)}
        else:
            self._dup_names = set()
        self.n_obs, self.n_vars = x.shape
        self.ship_count = 0
        self._float = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        if sp.issparse(x):
            csc = x.tocsc()
            self._kind = "csc"
            self._data = jnp.asarray(_narrowest_container(np.asarray(csc.data)))
            self._rows = jnp.asarray(csc.indices.astype(np.int32))
            self._indptr = np.asarray(csc.indptr, dtype=np.int64)  # host: block slicing
            # per-gene nnz padded to the max within each block at access time
            self.ship_count = 1
            self.nbytes = self._data.nbytes + self._rows.nbytes
        else:
            arr = _narrowest_container(np.ascontiguousarray(x))
            self._kind = "dense"
            self._dense = jnp.asarray(arr)
            self.ship_count = 1
            self.nbytes = self._dense.nbytes

    @property
    def bf16_exact(self) -> bool:
        """True when every stored value is exactly representable in bf16
        (u8 containers: integers ≤ 255) — downstream one-hot × expression
        matmuls can then run at DEFAULT MXU precision without error."""
        if self._kind == "dense":
            return self._dense.dtype == jnp.uint8
        return self._data.dtype == jnp.uint8

    def columns_of(self, genes: list[str]) -> np.ndarray | None:
        """Column indices for a gene-name list, or None if any is missing or
        ambiguous (duplicated in ``var_names`` — the streaming fallback
        resolves those positionally)."""
        try:
            if self._dup_names and any(str(g) in self._dup_names for g in genes):
                return None
            return np.asarray([self._col_of[str(g)] for g in genes], dtype=np.int64)
        except KeyError:
            return None

    def dense_block(self, cols: np.ndarray) -> jax.Array:
        """Device-side dense ``(n, len(cols))`` float block — no host ship."""
        cols = np.asarray(cols, dtype=np.int64)
        if self._kind == "dense":
            contiguous = len(cols) and np.array_equal(cols, np.arange(cols[0], cols[0] + len(cols)))
            if contiguous:
                blk = self._dense[:, int(cols[0]) : int(cols[0]) + len(cols)]
            else:
                blk = jnp.take(self._dense, jnp.asarray(cols), axis=1)
            return blk.astype(self._float)
        # CSC: scatter each gene's nonzeros into its dense column
        starts = self._indptr[cols]
        ends = self._indptr[cols + 1]
        counts = ends - starts
        total = int(counts.sum())
        # flat gather indices into the device nnz arrays (host-built, small)
        gather = np.empty(total, dtype=np.int64)
        col_ids = np.empty(total, dtype=np.int32)
        pos = 0
        for j, (s, e) in enumerate(zip(starts, ends)):
            gather[pos : pos + (e - s)] = np.arange(s, e)
            col_ids[pos : pos + (e - s)] = j
            pos += e - s
        vals = jnp.take(self._data, jnp.asarray(gather)).astype(self._float)
        rows = jnp.take(self._rows, jnp.asarray(gather))
        out = jnp.zeros((self.n_obs, len(cols)), self._float)
        return out.at[rows, jnp.asarray(col_ids)].set(vals)

    def full_dense(self, cols: np.ndarray | None = None) -> jax.Array:
        """Whole matrix (or a column subset) as a device float array."""
        if cols is None:
            cols = np.arange(self.n_vars)
        return self.dense_block(np.asarray(cols))


def device_expression(
    adata: Any,
    *,
    layer: str | None = None,
    use_raw: bool = False,
    create: bool = True,
) -> DeviceExpression | None:
    """The cached device expression handle for ``adata`` (ships X on first use).

    Returns None (streaming fallback) when the device copy would exceed the
    HBM budget, or when ``create=False`` and no handle is cached yet (callers
    touching only a few genes reuse an existing handle but do not force the
    whole matrix onto the device). Cache validity: the exact same live X
    object (weakref identity, like the device-graph cache)."""
    import weakref

    src_holder = adata.raw if use_raw else adata
    x = src_holder.X if layer is None else adata.layers[layer]
    cache_key = f"__squidpy_tpu_device_x__{layer}_{use_raw}"
    cached = adata.uns.get(cache_key)
    if (
        cached is not None
        and cached.get("x_ref") is not None
        and cached["x_ref"]() is x
        and cached.get("fp") == _x_fingerprint(x)
    ):
        return cached["handle"]
    if not create:
        return None

    if sp.issparse(x):
        est = x.data.nbytes // (2 if x.data.dtype.itemsize >= 4 else 1) + 4 * x.nnz
    else:
        est = np.asarray(x).nbytes // (2 if np.asarray(x).dtype.itemsize >= 4 else 1)
    if est > HBM_BUDGET_BYTES:
        return None

    handle = DeviceExpression(x, list(src_holder.var_names))
    try:
        x_ref = weakref.ref(x)
    except TypeError:
        x_ref = None
    adata.uns[cache_key] = {"handle": handle, "x_ref": x_ref, "fp": _x_fingerprint(x)}
    return handle
