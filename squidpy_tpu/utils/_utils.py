"""Core runtime utilities.

The reference's analogue is ``parallelize``/``thread_map``
(/root/reference/src/squidpy/_utils.py:92-306): host process/thread pools that
fan permutation batches across CPU cores. On TPU there is no host pool — the
batch axis is a device axis. :func:`chunked_vmap` is the one scheduling
primitive: apply a vmapped function over a leading batch axis in HBM-bounded
chunks via ``jax.lax.map``.
"""

from __future__ import annotations

import warnings
from collections.abc import Callable, Sequence
from functools import wraps
from typing import Any, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

NDArrayA = np.ndarray

__all__ = ["NDArrayA", "chunked_vmap", "deprecated_params", "to_host", "_ensure_dim_order"]


def to_host(x: "jax.Array", dtype: Any = None) -> np.ndarray:
    """Device→host transfer that flattens ≥3D arrays to 2D first.

    The TPU runtime relayouts ≥3D arrays with non-tile-aligned inner
    dimensions slice by slice on transfer (observed: a (1000, 12, 12) float32
    took 267s where the same bytes as (1000, 144) took 0.05s). Reshaping on
    device is free and sidesteps it.
    """
    shape = x.shape
    if x.ndim > 2:
        x = x.reshape(shape[0], -1)
    out = np.asarray(x).reshape(shape)
    return out.astype(dtype) if dtype is not None else out

T = TypeVar("T")


def chunked_vmap(
    fn: Callable[..., Any],
    batch: jax.Array | tuple[jax.Array, ...],
    *args: Any,
    chunk_size: int | None = None,
) -> Any:
    """Apply ``fn`` over the leading axis of ``batch``, chunked to bound HBM.

    ``fn`` maps one batch element (or tuple of elements) + ``*args`` (closed
    over) to an output pytree. With ``chunk_size=None`` this is a plain
    ``vmap``; otherwise ``lax.map`` over vmapped chunks — the TPU equivalent of
    the reference's ``n_split`` chunking in ``parallelize``
    (/root/reference/src/squidpy/_utils.py:132-149).
    """
    single = not isinstance(batch, tuple)
    batch_t = (batch,) if single else batch
    n = batch_t[0].shape[0]

    def call(elems: tuple[jax.Array, ...]) -> Any:
        return fn(*elems, *args)

    if chunk_size is None or chunk_size >= n:
        return jax.vmap(call)(batch_t)

    if chunk_size == 1:
        # plain sequential map — a vmap over a unit batch axis is NOT free
        # on TPU: batched bf16 gathers scalarize (measured 100× slower at
        # 1M×1024), and even f32 batched gathers lose ~35%
        return jax.lax.map(call, batch_t)

    n_chunks = n // chunk_size
    rem = n - n_chunks * chunk_size
    main = tuple(b[: n_chunks * chunk_size].reshape((n_chunks, chunk_size) + b.shape[1:]) for b in batch_t)
    out_main = jax.lax.map(jax.vmap(call), main)
    out_main = jax.tree_util.tree_map(lambda x: x.reshape((n_chunks * chunk_size,) + x.shape[2:]), out_main)
    if rem == 0:
        return out_main
    tail = tuple(b[n_chunks * chunk_size :] for b in batch_t)
    out_tail = jax.vmap(call)(tail)
    return jax.tree_util.tree_map(lambda a, b: jnp.concatenate([a, b], axis=0), out_main, out_tail)


def deprecated_params(params: dict[str, str]):  # noqa: ANN201
    """Warn when a deprecated keyword argument is passed (and drop it)."""

    def decorator(fn: Callable[..., T]) -> Callable[..., T]:
        @wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> T:
            for p, version in params.items():
                if p in kwargs:
                    warnings.warn(
                        f"`{p}` is deprecated since {version} and has no effect in squidpy_tpu.",
                        FutureWarning,
                        stacklevel=2,
                    )
                    kwargs.pop(p)
            return fn(*args, **kwargs)

        return wrapper

    return decorator


def deprecated(reason: str):  # noqa: ANN201
    """Mark a whole function as deprecated: every call warns with ``reason``
    (counterpart of the reference decorator, _utils.py:393-460)."""

    def decorator(fn: Callable[..., T]) -> Callable[..., T]:
        @wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> T:
            warnings.warn(
                f"`{fn.__name__}` is deprecated: {reason}",
                FutureWarning,
                stacklevel=2,
            )
            return fn(*args, **kwargs)

        return wrapper

    return decorator


def _ensure_dim_order(arr: np.ndarray, dims: Sequence[str], target: Sequence[str]) -> np.ndarray:
    """Transpose ``arr`` whose axes are labelled ``dims`` into ``target`` order."""
    if list(dims) == list(target):
        return arr
    perm = [list(dims).index(d) for d in target]
    return np.transpose(arr, perm)
