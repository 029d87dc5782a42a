"""Optional on-disk memoization for permutation batches.

The reference's only "checkpoint" is the AnnData container itself — every
result is written under deterministic keys and an ``.h5ad`` write persists it
(/root/reference/src/squidpy/gr/_utils.py:77-86). That contract is kept; this
module adds the SURVEY-suggested optional layer on top: the expensive
permutation-null computations (1000-perm neighborhood enrichment, Moran/Geary
permutation scores) can memoize their raw permutation statistics on disk,
keyed by a digest of every input that determines the result (graph, labels,
seed, perm count, op parameters). Re-running the same call — e.g. after a
crash, or in a resumed notebook — then skips the device computation entirely.

Enable by passing ``cache=True`` (uses ``$SQUIDPY_TPU_CACHE`` or
``~/.cache/squidpy_tpu/memo``) or ``cache="/some/dir"`` to the supported
``gr`` functions. Determinism of the keyed RNG (`jax.random` fold-in per
permutation index) is what makes the cached batch exactly equal to a fresh
run.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Any, Callable, Mapping

import numpy as np

__all__ = ["memoize_arrays", "resolve_cache_dir", "cache_key"]


def resolve_cache_dir(cache: bool | str | os.PathLike) -> Path | None:
    """Map the user-facing ``cache`` argument to a directory (None = off)."""
    if cache is False or cache is None:
        return None
    if cache is True:
        return Path(os.environ.get("SQUIDPY_TPU_CACHE", Path.home() / ".cache" / "squidpy_tpu" / "memo"))
    return Path(cache)


def cache_key(op: str, arrays: Mapping[str, Any], params: Mapping[str, Any]) -> str:
    """Digest of everything that determines a permutation batch.

    ``arrays`` are hashed by raw bytes (shape/dtype included); ``params`` by
    repr of a sorted item list — both changes invalidate the key.
    """
    h = hashlib.sha256(op.encode())
    for name in sorted(arrays):
        a = np.ascontiguousarray(np.asarray(arrays[name]))
        h.update(name.encode())
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
    h.update(repr(sorted(params.items())).encode())
    return h.hexdigest()


def memoize_arrays(
    cache: bool | str | os.PathLike,
    op: str,
    arrays: Mapping[str, Any],
    params: Mapping[str, Any],
    compute: Callable[[], dict[str, np.ndarray]],
) -> dict[str, np.ndarray]:
    """Return ``compute()``, memoized under a content-derived key.

    With ``cache`` falsy, just computes. Corrupt or unreadable cache entries
    are recomputed and rewritten; writes are atomic (tmp file + rename) so a
    crash mid-write never poisons the cache.
    """
    cache_dir = resolve_cache_dir(cache)
    if cache_dir is None:
        return compute()

    key = cache_key(op, arrays, params)
    path = cache_dir / op / f"{key}.npz"
    if path.exists():
        try:
            with np.load(path) as z:
                return {k: z[k] for k in z.files}
        except Exception:  # noqa: BLE001 — corrupt entry: recompute below
            path.unlink(missing_ok=True)

    result = {k: np.asarray(v) for k, v in compute().items()}
    path.parent.mkdir(parents=True, exist_ok=True)
    # np.savez appends ".npz" when absent — keep the suffix on the temp name
    tmp = path.with_name(f"{path.stem}.tmp{os.getpid()}.npz")
    np.savez(tmp, **result)
    os.replace(tmp, path)
    return result
