"""Deterministic keyed RNG fan-out.

Mirrors the reference's ``spawn_generators`` contract
(/root/reference/src/squidpy/_utils.py:248-249): ``seed`` plus permutation
index fully determines each shuffle, independent of how the batch of
permutations is chunked or sharded across devices. Here the mechanism is
``jax.random.split`` — one subkey per permutation — instead of
``np.random.SeedSequence.spawn``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "spawn_keys",
    "permutation_batch",
    "shuffle_group_batch",
    "permutation_columns",
    "shuffle_group_columns",
]


def spawn_keys(seed: int | None, n: int) -> jax.Array:
    """Return ``n`` independent PRNG keys derived from ``seed``.

    ``seed=None`` draws fresh OS entropy (matching numpy's ``SeedSequence()``
    behavior in the reference), so repeated unseeded runs differ.
    """
    if seed is None:
        seed = int(np.random.SeedSequence().entropy % (2**31))
    key = jax.random.PRNGKey(seed)
    return jax.random.split(key, n)


def permutation_batch(keys: jax.Array, values: jax.Array) -> jax.Array:
    """Batched independent permutations of ``values``: shape ``(n_keys, len(values))``."""
    return jax.vmap(lambda k: jax.random.permutation(k, values))(keys)


def permutation_columns(
    keys: jax.Array, values: jax.Array, payload_dtype: jnp.dtype | None = None
) -> jax.Array:
    """Batched independent permutations of ``values``, one per COLUMN:
    shape ``(len(values), n_keys)``.

    The column-major layout feeds the batched pair-count kernel
    (:func:`squidpy_tpu.ops.nhood.permuted_pair_counts_cols`), whose shared
    neighbor-index gathers want the permutation axis minor. The permutation
    itself is one ``sort_key_val`` with the values riding as payload — no
    post-sort gather. Measured 2.8 ms/perm at 1M values on one v5e vs 5.2 ms
    for per-row ``jax.random.permutation`` + transpose.

    ``payload_dtype`` narrows the riding payload (e.g. ``uint8`` when values
    are cluster codes < 255) — the sort's bitonic passes move ~30% less and
    downstream row gathers 4x less, with the permutation itself unchanged
    (it is determined by the u32 keys alone, so results stay bitwise equal).

    Each column is fully determined by ``keys[p]`` (the ``spawn_generators``
    determinism contract: independent of batching/sharding).
    """
    if payload_dtype is not None:
        values = values.astype(payload_dtype)
    u = jax.vmap(lambda k: jax.random.bits(k, (values.shape[0],), jnp.uint32))(keys)
    payload = jnp.broadcast_to(values[None, :], u.shape)
    _, shuffled = jax.lax.sort_key_val(u, payload, dimension=1)
    return shuffled.T


def shuffle_group_columns(
    keys: jax.Array,
    values: jax.Array,
    groups: np.ndarray,
    payload_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """Batched within-group permutations, one per COLUMN: ``(len(values), n_keys)``.

    Same stratified-shuffle semantics as :func:`shuffle_group_batch` (values
    move only within their library segment), implemented as one lexicographic
    ``(group, uniform)`` two-key sort per permutation with the values as
    payload, then a single shared-index row gather back to original order.
    ``payload_dtype`` narrows the riding payload as in
    :func:`permutation_columns` (results stay bitwise equal).
    """
    if payload_dtype is not None:
        values = values.astype(payload_dtype)
    groups = np.asarray(groups)
    order = np.argsort(groups, kind="stable")
    inv_order = np.argsort(order, kind="stable")
    gsorted = jnp.asarray(groups[order].astype(np.int32))
    vsorted = values[jnp.asarray(order)]

    u = jax.vmap(lambda k: jax.random.bits(k, (values.shape[0],), jnp.uint32))(keys)
    g_rows = jnp.broadcast_to(gsorted[None, :], u.shape)
    payload = jnp.broadcast_to(vsorted[None, :], u.shape)
    _, _, shuffled_sorted = jax.lax.sort((g_rows, u, payload), dimension=1, num_keys=2)
    # (P, n) in group-sorted positions -> (n, P) in original order; the row
    # gather's indices are shared across all permutations
    return shuffled_sorted.T[jnp.asarray(inv_order), :]


def shuffle_group_batch(keys: jax.Array, values: jax.Array, groups: np.ndarray) -> jax.Array:
    """Batched within-group (library-stratified) permutations.

    Mirrors the reference's ``_shuffle_group``
    (/root/reference/src/squidpy/gr/_utils.py:185-213): values are permuted
    only within each group segment. Implemented as a random-sort per group:
    draw uniforms, offset by group id so sorting never crosses group
    boundaries, and gather values through the argsort. The base order within a
    group follows the original order, so the marginal distribution matches a
    uniform within-group shuffle.
    """
    groups = np.asarray(groups)
    order = np.argsort(groups, kind="stable")
    inv_order = np.argsort(order, kind="stable")
    order_j = jnp.asarray(order)
    inv_j = jnp.asarray(inv_order)
    gsorted = jnp.asarray(groups[order].astype(np.int32))

    def one(k: jax.Array) -> jax.Array:
        u = jax.random.uniform(k, (values.shape[0],))
        # lexsort-by-two-stable-sorts: order by the uniform first, then
        # stably by group — exact for any group count/size (a float composite
        # key like group*2+u quantizes the uniform away for large group ids)
        o1 = jnp.argsort(u)
        o2 = jnp.argsort(gsorted[o1], stable=True)
        perm_within = o1[o2]
        shuffled_sorted = values[order_j][perm_within]
        return shuffled_sorted[inv_j]

    return jax.vmap(one)(keys)
