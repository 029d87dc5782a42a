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

__all__ = ["spawn_keys", "permutation_batch", "shuffle_group_batch"]


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
