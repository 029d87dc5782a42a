"""O(n) keyed index-cipher permutations (sort-free device shuffles).

The permutation-test null only needs, per permutation, a uniform random
arrangement of the fixed label multiset over the ``n`` positions (the
reference shuffles the label vector, /root/reference/src/squidpy/gr/_utils.py:185-213
— same distribution). Composing ANY fixed assignment with a uniform random
bijection of positions is such an arrangement, so generation factors into:

1. a keyed bijection ``pi_p : [0, n) -> [0, n)`` computable element-wise by
   pure integer arithmetic (no memory traffic), and
2. the label-of-sorted-position step function ``L(t) = #{c : cum[c] <= t}``
   — a handful of compares against the ``C-1`` class boundaries.

``shuffled[i, p] = L(pi_p(i))`` then costs O(n·C) ALU per permutation versus
the O(n log n) bitonic sort of :func:`squidpy_tpu._core.rng.permutation_columns`
(measured ~2.0 ms/perm at 1M cells — ~80% of the round-2 flagship benchmark).

The bijection is an alternating Feistel cipher on the mixed-radix domain
``Z_a x Z_b`` with ``a = ceil(sqrt(n))``, ``b = ceil(n/a)`` (Black & Rogaway,
"Ciphers with Arbitrary Finite Domains": generalized Feistel + cycle-walking).
The excess ``a·b - n < a ~ sqrt(n)`` makes a cycle-walk step land out of range
with probability ~``1/b``, so the whole-array ``while_loop`` converges in a
few passes; bijectivity is exact (the loop runs until every lane is in
range), not probabilistic. Round keys derive from the per-permutation
``jax.random`` keys, preserving the seed+index determinism contract
(results independent of chunking/sharding).

Small domains mix poorly in few Feistel rounds, so callers keep the
sort-based generator below ``MIN_CIPHER_N`` positions (where the sort is
cheap anyway); statistical agreement with the exact permutation-null moments
is locked by ``tests/test_index_cipher.py``.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "MIN_CIPHER_N",
    "cipher_label_columns",
    "cipher_index_batch",
]

# Below this many positions the bitonic-sort generator is both cheap and a
# gold-standard uniform shuffle; above it the cipher's domain (~sqrt(n) per
# Feistel half) is large enough to mix well in DEFAULT_ROUNDS rounds.
MIN_CIPHER_N = 65_536

DEFAULT_ROUNDS = 8

_M1 = np.uint32(0x7FEB352D)
_M2 = np.uint32(0x846CA68B)


def _mix32(x: jax.Array) -> jax.Array:
    """murmur3-style 32-bit finalizer (full-avalanche integer hash)."""
    x = x ^ (x >> 16)
    x = x * _M1
    x = x ^ (x >> 15)
    x = x * _M2
    return x ^ (x >> 16)


def _radices(n: int) -> tuple[int, int]:
    a = math.isqrt(n - 1) + 1 if n > 1 else 1
    b = -(-n // a)
    return a, b


def _encrypt(y: jax.Array, round_keys: jax.Array, a: int, b: int) -> jax.Array:
    """One full cipher pass on ``[0, a*b)``. ``y``: (n, P) uint32;
    ``round_keys``: (R, P) uint32 (per-column keys broadcast over rows)."""
    au = np.uint32(a)
    bu = np.uint32(b)
    u = y % au
    v = y // au
    for r in range(round_keys.shape[0]):
        rk = round_keys[r][None, :]
        if r % 2 == 0:
            u = (u + _mix32(v ^ rk) % au) % au
        else:
            v = (v + _mix32(u ^ rk) % bu) % bu
    return v * au + u


def _walked(y: jax.Array, round_keys: jax.Array, a: int, b: int, n: int) -> jax.Array:
    """Cycle-walk out-of-range lanes until the whole slab lies in [0, n)."""
    y = _encrypt(y, round_keys, a, b)
    if a * b == n:
        return y
    nu = np.uint32(n)

    def body(t: jax.Array) -> jax.Array:
        return jnp.where(t >= nu, _encrypt(t, round_keys, a, b), t)

    return jax.lax.while_loop(lambda t: jnp.any(t >= nu), body, y)


@partial(jax.jit, static_argnames=("n",))
def _positions_cols(round_keys: jax.Array, n: int) -> jax.Array:
    """(n, P) uint32: column ``p`` holds the bijection ``pi_p`` of [0, n)."""
    a, b = _radices(n)
    base = jnp.arange(n, dtype=jnp.uint32)[:, None]
    y = jnp.broadcast_to(base, (n, round_keys.shape[1]))
    return _walked(y, round_keys, a, b, n)


def _round_keys(keys: jax.Array, rounds: int) -> jax.Array:
    """(R, P) uint32 round keys from (P,) PRNG keys."""
    return jax.vmap(lambda k: jax.random.bits(k, (rounds,), jnp.uint32))(keys).T


@partial(jax.jit, static_argnames=("counts", "out_dtype"))
def _labels_from_positions(pos: jax.Array, counts: tuple[int, ...], out_dtype: jnp.dtype) -> jax.Array:
    # label(t) = number of class boundaries <= t; accumulated boundary-by-
    # boundary so nothing of shape (n, P, C) ever materializes
    lbl = jnp.zeros(pos.shape, dtype=out_dtype)
    edge = 0
    for c in counts[:-1]:
        edge += c
        lbl = lbl + (pos >= np.uint32(edge)).astype(out_dtype)
    return lbl


def cipher_label_columns(
    keys: jax.Array,
    class_counts: np.ndarray,
    *,
    rounds: int = DEFAULT_ROUNDS,
    out_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """Independent uniform arrangements of a label multiset, one per COLUMN.

    Returns ``(n, n_keys)`` labels where ``n = sum(class_counts)`` and every
    column contains exactly ``class_counts[c]`` occurrences of label ``c``
    (verified bijectivity), arranged uniformly at random — the same null as
    shuffling the label vector. Drop-in for the nhood pipeline's
    ``permutation_columns(keys, labels, payload_dtype=...)`` when labels are
    class codes; O(n) ALU per permutation instead of an O(n log n) sort.
    """
    counts = tuple(int(c) for c in np.asarray(class_counts))
    n = sum(counts)
    if out_dtype is None:
        out_dtype = jnp.uint8 if len(counts) <= 256 else jnp.int32
    pos = _positions_cols(_round_keys(keys, rounds), n)
    return _labels_from_positions(pos, counts, out_dtype)


def cipher_index_batch(keys: jax.Array, n: int, *, rounds: int = DEFAULT_ROUNDS) -> jax.Array:
    """Batched index permutations ``(n_keys, n)`` int32: row ``p`` is a keyed
    bijection of ``arange(n)`` — O(n) replacement for
    ``permutation_batch(keys, jnp.arange(n))`` at large ``n``."""
    pos = _positions_cols(_round_keys(keys, rounds), n)
    return pos.T.astype(jnp.int32)
