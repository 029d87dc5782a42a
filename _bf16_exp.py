import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

N, K, C, P = 1_000_000, 6, 16, 200

rng = np.random.default_rng(0)
indices = jnp.asarray(rng.integers(0, N, size=(N, K)).astype(np.int32))
mask = jnp.ones((N, K), dtype=bool)
labels = jnp.asarray(rng.integers(0, C, size=N).astype(np.int32))

from squidpy_tpu._core.rng import permutation_batch, spawn_keys
from squidpy_tpu.ops.nhood import permuted_pair_counts
from squidpy_tpu.utils import chunked_vmap

@partial(jax.jit, static_argnames=("n_cls",))
def pair_counts_bf16(indices, mask, labels, n_cls):
    labels = labels.astype(jnp.int32)
    nbr_labels = labels[indices]
    w = mask.astype(jnp.bfloat16)
    nbr_onehot = jax.nn.one_hot(nbr_labels, n_cls, dtype=jnp.bfloat16)
    R = jnp.einsum("nk,nkc->nc", w, nbr_onehot, preferred_element_type=jnp.float32)
    src_onehot = jax.nn.one_hot(labels, n_cls, dtype=jnp.bfloat16)
    return jnp.dot(src_onehot.T, R.astype(jnp.bfloat16), preferred_element_type=jnp.float32)

def run_cur(seed):
    sh = permutation_batch(spawn_keys(seed, P), labels)
    return permuted_pair_counts(indices, mask, sh, C)

def run_bf16(seed, chunk):
    sh = permutation_batch(spawn_keys(seed, P), labels)
    return chunked_vmap(lambda l: pair_counts_bf16(indices, mask, l, C), sh, chunk_size=chunk)

# correctness first
a = np.asarray(run_cur(7))[:3]
b = np.asarray(run_bf16(7, 8))[:3]
print("exact match:", np.array_equal(a, b), "max diff:", np.abs(a - b).max())

jax.block_until_ready(run_cur(99))
t = time.perf_counter(); jax.block_until_ready(run_cur(1)); cur = P / (time.perf_counter() - t)
print(f"current f32: {cur:.0f} perms/s")
for chunk in (8, 16, 32):
    jax.block_until_ready(run_bf16(98, chunk))
    t = time.perf_counter(); jax.block_until_ready(run_bf16(2, chunk)); r = P / (time.perf_counter() - t)
    print(f"bf16 chunk={chunk}: {r:.0f} perms/s")
