"""Moran 15k-gene north-star measurement + kernel variant comparison (round 2).

One jitted call scans over all gene blocks of a 15k-gene matrix at 1M cells,
generating each block on device (fold_in key) — this defeats the axon
identical-call cache, amortizes the ~1s dispatch overhead, and is exactly the
north-star Moran workload. Variants: scan-over-k SpMV (round 1) vs fused
(n, k, g) gather reduction.

Run from /root/repo: PYTHONPATH=/root/repo python examples/_moran_kernel_experiments.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    import squidpy_tpu  # noqa: F401
except ModuleNotFoundError:  # running the script in place, package not installed
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from squidpy_tpu.ops.autocorr import spmv_genes

N, K = 1_000_000, 6
G_BLOCK = 256
N_BLOCKS = 59  # 15,104 genes


@partial(jax.jit, static_argnums=(1, 2))
def make_graph(key, n, k):
    idx = jax.random.randint(key, (n, k), 0, n, dtype=jnp.int32)
    w = jnp.full((n, k), 1.0 / k, jnp.float32)
    return idx, w


def moran_block_scan(idx, w, z, s0):
    n = z.shape[0]
    zc = z - jnp.mean(z, axis=0, keepdims=True)
    u = spmv_genes(idx, w, zc)
    return (n / s0) * jnp.sum(zc * u, axis=0) / jnp.sum(zc * zc, axis=0)


def moran_block_fused(idx, w, z, s0):
    n = z.shape[0]
    zc = z - jnp.mean(z, axis=0, keepdims=True)
    num = jnp.sum(zc[:, None, :] * w[:, :, None] * zc[idx], axis=(0, 1))
    return (n / s0) * num / jnp.sum(zc * zc, axis=0)


def make_runner(block_fn, g_block):
    n_blocks_eff = (N_BLOCKS * G_BLOCK) // g_block

    @partial(jax.jit, static_argnums=(3,))
    def run(idx, w, key, n_blocks):
        s0 = jnp.sum(w)

        def one(i):
            z = jax.random.normal(jax.random.fold_in(key, i), (N, g_block), jnp.float32)
            return block_fn(idx, w, z, s0)

        return jax.lax.map(one, jnp.arange(n_blocks))

    return run, n_blocks_eff


def moran_block_rng_only(idx, w, z, s0):
    # RNG + centering only: isolates the data-generation cost from the SpMV
    n = z.shape[0]
    zc = z - jnp.mean(z, axis=0, keepdims=True)
    return (n / s0) * jnp.sum(zc * zc, axis=0) / jnp.sum(zc * zc, axis=0)


def main() -> None:
    idx, w = make_graph(jax.random.PRNGKey(0), N, K)
    jax.block_until_ready(idx)
    print("graph ready", flush=True)

    cases = [
        ("rng_only g=256", moran_block_rng_only, 256),
        ("scan g=256", moran_block_scan, 256),
        ("scan g=512", moran_block_scan, 512),
        ("scan g=1024", moran_block_scan, 1024),
    ]
    for name, block_fn, gb in cases:
        run, nb = make_runner(block_fn, gb)
        jax.block_until_ready(run(idx, w, jax.random.PRNGKey(99), nb))  # compile+warm
        ts = []
        for rep in range(3):
            t0 = time.time()
            out = run(idx, w, jax.random.PRNGKey(rep), nb)
            checksum = float(jnp.sum(out))  # host round-trip forces completion
            ts.append(time.time() - t0)
        t = min(ts)
        genes = nb * gb
        print(
            f"{name:14s}: {t:7.3f} s for {genes} genes "
            f"({genes/t:,.0f} genes/s, {t/nb*1e3:.1f} ms/block, checksum={checksum:.4f})",
            flush=True,
        )
        assert np.isfinite(np.asarray(out)).all()


if __name__ == "__main__":
    main()
