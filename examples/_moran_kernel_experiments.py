"""Moran SpMV kernel experiments on the real TPU (round 2, VERDICT item 2).

Times three formulations of the Moran numerator at (1M cells, k=6, g genes):
  A) current: lax.scan over k, gather+FMA into an (n, g) accumulator
  B) fused:   single (n, k, g) gather folded straight into the reduction
  C) two-step: materialize weighted gather, sum k, then dot

Run: python examples/_moran_kernel_experiments.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from squidpy_tpu.ops.autocorr import spmv_genes


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def main() -> None:
    n, k = 1_000_000, 6
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, size=(n, k)).astype(np.int32))
    w = jnp.full((n, k), 1.0 / k, jnp.float32)

    @jax.jit
    def num_scan(idx, w, z):
        u = spmv_genes(idx, w, z)
        return jnp.sum(z * u, axis=0)

    @jax.jit
    def num_fused(idx, w, z):
        return jnp.sum(z[:, None, :] * w[:, :, None] * z[idx], axis=(0, 1))

    @jax.jit
    def num_twostep(idx, w, z):
        u = jnp.einsum("nk,nkg->ng", w, z[idx])
        return jnp.sum(z * u, axis=0)

    import sys
    for g in (256,):
        z = jnp.asarray(rng.normal(size=(n, g)).astype(np.float32))
        z2 = jnp.asarray(rng.normal(size=(n, g)).astype(np.float32))
        for name, fn in [("scan", num_scan), ("fused", num_fused), ("twostep", num_twostep)]:
            # warm on z, time on z2 (identical-run cache workaround)
            jax.block_until_ready(fn(idx, w, z))
            t = timed(fn, idx, w, z2)
            gbytes = 4 * n * g * (k + 1) / 1e9  # gather reads + z read
            print(f"g={g:5d} {name:8s}: {t*1e3:8.2f} ms  ({gbytes/t:6.1f} GB/s effective, {g/t:,.0f} genes/s)", flush=True)


if __name__ == "__main__":
    main()
