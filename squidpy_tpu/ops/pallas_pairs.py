"""Pallas kernel: fused pairwise-distance threshold counting.

The co-occurrence / Ripley hot loop needs, for every distance threshold r,
the count of point pairs (per class pair) with ``d² ≤ r``. The XLA path
(:mod:`squidpy_tpu.ops.cooccur`) computes a ``(tile, n)`` distance block in
HBM and reduces it per threshold; this kernel fuses the whole tile — the
distance block is produced by an MXU matmul directly in VMEM, compared
against all thresholds, and reduced into a VMEM-resident accumulator, so the
O(n²) intermediate never leaves the chip.

TPU layout constraints shape the design: coordinates and one-hot labels are
padded to 128 lanes, and the accumulator is one slab per row tile (the column
axis accumulates in place; slabs sum outside the kernel). Self-pairs and
padded phantom points are masked by *global index* inside the kernel — never
by ``d == 0``, which f32 matmul noise breaks.

**Measured reality (v5e, 30k points, 49 thresholds):** the fused kernel runs
5.7 s warmed vs 0.32 s for the XLA path — the per-threshold ``(tile, C)``
matmuls are too small to feed the MXU and Mosaic cannot pipeline across the
unrolled threshold loop. XLA's HBM-materialized formulation wins here, so
this kernel is an opt-in (``use_pallas=True``) reference implementation, not
the default. Counts can differ from the XLA path by a handful of
threshold-boundary pairs (different f32 rounding of d²).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cooccur_counts_pallas"]

_LANE = 128


def _make_kernel(row_tile: int, n_valid: int, n_thr: int, c_pad: int):
    def kernel(thr_ref, coords_row_ref, coords_col_ref, onehot_row_ref, onehot_col_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        a = coords_row_ref[...]  # (TR, 128) zero-padded features
        b = coords_col_ref[...]
        a2 = jnp.sum(a * a, axis=1, keepdims=True)
        b2 = jnp.sum(b * b, axis=1, keepdims=True)
        d2 = a2 + b2.T - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32)

        row_ids = i * row_tile + jax.lax.broadcasted_iota(jnp.int32, (row_tile, row_tile), 0)
        col_ids = j * row_tile + jax.lax.broadcasted_iota(jnp.int32, (row_tile, row_tile), 1)
        valid = (row_ids != col_ids) & (row_ids < n_valid) & (col_ids < n_valid)

        oh_row = onehot_row_ref[...]  # (TR, c_pad)
        oh_col = onehot_col_ref[...]

        # statically unrolled over thresholds (n_thr is a compile-time
        # constant); static slices keep the Mosaic lowering simple
        for l in range(n_thr):
            ind = jnp.where(valid & (d2 <= thr_ref[0, l]), 1.0, 0.0)
            s = jnp.dot(ind, oh_col, preferred_element_type=jnp.float32)       # (TR, c_pad)
            contrib = jnp.dot(oh_row.T, s, preferred_element_type=jnp.float32)  # (c_pad, c_pad)
            out_ref[0, l * c_pad : (l + 1) * c_pad, :] += contrib

    return kernel


@partial(jax.jit, static_argnames=("n_thr", "row_tile", "n_valid", "c_pad", "interpret"))
def _launch(coords, onehot, thresholds, n_thr, row_tile, n_valid, c_pad, interpret):
    n_pad = coords.shape[0]
    grid = (n_pad // row_tile, n_pad // row_tile)
    return pl.pallas_call(
        _make_kernel(row_tile, n_valid, n_thr, c_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, thresholds.shape[1]), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((row_tile, _LANE), lambda i, j: (i, 0)),
            pl.BlockSpec((row_tile, _LANE), lambda i, j: (j, 0)),
            pl.BlockSpec((row_tile, c_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((row_tile, c_pad), lambda i, j: (j, 0)),
        ],
        # one accumulator slab per row tile (the j axis accumulates into it);
        # slabs are summed outside the kernel
        out_specs=pl.BlockSpec((1, n_thr * c_pad, c_pad), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((grid[0], n_thr * c_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(thresholds, coords, coords, onehot, onehot).sum(axis=0)


def cooccur_counts_pallas(
    coords: np.ndarray,
    labels: np.ndarray,
    thresholds: np.ndarray,
    n_cls: int,
    *,
    row_tile: int = 512,
) -> np.ndarray:
    """Cumulative class-pair counts ``(n_cls, n_cls, L)`` with ``d² ≤ thr``.

    Drop-in replacement for :func:`squidpy_tpu.ops.cooccur.co_occurrence_counts`
    with the distance block fused in VMEM. Runs in interpreter mode off TPU
    (the CPU test mesh).
    """
    coords = np.ascontiguousarray(coords, dtype=np.float32)
    n, d = coords.shape
    n_thr = len(thresholds)
    interpret = jax.devices()[0].platform != "tpu"
    c_pad = _LANE

    row_tile = min(row_tile, ((max(8, n) + 7) // 8) * 8)
    n_pad = ((n + row_tile - 1) // row_tile) * row_tile
    coords_p = np.zeros((n_pad, _LANE), dtype=np.float32)
    coords_p[:n, :d] = coords
    onehot = np.zeros((n_pad, c_pad), dtype=np.float32)
    onehot[np.arange(n), labels.astype(np.int64)] = 1.0

    out = _launch(
        jnp.asarray(coords_p),
        jnp.asarray(onehot),
        jnp.asarray(np.asarray(thresholds, dtype=np.float32).reshape(1, -1)),
        n_thr,
        row_tile,
        n,
        c_pad,
        interpret,
    )
    counts = np.asarray(out, dtype=np.float64).reshape(n_thr, c_pad, c_pad)[:, :n_cls, :n_cls]
    return np.transpose(counts, (1, 2, 0))
