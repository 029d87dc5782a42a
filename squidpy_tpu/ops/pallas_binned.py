"""Pallas TPU kernel for the binned pair-statistic sweep.

The XLA formulation of the boundary-block sweep
(:func:`squidpy_tpu.ops.pairbins.binned_pair_counts_device`) is HBM-bound: the
``(tile, tile)`` f32 distance block round-trips to HBM once per threshold
(measured 44 s at 1M cells × 49 default-interval thresholds — ~27 TB of
traffic). This kernel keeps the whole per-item pipeline VMEM-resident: one
grid step DMAs two coordinate/label slices (~50 KB), computes the distance
block, applies every threshold of the item's group, and accumulates exact
integer digits into a group-indexed output block — HBM traffic drops to the
inputs (~40 GB at 1M cells), leaving the VPU compare chain and bf16 MXU
count matmuls as the cost.

Structure notes (hard-won on this toolchain, see CLAUDE.md):
- the work-item arrays are scalar-prefetch operands and therefore live in
  SMEM (~1 MB): the item list is processed in chunks of ``CHUNK`` items, a
  ``lax.scan`` over one ``pallas_call`` per chunk (single dispatch, one
  executable);
- each chunk starts with ``G`` dummy items (``first=1``, ``rfull=0``) that
  zero-initialize every group's output block — Pallas outputs are
  uninitialized memory, and a chunk might otherwise never visit a group;
- the threshold loop is STATICALLY UNROLLED (``gsize`` python loop) and all
  accumulator writes are full-block — no dynamic ``pl.ds`` writes (those hang
  the Mosaic remote compile);
- per-item counts (≤ tile² < 2²⁴) split into base-2¹² digits with an int32
  carry every item, exact while ``items × 257 < 2³¹`` (≈8M items);
- all MXU inputs stay bf16-exact: the indicator and one-hots are 0/1, and
  the (tile, C) partial is digit-split to ≤256 before the second dot (the
  MXU truncates f32 inputs to bf16 — integers > 256 would be corrupted);
- one-hots are built in-kernel from int32 labels (padding label −1 → zero
  row), so no (n, C) table ships through the tunnel or HBM;
- distances use the full-f32 VPU difference form, the same formulation as
  the XLA path (:func:`squidpy_tpu.ops.knn.pairwise_sq_dists_exact`).

Counts may differ from the XLA oracle by ±1-ulp knife-edge pairs only
(Mosaic's instruction scheduling is not guaranteed bit-identical to XLA's);
the host empty/full classification margin covers both (ops/pairbins.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from squidpy_tpu.ops.pairbins import BinnedPairPlan

__all__ = ["pallas_item_chunks", "binned_pair_counts_pallas"]

# items per pallas_call: 6 int32 scalar-prefetch arrays must fit SMEM (~1 MB)
CHUNK = 16384


def pallas_item_chunks(plan: BinnedPairPlan) -> tuple[np.ndarray, ...]:
    """Chunk the plan's work items for the scanned Pallas kernel.

    Within a chunk, items are gid-MONOTONIC with each group's zero-initializing
    dummy (``first=1``, ``rfull=0``) interleaved at the START of that group's
    segment. This matters: Pallas output blocks are write-only buffers that do
    NOT read back HBM on re-entry, so each group's block must be visited in
    exactly one consecutive run per call — monotonic gid guarantees it, and
    the per-group dummy guarantees every block is initialized (a chunk whose
    real items skip a group would otherwise return garbage for it).
    Returns ``(ti, tj, rf, re, gid, first)`` of shape ``(n_chunks, CHUNK)``.
    """
    G = plan.thr_groups.shape[0]
    m = plan.n_items
    order = np.argsort(plan.gid[:m], kind="stable")
    ti, tj = plan.ti[:m][order], plan.tj[:m][order]
    rf, gid = plan.rfull[:m][order], plan.gid[:m][order]
    re = plan.rempty[:m][order]

    per_chunk = CHUNK - G
    n_chunks = max(1, -(-m // per_chunk))
    # bucket the chunk count so different datasets share one executable
    b = 1
    while b < n_chunks:
        b *= 2
    n_chunks = b

    dummy_gids = np.arange(G, dtype=np.int32)
    zeros_g = np.zeros(G, np.int32)
    ones_g = np.ones(G, np.int32)

    ti_c = np.zeros((n_chunks, CHUNK), np.int32)
    tj_c = np.zeros((n_chunks, CHUNK), np.int32)
    rf_c = np.zeros((n_chunks, CHUNK), np.int32)
    re_c = np.zeros((n_chunks, CHUNK), np.int32)
    gid_c = np.full((n_chunks, CHUNK), G - 1, np.int32)  # tail padding: keep gid monotone
    first_c = np.zeros((n_chunks, CHUNK), np.int32)
    for c in range(n_chunks):
        sl = slice(c * per_chunk, (c + 1) * per_chunk)
        pg = gid[sl]
        # dummy for group g goes immediately before g's first item (groups
        # with no items get consecutive ascending dummies — still monotone)
        ins = np.searchsorted(pg, dummy_gids, side="left")
        row_ti = np.insert(ti[sl], ins, zeros_g[: len(ins)])
        row_tj = np.insert(tj[sl], ins, zeros_g)
        row_rf = np.insert(rf[sl], ins, zeros_g)
        row_re = np.insert(re[sl], ins, zeros_g)
        row_gid = np.insert(pg, ins, dummy_gids)
        row_first = np.insert(np.zeros(len(pg), np.int32), ins, ones_g)
        k = len(row_gid)
        ti_c[c, :k] = row_ti
        tj_c[c, :k] = row_tj
        rf_c[c, :k] = row_rf
        re_c[c, :k] = row_re
        gid_c[c, :k] = row_gid
        first_c[c, :k] = row_first
        # tail padding items keep the LAST group id so gid stays monotone
        if k < CHUNK:
            gid_c[c, k:] = row_gid[-1]
    return ti_c, tj_c, rf_c, re_c, gid_c, first_c


def _kernel_body(gsize: int, c_pad: int, tile: int):
    def kernel(ti_s, tj_s, rf_s, re_s, gid_s, first_s, thr_s,
               rows_ref, cols_ref, labi_ref, labj_ref,
               hi_ref, lo_ref, d2_ref):
        g = pl.program_id(0)
        rf = rf_s[g]
        re = re_s[g]
        gd = gid_s[g]
        ti = ti_s[g]
        tj = tj_s[g]

        @pl.when(first_s[g] == 1)
        def _init():
            hi_ref[...] = jnp.zeros(hi_ref.shape, hi_ref.dtype)
            lo_ref[...] = jnp.zeros(lo_ref.shape, lo_ref.dtype)

        rows = rows_ref[...]  # (tile, 2) f32
        cols = cols_ref[...]
        # difference-form squared distances on the VPU in full f32 — same
        # formulation as the XLA path (pairwise_sq_dists_exact); the MXU
        # expanded form would truncate inputs to bf16
        dx = rows[:, 0:1] - cols[:, 0:1].T
        dy = rows[:, 1:2] - cols[:, 1:2].T
        d2_ref[...] = dx * dx + dy * dy

        # strict upper triangle — but ONLY diagonal blocks need it
        # (off-diagonal ti<tj blocks have gi<gj for every element), so the
        # iota mask pass runs for T of the ~T²/2 items, not all of them.
        # Invalid pairs get +inf: a single ``d2 <= thr`` compare suffices
        # per threshold (thr ≥ 0).
        @pl.when(ti == tj)
        def _mask_diag():
            ri = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
            d2_ref[...] = jnp.where(ri < ci, d2_ref[...], jnp.inf)

        # one-hots built directly in their used orientations (no transposes)
        cls_row = jax.lax.broadcasted_iota(jnp.int32, (c_pad, tile), 0)
        oh_iT = jnp.where(labi_ref[...].T == cls_row, 1.0, 0.0).astype(jnp.bfloat16)  # (C, tile)
        cls_col = jax.lax.broadcasted_iota(jnp.int32, (tile, c_pad), 1)
        oh_j = jnp.where(labj_ref[...] == cls_col, 1.0, 0.0).astype(jnp.bfloat16)  # (tile, C)

        for k in range(gsize):
            r_id = gd * gsize + k
            thr = thr_s[r_id]

            # skip thresholds outside the item's boundary window: below
            # ``re`` every pair is farther than thr (all-false compare +
            # zero matmul would still cost a full VPU/MXU pass), at/past
            # ``rf`` the host adds the analytic full count instead
            @pl.when((r_id < rf) & (r_id >= re) & (thr >= 0.0))
            def _count():
                ind = jnp.where(d2_ref[...] <= thr, 1.0, 0.0).astype(jnp.bfloat16)
                # class-by-row reduction FIRST: (C, tile) @ (tile, tile) runs
                # the MXU with N=tile (full lanes) — the (tile, tile) @
                # (tile, C) order wastes 7/8 of the array on N=C
                u = jnp.dot(oh_iT, ind, preferred_element_type=jnp.float32)  # (C, tile), ≤ tile
                # digit-split second reduction: the MXU truncates inputs to
                # bf16, which cannot represent integers > 256 — u reaches
                # `tile`. Both digits are ≤ 256, hence bf16-exact.
                u_hi = jnp.floor(u * (1.0 / 256.0))
                u_lo = u - u_hi * 256.0
                cnt = (
                    jnp.dot(u_hi.astype(jnp.bfloat16), oh_j, preferred_element_type=jnp.float32) * 256.0
                    + jnp.dot(u_lo.astype(jnp.bfloat16), oh_j, preferred_element_type=jnp.float32)
                )  # (C, C), ≤ tile² < 2²⁴ — exact f32
                d1 = jnp.floor(cnt * (1.0 / 4096.0)).astype(jnp.int32)
                d0 = cnt.astype(jnp.int32) - d1 * 4096
                lo_new = lo_ref[0, k] + d0
                hi_ref[0, k] += d1 + (lo_new >> 12)
                lo_ref[0, k] = lo_new & 4095

    return kernel


@partial(jax.jit, static_argnames=("n_cls", "tile", "gsize", "n_groups", "interpret"))
def _pallas_call_chunked(
    coords_p: jax.Array,  # (n_pad, 2) f32
    labels_p: jax.Array,  # (n_pad, 1) int32, −1 padding
    ti: jax.Array, tj: jax.Array, rf: jax.Array, re: jax.Array, gid: jax.Array, first: jax.Array,  # (n_chunks, CHUNK)
    thr_all: jax.Array,  # (G*gsize,) f32, −1 padding
    n_cls: int, tile: int, gsize: int, n_groups: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    c_pad = max(8, -(-n_cls // 8) * 8)
    G = n_groups

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(CHUNK,),
        in_specs=[
            pl.BlockSpec((tile, 2), lambda g, ti_s, tj_s, rf_s, re_s, gid_s, first_s, thr_s: (ti_s[g], 0)),
            pl.BlockSpec((tile, 2), lambda g, ti_s, tj_s, rf_s, re_s, gid_s, first_s, thr_s: (tj_s[g], 0)),
            pl.BlockSpec((tile, 1), lambda g, ti_s, tj_s, rf_s, re_s, gid_s, first_s, thr_s: (ti_s[g], 0)),
            pl.BlockSpec((tile, 1), lambda g, ti_s, tj_s, rf_s, re_s, gid_s, first_s, thr_s: (tj_s[g], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, gsize, c_pad, c_pad), lambda g, ti_s, tj_s, rf_s, re_s, gid_s, first_s, thr_s: (gid_s[g], 0, 0, 0)),
            pl.BlockSpec((1, gsize, c_pad, c_pad), lambda g, ti_s, tj_s, rf_s, re_s, gid_s, first_s, thr_s: (gid_s[g], 0, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((tile, tile), jnp.float32)],
    )
    out_shape = [
        jax.ShapeDtypeStruct((G, gsize, c_pad, c_pad), jnp.int32),
        jax.ShapeDtypeStruct((G, gsize, c_pad, c_pad), jnp.int32),
    ]
    call = pl.pallas_call(
        _kernel_body(gsize, c_pad, tile),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )

    def step(acc, chunk_args):
        ti_k, tj_k, rf_k, re_k, gid_k, first_k = chunk_args
        hi, lo = call(ti_k, tj_k, rf_k, re_k, gid_k, first_k, thr_all, coords_p, coords_p, labels_p, labels_p)
        # per-call lo < 4096 (in-kernel carry) and hi ≤ CHUNK·257; int32 sums
        # stay exact while total items × 257 < 2³¹
        return (acc[0] + hi, acc[1] + lo), None

    acc0 = (jnp.zeros((G, gsize, c_pad, c_pad), jnp.int32),) * 2
    (hi, lo), _ = jax.lax.scan(step, acc0, (ti, tj, rf, re, gid, first))
    return hi, lo


def pallas_budget_ok(plan: BinnedPairPlan) -> bool:
    """True iff the plan's work-item count is inside the digit-carry
    exactness bound (~8M items incl. per-chunk group re-emissions); callers
    on the auto path fall back to the exact XLA engine when it isn't."""
    G = plan.thr_groups.shape[0]
    return (plan.n_items + G * (plan.n_items // (CHUNK - G) + 1)) <= 8_000_000


def binned_pair_counts_pallas(
    coords_s: np.ndarray,
    labels_s: np.ndarray,
    plan: BinnedPairPlan,
    n_cls: int,
    *,
    interpret: bool = False,
) -> np.ndarray:
    """Device boundary-block upper counts ``(L, C, C)`` float64 for a
    Morton-sorted input + plan (full-block analytic counts NOT included —
    combine with ``plan.full_cum`` like the XLA path)."""
    n = plan.n
    G, gsize = plan.thr_groups.shape
    if not pallas_budget_ok(plan):
        raise ValueError(
            "Pallas binned sweep digit carry is exact only below ~8M work "
            "items; re-plan with a larger tile."
        )
    coords_p = np.zeros((plan.n_pad, 2), np.float32)
    coords_p[:n] = coords_s[:, :2]
    labels_p = np.full((plan.n_pad, 1), -1, np.int32)
    labels_p[:n, 0] = labels_s
    ti, tj, rf, re, gid, first = pallas_item_chunks(plan)
    thr_all = np.full(G * gsize, -1.0, np.float32)
    flat = plan.thr_groups.ravel()
    thr_all[np.isfinite(flat)] = flat[np.isfinite(flat)]

    hi, lo = _pallas_call_chunked(
        jnp.asarray(coords_p), jnp.asarray(labels_p),
        jnp.asarray(ti), jnp.asarray(tj), jnp.asarray(rf), jnp.asarray(re),
        jnp.asarray(gid), jnp.asarray(first), jnp.asarray(thr_all),
        n_cls, plan.tile, gsize, G, interpret=interpret,
    )
    from squidpy_tpu.utils import to_host

    hi = to_host(hi).astype(np.float64)
    lo = to_host(lo).astype(np.float64)
    vals = hi * 4096.0 + lo  # (G, gsize, C_pad, C_pad)
    L = int(np.isfinite(plan.thr_groups).sum())
    upper = vals.reshape(G * gsize, vals.shape[-2], vals.shape[-1])[:L, :n_cls, :n_cls]
    return upper
