"""Device k-hop ring / reach adjacency expansion.

The reference's cellcharter flavor builds exact k-hop "ring" adjacencies on
host with scipy spgemm (`/root/reference/src/squidpy/gr/_niche.py:667-690`:
``adj_hop = adj_hop @ adj; adj_hop = adj_hop > adj_visited; adj_visited +=
adj_hop``), and the neighborhood flavor uses the *pattern* of ``A^k``
(`gr/_niche.py:440-452` — its profile counter adds 1 per stored entry, so
values are irrelevant). At 1M cells the host pipeline costs minutes: the
hop-3 spgemm alone is ~16 s, the sparse ``>``/``+`` passes ~40 s, and
shipping the resulting 40M-nnz ELL through the ~25 MB/s tunnel another
~50 s (measured, see BASELINE.md).

This kernel keeps the whole expansion in HBM. Per hop and per row block it

1. expands candidates with one row gather: ``cand = base_idx[ring_idx]``
   (path weights ``ring_w * base_w`` ride along),
2. sorts each row's (candidate ++ visited) triple ``(index, weight,
   visited-value)`` with one `lax.sort`,
3. reduces equal-index runs with two cumulative sums (run sums read off at
   run *tails*; the previous tail's prefix is recovered with a shifted
   `cummax`, valid because the prefixes are non-decreasing),
4. applies the reference's exact ring rule ``sum(path weights) >
   sum(visited values)`` at every tail (missing visited entry == 0, so the
   quirky artifacts — e.g. self-loops entering ring-2 whenever a node has
   ≥2 two-cycles — are reproduced bit-for-bit on binary graphs),
5. compacts surviving entries to a bucketed-width padded ELL with a second
   (flag, index) sort, and updates the visited ELL the same way.

Widths are data dependent, so each hop runs twice: a degree pass, a scalar
max readback to pick the output bucket, then the emit pass. Both passes are
`lax.map`-chunked over rows, so peak memory is one row block regardless of
``n``. Only per-hop scalar maxima cross the tunnel.

Float note: path counts are summed in f32 — exact for binary graphs (counts
≤ 2^24) and for the visited ``+1`` marks. For *weighted* connectivities the
``>`` comparison can differ from scipy's f64 at exact ties; parity tests use
margins away from ties.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy import sparse as sps

__all__ = ["ell_sentinel", "hop_rings", "hop_reach"]

_WIDTH_BUCKETS = (4, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024)


def _bucket(v: int) -> int:
    for b in _WIDTH_BUCKETS:
        if b >= v:
            return b
    return int(v)


def ell_sentinel(adj: sps.spmatrix, *, drop_diag: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """CSR → padded ELL with sentinel index ``n`` (weight 0) in empty slots."""
    adj = sps.csr_matrix(adj)
    n = adj.shape[0]
    indices, data = adj.indices, adj.data
    rows = np.repeat(np.arange(n), np.diff(adj.indptr))
    if drop_diag:
        keep = indices != rows
        rows, indices, data = rows[keep], indices[keep], data[keep]
    deg = np.bincount(rows, minlength=n)
    k = _bucket(max(int(deg.max()) if n else 1, 1))
    idx = np.full((n, k), n, dtype=np.int32)
    w = np.zeros((n, k), dtype=np.float32)
    starts = np.concatenate([[0], np.cumsum(deg)[:-1]])
    slot = np.arange(len(indices)) - starts[rows]
    idx[rows, slot] = indices
    w[rows, slot] = data
    return idx, w


def _run_tails(m_idx, m_w, m_v, n):
    """Run sums of ``m_w``/``m_v`` over equal-index runs, read at run tails."""
    cw = jnp.cumsum(m_w, axis=1)
    cv = jnp.cumsum(m_v, axis=1)
    nxt = jnp.concatenate([m_idx[:, 1:], jnp.full((m_idx.shape[0], 1), -1, m_idx.dtype)], axis=1)
    tail = m_idx != nxt
    # prefix at the previous tail: shifted cummax works because cw/cv are
    # non-decreasing (all weights/values are >= 0)
    pcw = jax.lax.cummax(jnp.where(tail, cw, 0.0), axis=1)
    pcv = jax.lax.cummax(jnp.where(tail, cv, 0.0), axis=1)
    zero = jnp.zeros((m_idx.shape[0], 1), cw.dtype)
    run_w = cw - jnp.concatenate([zero, pcw[:, :-1]], axis=1)
    run_v = cv - jnp.concatenate([zero, pcv[:, :-1]], axis=1)
    is_entry = tail & (m_idx < n)
    return run_w, run_v, is_entry


def _merge(base_idx, base_w, ring_idx, ring_w, vis_idx, vis_val, n):
    """Expand one row block by one hop and sort-merge with its visited ELL."""
    c = ring_idx.shape[0]
    safe = jnp.minimum(ring_idx, n - 1)
    g_idx = base_idx[safe]  # (c, R, k1)
    g_w = base_w[safe]
    valid = (ring_idx[:, :, None] < n) & (g_idx < n)
    cand_idx = jnp.where(valid, g_idx, n).reshape(c, -1)
    cand_w = jnp.where(valid, ring_w[:, :, None] * g_w, 0.0).reshape(c, -1)
    if vis_idx is None:
        m_idx, m_w = jax.lax.sort((cand_idx, cand_w), dimension=1, num_keys=1)
        m_v = jnp.zeros_like(m_w)
    else:
        m_idx = jnp.concatenate([cand_idx, vis_idx], axis=1)
        m_w = jnp.concatenate([cand_w, jnp.zeros_like(vis_val)], axis=1)
        m_v = jnp.concatenate([jnp.zeros_like(cand_w), vis_val], axis=1)
        m_idx, m_w, m_v = jax.lax.sort((m_idx, m_w, m_v), dimension=1, num_keys=1)
    return m_idx, m_w, m_v


def _compact(flag_keep, m_idx, width, deg, n, values=None):
    """Stable (drop-flag, index) sort → first ``width`` surviving entries."""
    drop = jnp.where(flag_keep, 0, 1).astype(jnp.int32)
    ops = (drop, m_idx) if values is None else (drop, m_idx, values)
    out = jax.lax.sort(ops, dimension=1, num_keys=2)
    live = jnp.arange(width)[None, :] < deg[:, None]
    idx_out = jnp.where(live, out[1][:, :width], n)
    if values is None:
        return idx_out
    return idx_out, jnp.where(live, out[2][:, :width], 0.0)


def _chunk_rows(n: int, width: int) -> int:
    c = max(4096, min(65536, (1 << 24) // max(width, 1)))
    c = 1 << (c.bit_length() - 1)  # power of two for tidy reshapes
    n_pow2 = 1 << max(n - 1, 1).bit_length()
    return min(c, n_pow2)


def _pad_rows(a, n_pad, fill):
    if a.shape[0] == n_pad:
        return a
    pad = jnp.full((n_pad - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return jnp.concatenate([a, pad], axis=0)


@partial(jax.jit, static_argnames=("n", "chunk", "use_visited"))
def _deg_pass(base_idx, base_w, ring_idx, ring_w, vis_idx, vis_val, *, n, chunk, use_visited):
    n_rows = ring_idx.shape[0]

    def step(args):
        r_idx, r_w, v_idx, v_val = args
        m_idx, m_w, m_v = _merge(base_idx, base_w, r_idx, r_w, v_idx if use_visited else None, v_val, n)
        run_w, run_v, is_entry = _run_tails(m_idx, m_w, m_v, n)
        ring_keep = is_entry & (run_w > run_v)
        vis_keep = is_entry & ((run_v > 0) | ring_keep)
        return jnp.sum(ring_keep, axis=1), jnp.sum(vis_keep, axis=1)

    sh = lambda a: a.reshape(n_rows // chunk, chunk, *a.shape[1:])
    rd, vd = jax.lax.map(step, (sh(ring_idx), sh(ring_w), sh(vis_idx), sh(vis_val)))
    return rd.reshape(n_rows), vd.reshape(n_rows)


@partial(jax.jit, static_argnames=("n", "chunk", "w_out", "v_out", "use_visited"))
def _emit_pass(base_idx, base_w, ring_idx, ring_w, vis_idx, vis_val, *, n, chunk, w_out, v_out, use_visited):
    n_rows = ring_idx.shape[0]

    def step(args):
        r_idx, r_w, v_idx, v_val = args
        m_idx, m_w, m_v = _merge(base_idx, base_w, r_idx, r_w, v_idx if use_visited else None, v_val, n)
        run_w, run_v, is_entry = _run_tails(m_idx, m_w, m_v, n)
        ring_keep = is_entry & (run_w > run_v)
        r_deg = jnp.sum(ring_keep, axis=1)
        r_out = _compact(ring_keep, m_idx, w_out, r_deg, n)
        if not use_visited:
            return r_out, r_deg, jnp.full((r_idx.shape[0], 1), n, r_out.dtype), jnp.zeros(
                (r_idx.shape[0], 1), m_w.dtype
            )
        vis_keep = is_entry & ((run_v > 0) | ring_keep)
        v_deg = jnp.sum(vis_keep, axis=1)
        new_val = run_v + ring_keep.astype(m_v.dtype)
        v_out_idx, v_out_val = _compact(vis_keep, m_idx, v_out, v_deg, n, values=new_val)
        return r_out, r_deg, v_out_idx, v_out_val

    sh = lambda a: a.reshape(n_rows // chunk, chunk, *a.shape[1:])
    r_out, r_deg, vi, vv = jax.lax.map(step, (sh(ring_idx), sh(ring_w), sh(vis_idx), sh(vis_val)))
    flat = lambda a: a.reshape(n_rows, *a.shape[2:])
    return flat(r_out), flat(r_deg), flat(vi), flat(vv)


def _expand_hops(base_idx, base_w, ring1_idx, ring1_w, distance, *, use_visited, n):
    """Shared driver: hop k=2..distance from ring-1, yielding (idx, deg)."""
    base_idx = jnp.asarray(base_idx, jnp.int32)
    base_w = jnp.asarray(base_w, jnp.float32)
    ring_idx = jnp.asarray(ring1_idx, jnp.int32)
    ring_w = jnp.asarray(ring1_w, jnp.float32)

    if use_visited:
        # visited = setdiag(A, 1): self entry (value 1) + off-diagonal base
        self_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
        off = jnp.where(base_idx == self_idx, n, base_idx)
        vis_idx = jnp.concatenate([self_idx, off], axis=1)
        vis_val = jnp.concatenate(
            [jnp.ones((n, 1), jnp.float32), jnp.where(off < n, base_w, 0.0)], axis=1
        )
    else:
        vis_idx = jnp.full((n, 1), n, jnp.int32)
        vis_val = jnp.zeros((n, 1), jnp.float32)

    hops = []
    for _ in range(2, distance + 1):
        width = ring_idx.shape[1] * base_idx.shape[1] + vis_idx.shape[1]
        chunk = _chunk_rows(n, width)
        n_pad = -(-n // chunk) * chunk
        args = (
            _pad_rows(ring_idx, n_pad, n),
            _pad_rows(ring_w, n_pad, 0.0),
            _pad_rows(vis_idx, n_pad, n),
            _pad_rows(vis_val, n_pad, 0.0),
        )
        r_deg, v_deg = _deg_pass(base_idx, base_w, *args, n=n, chunk=chunk, use_visited=use_visited)
        w_out = _bucket(max(int(jnp.max(r_deg[:n])), 1))
        v_out = _bucket(max(int(jnp.max(v_deg[:n])), 1)) if use_visited else 1
        r_idx, r_deg, vis_idx, vis_val = _emit_pass(
            base_idx, base_w, *args, n=n, chunk=chunk, w_out=w_out, v_out=v_out, use_visited=use_visited
        )
        ring_idx, r_deg = r_idx[:n], r_deg[:n]
        vis_idx, vis_val = vis_idx[:n], vis_val[:n]
        ring_w = (ring_idx < n).astype(jnp.float32)
        hops.append((ring_idx, r_deg))
    return hops


def hop_rings(base_idx, base_w, distance: int):
    """Exact reference ``_hop`` rings for k = 2..distance.

    ``base_idx``/``base_w``: sentinel-padded ELL of the *original* adjacency
    (diagonal included if present). Ring-1 is the diagonal-zeroed base (the
    caller already has it). Returns ``[(idx, deg), ...]`` — boolean rings:
    normalized SpMV weights are ``(idx < n) / deg``.
    """
    n = base_idx.shape[0]
    self_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    r1_idx = jnp.where(jnp.asarray(base_idx) == self_idx, n, jnp.asarray(base_idx, jnp.int32))
    r1_w = jnp.where(r1_idx < n, jnp.asarray(base_w, jnp.float32), 0.0)
    return _expand_hops(base_idx, base_w, r1_idx, r1_w, distance, use_visited=True, n=n)


def hop_reach(base_idx, base_w, distance: int):
    """Patterns of ``A^k`` for k = 2..distance (neighborhood flavor).

    Returns ``[(idx, deg), ...]``; entries are the stored-entry sets of the
    host ``hop_adj = hop_adj @ adj`` chain (values irrelevant — the
    reference's profile counter binarizes, gr/_niche.py:440-452).
    """
    n = base_idx.shape[0]
    r1_idx = jnp.asarray(base_idx, jnp.int32)
    r1_w = (r1_idx < n).astype(jnp.float32)
    return _expand_hops(base_idx, base_w, r1_idx, r1_w, distance, use_visited=False, n=n)
