"""Fused Pallas binned-sweep kernel, exercised in interpret mode on CPU.

The real-TPU (Mosaic) path is validated on-chip (exact f64 match at 3k and
1M cells, BASELINE.md); these tests guard the kernel's logic — chunking,
group dummies, window skipping, digit carries — against regressions in CI.
"""

from __future__ import annotations

import numpy as np
import pytest

from squidpy_tpu.ops.cooccur import co_occurrence_counts
from squidpy_tpu.ops.pairbins import morton_argsort, plan_binned_pairs
from squidpy_tpu.ops.pallas_binned import (
    CHUNK,
    binned_pair_counts_pallas,
    pallas_item_chunks,
)


def _fixture(n=2000, seed=5, n_blobs=6, n_cls=5):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0, 100, size=(n_blobs, 2))
    pts = (centers[rng.integers(0, n_blobs, n)] + rng.normal(0, 3, (n, 2))).astype(np.float32)
    labs = rng.integers(0, n_cls, n).astype(np.int32)
    return pts, labs


def _pallas_counts(pts, labs, thr, n_cls, tile, gsize):
    perm = morton_argsort(pts)
    pts_s = np.ascontiguousarray(pts[perm])
    labs_s = np.ascontiguousarray(labs[perm])
    plan = plan_binned_pairs(pts_s, labs_s, thr, n_cls, tile=tile, gsize=gsize)
    upper = binned_pair_counts_pallas(pts_s, labs_s, plan, n_cls, interpret=True)
    total = upper + plan.full_cum
    return np.transpose(total + np.swapaxes(total, 1, 2), (1, 2, 0)), plan


class TestPallasBinnedInterpret:
    @pytest.mark.parametrize("tile,gsize", [(64, 4), (128, 8)])
    def test_exact_vs_dense(self, tile, gsize):
        pts, labs = _fixture()
        thr = (np.linspace(0.5, 80.0, 17) ** 2).astype(np.float32)
        got, _ = _pallas_counts(pts, labs, thr, 5, tile, gsize)
        want = co_occurrence_counts(pts, labs, thr, 5, method="dense")
        np.testing.assert_array_equal(got, want)

    def test_single_class(self):
        pts, labs = _fixture(n=800)
        thr = (np.linspace(1.0, 60.0, 7) ** 2).astype(np.float32)
        got, _ = _pallas_counts(pts, np.zeros_like(labs), thr, 1, 64, 4)
        want = co_occurrence_counts(pts, np.zeros_like(labs), thr, 1, method="dense")
        np.testing.assert_array_equal(got, want)

    def test_item_chunk_invariants(self):
        pts, labs = _fixture(n=3000)
        thr = (np.linspace(0.5, 80.0, 17) ** 2).astype(np.float32)
        perm = morton_argsort(pts)
        plan = plan_binned_pairs(pts[perm], labs[perm], thr, 5, tile=64, gsize=4)
        ti, tj, rf, re, gid, first = pallas_item_chunks(plan)
        G = plan.thr_groups.shape[0]
        assert ti.shape[1] == CHUNK
        for c in range(ti.shape[0]):
            # gid monotone: every output block visited in one consecutive run
            assert (np.diff(gid[c]) >= 0).all()
            # exactly one zero-initializing dummy per group per chunk
            fg = sorted(gid[c][first[c] == 1])
            assert fg == list(range(G))
            # dummies never count (rfull=0 masks every threshold)
            assert (rf[c][first[c] == 1] == 0).all()
