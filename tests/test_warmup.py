"""squidpy_tpu.warmup — precompile helper and shape-bucketing audit."""

from __future__ import annotations

import numpy as np
import pytest

import squidpy_tpu as sq


class TestWarmup:
    def test_families_run_and_report(self):
        t = sq.warmup(
            500, n_genes=16, n_clusters=4, n_perms=16,
            families=["nhood", "moran"], verbose=False,
        )
        assert set(t) == {"graph", "nhood", "moran", "moran_perms"}
        assert all(v > 0 for v in t.values())

    def test_unknown_family_raises(self):
        with pytest.raises(ValueError, match="Unknown warmup"):
            sq.warmup(100, families=["bogus"])

    def test_graph_implied_by_stats(self):
        t = sq.warmup(200, n_genes=4, n_clusters=3, n_perms=8, families=["nhood"], verbose=False)
        assert "graph" in t

    def test_warm_second_call_is_faster_same_process(self):
        """The whole point: after warmup, an identical-shape public call
        skips tracing/compilation (same-process jit cache)."""
        import time

        sq.warmup(400, n_genes=8, n_clusters=4, n_perms=32, families=["nhood"], verbose=False)
        from squidpy_tpu.utils._warmup import _synthetic_adata

        adata = _synthetic_adata(400, 8, 4, seed=123)
        sq.gr.spatial_neighbors_knn(adata, n_neighs=6)
        t0 = time.perf_counter()
        sq.gr.nhood_enrichment(
            adata, cluster_key="cluster", n_perms=32, seed=5, copy=True, show_progress_bar=False
        )
        warm = time.perf_counter() - t0
        # generous bound: a compile would cost far more even on CPU
        assert warm < 10.0

    def test_ligrec_and_cooccur_families(self):
        t = sq.warmup(
            300, n_genes=24, n_clusters=3, n_perms=8, n_interactions=6,
            families=["ligrec", "cooccur"], verbose=False,
        )
        assert {"graph", "ligrec", "cooccur"} <= set(t)

    def test_niche_family(self):
        t = sq.warmup(
            300, n_genes=12, n_clusters=3, n_perms=8,
            families=["niche"], verbose=False,
        )
        assert {"graph", "niche_neighborhood", "niche_utag", "niche_cellcharter"} <= set(t)
