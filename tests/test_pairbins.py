"""Binned (dual-tree) pair sweeps vs the dense triangular oracle.

The spatially binned sweep (squidpy_tpu/ops/pairbins.py) must be
bitwise-identical to the dense kernel for every threshold: empty blocks
contribute zero, full blocks contribute the analytic class-count outer
product, boundary blocks are re-counted on device with the same f32 compare
the dense kernel uses."""

from __future__ import annotations

import numpy as np
import pytest

from squidpy_tpu.ops.cooccur import co_occurrence_counts
from squidpy_tpu.ops.pairbins import (
    binned_cooccur_counts,
    binned_ordered_pair_counts,
    morton_argsort,
    plan_binned_pairs,
)
from squidpy_tpu.ops.ripley import pair_counts_cumulative


def _clustered_points(rng, n, n_blobs=6, spread=3.0, extent=100.0):
    centers = rng.uniform(0, extent, size=(n_blobs, 2))
    which = rng.integers(0, n_blobs, size=n)
    return (centers[which] + rng.normal(0, spread, size=(n, 2))).astype(np.float32)


class TestMorton:
    def test_is_permutation(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 10, size=(500, 2))
        perm = morton_argsort(pts)
        assert sorted(perm) == list(range(500))

    def test_locality(self):
        # consecutive Morton ranks are spatially closer than random pairs
        rng = np.random.default_rng(1)
        pts = rng.uniform(0, 1, size=(4096, 2))
        s = pts[morton_argsort(pts)]
        step = np.linalg.norm(np.diff(s, axis=0), axis=1).mean()
        rand = np.linalg.norm(s[rng.permutation(4096)] - s, axis=1).mean()
        assert step < rand / 5

    def test_3d(self):
        rng = np.random.default_rng(2)
        pts = rng.uniform(0, 1, size=(300, 3))
        perm = morton_argsort(pts)
        assert sorted(perm) == list(range(300))


class TestPlan:
    def test_classification_covers_all_pairs(self):
        """Every (block pair, threshold) is exactly one of empty / full /
        boundary: device items + full buckets + empties partition the work."""
        rng = np.random.default_rng(3)
        pts = _clustered_points(rng, 2000)
        labs = rng.integers(0, 4, size=2000).astype(np.int32)
        perm = morton_argsort(pts)
        pts, labs = pts[perm], labs[perm]
        thr = (np.linspace(2.0, 60.0, 12) ** 2).astype(np.float32)
        plan = plan_binned_pairs(pts, labs, thr, 4, tile=64, gsize=4)
        assert plan.n_items > 0
        # full blocks exist with clustered data + wide thresholds
        assert plan.full_cum[-1].sum() > 0
        # items stay within the group table
        assert plan.gid[: plan.n_items].max() < plan.thr_groups.shape[0]
        assert (plan.ti[plan.n_items :] == -1).all()

    def test_full_blocks_need_no_device_work_when_all_inside(self):
        """Two far blobs, one huge threshold: cross-blob blocks classify full;
        the analytic count equals the exact cross pair count."""
        rng = np.random.default_rng(4)
        a = rng.normal(0, 0.5, size=(64, 2)) + [0, 0]
        b = rng.normal(0, 0.5, size=(64, 2)) + [1000, 0]
        pts = np.concatenate([a, b]).astype(np.float32)
        labs = np.concatenate([np.zeros(64), np.ones(64)]).astype(np.int32)
        thr = np.array([2000.0**2], dtype=np.float32)
        counts = binned_cooccur_counts(pts, labs, thr, 2, tile=64, gsize=1)
        # ordered cross pairs = 64*64 each way; within-blob = 64*63
        assert counts[0, 1, 0] == 64 * 64
        assert counts[1, 0, 0] == 64 * 64
        assert counts[0, 0, 0] == 64 * 63


class TestTreeEnumeration:
    """The KDTree near-pair enumeration must produce the IDENTICAL plan to
    the exhaustive triu sweep: every omitted pair is provably empty at all
    thresholds (dmin > max threshold), so the work list, threshold windows,
    and analytic full-block counts are all bitwise equal."""

    @pytest.mark.parametrize("seed,tile", [(12, 8), (13, 16), (14, 8)])
    def test_plan_identical_clustered(self, seed, tile):
        # clustered data is the regression scenario: Morton order leaves a
        # few huge gap-spanning tiles whose balls discover pairs in either
        # orientation — the original `src < dst` pre-canonicalization filter
        # dropped pairs whose fatter endpoint had the larger index
        rng = np.random.default_rng(seed)
        n = 4000
        pts = _clustered_points(rng, n, n_blobs=12, spread=1.5, extent=400.0)
        labs = rng.integers(0, 4, size=n).astype(np.int32)
        perm = morton_argsort(pts)
        pts, labs = np.ascontiguousarray(pts[perm]), np.ascontiguousarray(labs[perm])
        thr = (np.linspace(0.5, 12.0, 9) ** 2).astype(np.float32)
        ref = plan_binned_pairs(pts, labs, thr, 4, tile=tile, gsize=4, pair_enum="triu")
        got = plan_binned_pairs(pts, labs, thr, 4, tile=tile, gsize=4, pair_enum="tree")
        # the tree path must actually have pruned, or this test is vacuous
        assert got.n_pairs_total < ref.n_pairs_total
        assert got.n_items == ref.n_items
        for field in ("ti", "tj", "rfull", "rempty", "gid", "thr_groups", "offsets"):
            np.testing.assert_array_equal(getattr(got, field), getattr(ref, field))
        np.testing.assert_array_equal(got.full_cum, ref.full_cum)

    def test_plan_identical_uniform(self):
        rng = np.random.default_rng(15)
        n = 5000
        pts = rng.uniform(0, 300, size=(n, 2)).astype(np.float32)
        labs = rng.integers(0, 3, size=n).astype(np.int32)
        perm = morton_argsort(pts)
        pts, labs = np.ascontiguousarray(pts[perm]), np.ascontiguousarray(labs[perm])
        thr = (np.linspace(1.0, 20.0, 7) ** 2).astype(np.float32)
        ref = plan_binned_pairs(pts, labs, thr, 3, tile=16, gsize=4, pair_enum="triu")
        got = plan_binned_pairs(pts, labs, thr, 3, tile=16, gsize=4, pair_enum="tree")
        assert got.n_pairs_total < ref.n_pairs_total
        for field in ("ti", "tj", "rfull", "rempty", "gid"):
            np.testing.assert_array_equal(getattr(got, field), getattr(ref, field))
        np.testing.assert_array_equal(got.full_cum, ref.full_cum)

    def test_end_to_end_counts_vs_dense(self):
        """Tree-enumerated binned counts == dense oracle (and therefore the
        label-independent total at the max threshold matches too)."""
        rng = np.random.default_rng(16)
        n = 3000
        pts = _clustered_points(rng, n, n_blobs=10, spread=2.0, extent=300.0)
        labs = rng.integers(0, 5, size=n).astype(np.int32)
        thr = (np.linspace(0.5, 15.0, 11) ** 2).astype(np.float32)
        want = co_occurrence_counts(pts, labs, thr, 5, method="dense")
        got = binned_cooccur_counts(pts, labs, thr, 5, tile=16, gsize=4, pair_enum="tree")
        np.testing.assert_array_equal(got, want)

    def test_bad_enum_raises(self):
        rng = np.random.default_rng(17)
        pts = rng.uniform(0, 10, size=(100, 2)).astype(np.float32)
        with pytest.raises(ValueError, match="pair enumeration"):
            plan_binned_pairs(
                pts, np.zeros(100, np.int32), np.array([1.0], np.float32), 1,
                tile=16, pair_enum="nope",
            )


class TestBinnedParity:
    @pytest.mark.parametrize("tile,gsize", [(64, 3), (128, 8), (256, 5)])
    def test_bitwise_vs_dense(self, tile, gsize):
        rng = np.random.default_rng(5)
        n = 3000
        pts = _clustered_points(rng, n)
        labs = rng.integers(0, 5, size=n).astype(np.int32)
        thr = (np.linspace(0.5, 80.0, 17) ** 2).astype(np.float32)
        want = co_occurrence_counts(pts, labs, thr, 5, method="dense")
        got = binned_cooccur_counts(pts, labs, thr, 5, tile=tile, gsize=gsize)
        np.testing.assert_array_equal(got, want)

    def test_uniform_points_parity(self):
        rng = np.random.default_rng(6)
        n = 2500
        pts = rng.uniform(0, 50, size=(n, 2)).astype(np.float32)
        labs = rng.integers(0, 3, size=n).astype(np.int32)
        thr = (np.linspace(1.0, 40.0, 9) ** 2).astype(np.float32)
        want = co_occurrence_counts(pts, labs, thr, 3, method="dense")
        got = binned_cooccur_counts(pts, labs, thr, 3, tile=128, gsize=4)
        np.testing.assert_array_equal(got, want)

    def test_threshold_zero_and_duplicates(self):
        rng = np.random.default_rng(7)
        pts = np.repeat(rng.uniform(0, 10, size=(40, 2)), 3, axis=0).astype(np.float32)
        labs = rng.integers(0, 2, size=120).astype(np.int32)
        thr = np.array([0.0, 1.0, 1.0, 25.0], dtype=np.float32)
        want = co_occurrence_counts(pts, labs, thr, 2, method="dense")
        got = binned_cooccur_counts(pts, labs, thr, 2, tile=32, gsize=2)
        np.testing.assert_array_equal(got, want)

    def test_method_dispatch(self):
        rng = np.random.default_rng(8)
        pts = rng.uniform(0, 10, size=(400, 2)).astype(np.float32)
        labs = rng.integers(0, 3, size=400).astype(np.int32)
        thr = (np.linspace(1.0, 8.0, 5) ** 2).astype(np.float32)
        a = co_occurrence_counts(pts, labs, thr, 3, method="binned")
        b = co_occurrence_counts(pts, labs, thr, 3, method="dense")
        np.testing.assert_array_equal(a, b)
        with pytest.raises(ValueError, match="method"):
            co_occurrence_counts(pts, labs, thr, 3, method="nope")

    def test_3d_parity_vs_dense(self):
        """3D coords must route to the dim-general XLA engine, never the
        2D-only Pallas kernel, and match the dense oracle."""
        rng = np.random.default_rng(9)
        n = 2000
        pts = rng.uniform(0, 30, size=(n, 3)).astype(np.float32)
        labs = rng.integers(0, 4, size=n).astype(np.int32)
        thr = (np.linspace(1.0, 25.0, 11) ** 2).astype(np.float32)
        want = co_occurrence_counts(pts, labs, thr, 4, method="dense")
        got = binned_cooccur_counts(pts, labs, thr, 4, tile=128, gsize=4)
        np.testing.assert_array_equal(got, want)

    def test_3d_pallas_engine_raises(self):
        rng = np.random.default_rng(10)
        pts = rng.uniform(0, 10, size=(300, 3)).astype(np.float32)
        labs = rng.integers(0, 2, size=300).astype(np.int32)
        thr = np.array([1.0, 4.0], dtype=np.float32)
        with pytest.raises(ValueError, match="2D"):
            binned_cooccur_counts(pts, labs, thr, 2, engine="pallas")

    def test_auto_engine_over_budget_falls_back(self, monkeypatch):
        """Plans past the Pallas digit-carry bound degrade to XLA on the
        auto path instead of raising."""
        import squidpy_tpu.ops.pairbins as pb
        from squidpy_tpu.ops import pallas_binned

        monkeypatch.setattr(pb, "_pallas_engine_available", lambda: True)
        monkeypatch.setattr(pallas_binned, "pallas_budget_ok", lambda plan: False)
        calls = {"pallas": 0}

        def boom(*a, **k):
            calls["pallas"] += 1
            raise AssertionError("Pallas engine must not run over budget")

        monkeypatch.setattr(pallas_binned, "binned_pair_counts_pallas", boom)
        rng = np.random.default_rng(11)
        pts = rng.uniform(0, 10, size=(500, 2)).astype(np.float32)
        labs = rng.integers(0, 3, size=500).astype(np.int32)
        thr = (np.linspace(1.0, 8.0, 5) ** 2).astype(np.float32)
        want = co_occurrence_counts(pts, labs, thr, 3, method="dense")
        got = binned_cooccur_counts(pts, labs, thr, 3, tile=64, engine="auto")
        np.testing.assert_array_equal(got, want)
        assert calls["pallas"] == 0


class TestRipleyBinned:
    def test_ordered_counts_parity(self):
        rng = np.random.default_rng(9)
        pts = _clustered_points(rng, 1500)
        support = np.linspace(0, 60.0, 12)
        want = pair_counts_cumulative(pts, support, method="dense")
        got = binned_ordered_pair_counts(pts, support, tile=64, gsize=4)
        np.testing.assert_array_equal(got, want)

    def test_method_dispatch(self):
        rng = np.random.default_rng(10)
        pts = rng.uniform(0, 20, size=(500, 2))
        support = np.linspace(0, 15.0, 8)
        a = pair_counts_cumulative(pts, support, method="binned")
        b = pair_counts_cumulative(pts, support, method="dense")
        np.testing.assert_array_equal(a, b)


class TestShardingInvariance:
    def test_binned_counts_device_count_invariant(self):
        """Item-sharded digits psum to the same bits as single-device."""
        from squidpy_tpu.ops.pairbins import _combine_binned
        from squidpy_tpu.parallel.mesh import default_mesh
        from squidpy_tpu.parallel.sharded import (
            auto_binned_pair_counts,
            sharded_binned_pair_counts,
        )

        rng = np.random.default_rng(11)
        n = 1200
        pts = _clustered_points(rng, n)
        labs = rng.integers(0, 4, size=n).astype(np.int32)
        thr = (np.linspace(1.0, 50.0, 10) ** 2).astype(np.float32)
        perm = morton_argsort(pts)
        pts_s = np.ascontiguousarray(pts[perm])
        labs_s = np.ascontiguousarray(labs[perm])
        plan = plan_binned_pairs(pts_s, labs_s, thr, 4, tile=64, gsize=4)

        full = auto_binned_pair_counts(pts_s, labs_s, plan, 4)
        ref = _combine_binned(np.asarray(full), plan, 10, 4)
        for n_dev in (1, 2, 8):
            mesh = default_mesh(n_dev, axis_name="pairs")
            d = sharded_binned_pair_counts(mesh, pts_s, labs_s, plan, 4)
            got = _combine_binned(np.asarray(d), plan, 10, 4)
            np.testing.assert_array_equal(got, ref)
