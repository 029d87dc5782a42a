"""Stitched-table collapse policy, ported concept-for-concept from the
reference's tests/experimental/test_stitched_labels.py (column policies, X
aggregation dtype rules, centroid semantics)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sps

from squidpy_tpu._core.anndata import AnnData
from squidpy_tpu.experimental import im as exp_im
from squidpy_tpu.experimental.im._stitched_labels import _aggregate_rows, _collapse_table


def _qc_table(n=6, groups=(1, 1, 3, 3, 5, 6), X=None):
    """Synthetic QC table: cells 1..n, pairs stitched per ``groups``."""
    obs = pd.DataFrame(
        {
            "label": np.arange(1, n + 1, dtype=np.int64),
            "stitch_group_id": np.asarray(groups, dtype=np.int64),
            "is_stitched": [g != l for g, l in zip(groups, range(1, n + 1))],
            "stitch_confidence": np.linspace(0.5, 1.0, n),
            "cut_score": np.linspace(0.0, 1.0, n),
            "area": np.arange(10, 10 * n + 10, 10, dtype=np.int64),
            "note": [f"c{i}" for i in range(n)],
        },
        index=pd.Index([f"cell_{i}" for i in range(1, n + 1)]),
    )
    if X is None:
        X = np.arange(n * 2, dtype=np.float64).reshape(n, 2)
    t = AnnData(X=X, obs=obs, var=pd.DataFrame(index=["s1", "s2"]))
    t.obsm["spatial"] = np.column_stack([np.arange(n, dtype=float), np.arange(n, dtype=float) * 10])
    return t


def _labels_for(n=6, size=60):
    labels = np.zeros((size, size), np.int32)
    per = size // n
    for i in range(n):
        labels[:, i * per : (i + 1) * per] = i + 1
    return labels


class TestCollapsePolicy:
    def test_one_row_per_group_including_unstitched(self):
        out = _collapse_table(_qc_table(), "sum", "label")
        assert list(out.obs["stitch_group_id"]) == [1, 3, 5, 6]
        assert list(out.obs_names) == ["group_1", "group_3", "group_5", "group_6"]

    def test_label_rewritten_to_group_id(self):
        out = _collapse_table(_qc_table(), "sum", "label")
        assert list(out.obs["label"]) == [1, 3, 5, 6]

    def test_invariant_columns_take_first(self):
        t = _qc_table()
        out = _collapse_table(t, "sum", "label")
        # stitch_confidence of group 1 is member 0's value, not a sum
        assert out.obs.loc["group_1", "stitch_confidence"] == t.obs["stitch_confidence"].iloc[0]

    def test_cut_score_keeps_worst_piece(self):
        t = _qc_table()
        out = _collapse_table(t, "sum", "label")
        want = t.obs.groupby("stitch_group_id")["cut_score"].max()
        np.testing.assert_allclose(out.obs["cut_score"].to_numpy(), want.to_numpy())

    def test_user_numeric_follows_strategy(self):
        t = _qc_table()
        out = _collapse_table(t, "sum", "label")
        assert out.obs.loc["group_1", "area"] == 10 + 20

    def test_non_numeric_takes_first(self):
        out = _collapse_table(_qc_table(), "sum", "label")
        assert out.obs.loc["group_1", "note"] == "c0"

    def test_spatial_centroid_is_mean_and_in_bounds(self):
        t = _qc_table()
        out = _collapse_table(t, "sum", "label")
        sp = out.obsm["spatial"]
        np.testing.assert_allclose(sp[0], [(0 + 1) / 2, (0 + 10) / 2])
        assert sp[:, 0].max() <= t.obsm["spatial"][:, 0].max()

    def test_var_preserved(self):
        out = _collapse_table(_qc_table(), "sum", "label")
        assert list(out.var_names) == ["s1", "s2"]

    def test_x_summed_per_group(self):
        t = _qc_table()
        out = _collapse_table(t, "sum", "label")
        np.testing.assert_allclose(np.asarray(out.X)[0], np.asarray(t.X)[:2].sum(axis=0))

    def test_unknown_strategy_raises(self):
        labels = _labels_for()
        with pytest.raises(ValueError, match="Unknown merge_strategy"):
            exp_im.make_stitched_labels(labels, _qc_table(), merge_strategy="bogus")


class TestXAggregationDtypes:
    def _groups(self, n=4):
        return [np.array([0, 1]), np.array([2]), np.array([3])]

    def test_integer_sum_no_overflow(self):
        X = np.full((4, 1), 60_000, dtype=np.uint16)
        out = _aggregate_rows(X, self._groups(), "sum")
        assert out.dtype == np.int64
        assert out[0, 0] == 120_000  # would wrap to 54464 in uint16

    def test_integer_mean_not_truncated(self):
        X = np.array([[1], [2], [5], [7]], dtype=np.int32)
        out = _aggregate_rows(X, self._groups(), "mean")
        assert np.issubdtype(out.dtype, np.floating)
        assert out[0, 0] == 1.5

    @pytest.mark.parametrize("strategy", ["min", "max", "first"])
    def test_range_preserving_keeps_int_dtype(self, strategy):
        X = np.array([[1], [2], [5], [7]], dtype=np.uint8)
        out = _aggregate_rows(X, self._groups(), strategy)
        assert out.dtype == np.uint8

    @pytest.mark.parametrize("strategy", ["sum", "mean", "max", "median", "first"])
    def test_sparse_matches_dense(self, strategy):
        rng = np.random.default_rng(0)
        X = rng.integers(0, 5, size=(4, 3)).astype(np.float64)
        X[X < 2] = 0
        dense = _aggregate_rows(X, self._groups(), strategy)
        sparse = _aggregate_rows(sps.csr_matrix(X), self._groups(), strategy)
        np.testing.assert_allclose(dense, sparse)

    def test_callable_applied_columnwise(self):
        X = np.array([[1.0, 10.0], [3.0, 30.0], [5.0, 50.0], [7.0, 70.0]])
        out = _aggregate_rows(X, self._groups(), lambda s: s.iloc[-1])
        np.testing.assert_allclose(out[0], [3.0, 30.0])


class TestEndToEnd:
    def test_make_stitched_labels_full_table(self):
        labels = _labels_for()
        t = _qc_table()
        res = exp_im.make_stitched_labels(labels, t, merge_strategy="mean")
        stitched, tab = res["labels"], res["table"]
        # pieces 2->1 and 4->3 rewritten in the image
        assert set(np.unique(stitched)) == {1, 3, 5, 6}
        assert tab.n_obs == 4
        # X aggregated with the same strategy
        np.testing.assert_allclose(np.asarray(tab.X)[0], np.asarray(t.X)[:2].mean(axis=0))

    def test_idempotent_on_collapsed_table(self):
        labels = _labels_for()
        res = exp_im.make_stitched_labels(labels, _qc_table())
        res2 = exp_im.make_stitched_labels(res["labels"], res["table"])
        np.testing.assert_array_equal(res2["labels"], res["labels"])
        assert res2["table"].n_obs == res["table"].n_obs
