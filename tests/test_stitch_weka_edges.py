"""Edge-case coverage for the stitch scorer internals and the weka tissue
feature stack — the round-2 thin spots named in VERDICT (reference anchors:
/root/reference/src/squidpy/experimental/tl/_tiling_stitch.py:258-919 and
/root/reference/src/squidpy/experimental/im/_detect_tissue.py:626-760)."""

from __future__ import annotations

import numpy as np
import pytest

from squidpy_tpu.experimental.tl import _tiling_stitch as ts


class TestChordOnLine:
    def test_dense_run_detected(self):
        line = np.zeros(20, bool)
        line[3:15] = True
        lo, hi = ts._chord_on_line(line, offset=10.0, min_coverage=0.5)
        assert (lo, hi) == (13.0, 24.0)

    def test_sparse_grazing_rejected(self):
        # a curved cell grazes its bbox at isolated points
        line = np.zeros(30, bool)
        line[[2, 15, 28]] = True
        assert ts._chord_on_line(line, 0.0, min_coverage=0.5) is None

    def test_too_few_pixels_rejected(self):
        line = np.zeros(10, bool)
        line[[4, 5]] = True
        assert ts._chord_on_line(line, 0.0, 0.5) is None


class TestExtractCutEdges:
    def _half_disks(self):
        """A disk split across a horizontal seam at y=50 into labels 1/2."""
        labels = np.zeros((100, 100), np.int32)
        yy, xx = np.mgrid[:100, :100]
        disk = (yy - 50) ** 2 + (xx - 50) ** 2 <= 20**2
        labels[disk & (yy < 50)] = 1
        labels[disk & (yy >= 50)] = 2
        return labels

    @staticmethod
    def _bboxes(labels):
        from scipy import ndimage as ndi

        out = {}
        for lid in np.unique(labels):
            if lid == 0:
                continue
            sl = ndi.find_objects((labels == lid).astype(np.int32))[0]
            out[int(lid)] = (sl[0].start, sl[1].start, sl[0].stop, sl[1].stop)
        return out

    def test_cut_chords_found_on_facing_sides(self):
        labels = self._half_disks()
        edges, crops = ts._extract_cut_edges(
            labels, [1, 2], self._bboxes(labels), ts.StitchParams()
        )
        by_cell = {e.cell: e for e in edges}
        assert set(by_cell) == {1, 2}
        assert by_cell[1].axis == "h" and by_cell[2].axis == "h"
        # both chords sit on the same cut line, facing each other
        assert by_cell[1].coord == by_cell[2].coord
        assert by_cell[1].normal == -1 and by_cell[2].normal == 1
        assert set(crops) == {1, 2}

    def test_uncut_disk_yields_no_edges(self):
        labels = np.zeros((80, 80), np.int32)
        yy, xx = np.mgrid[:80, :80]
        labels[(yy - 40) ** 2 + (xx - 40) ** 2 <= 15**2] = 1
        edges, _ = ts._extract_cut_edges(labels, [1], self._bboxes(labels), ts.StitchParams())
        assert edges == []

    def test_min_edge_length_filters_short_chords(self):
        labels = self._half_disks()
        params = ts.StitchParams(min_edge_length=1000.0)
        edges, _ = ts._extract_cut_edges(labels, [1, 2], self._bboxes(labels), params)
        assert edges == []


class TestDeferredShapeFeatures:
    """The scorer defers the two expensive shape features until the cheap
    geometry features prove the pair could still clear the bar."""

    def _facing_edges(self, gap: float, overlap: float = 1.0):
        e = ts._CutEdge(cell=1, axis="h", coord=49.5, lo=30.0, hi=70.0, normal=-1)
        hi_c = 30.0 + overlap * 40.0
        c = ts._CutEdge(cell=2, axis="h", coord=49.5 + gap, lo=30.0, hi=hi_c, normal=1)
        return e, c

    def test_merge_shape_skipped_when_geometry_hopeless(self, monkeypatch):
        calls = {"n": 0}
        orig = ts._merge_shape

        def spy(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(ts, "_merge_shape", spy)
        # tiny chord overlap: best-case score with perfect shape features
        # still cannot reach min_confidence=0.95
        e, c = self._facing_edges(gap=0.0, overlap=0.25)
        params = ts.StitchParams(min_confidence=0.95, candidate_min_iou=0.0)
        crops = {1: np.ones((20, 40), bool), 2: np.ones((20, 40), bool)}
        bboxes = {1: (30, 30, 50, 70), 2: (50, 30, 70, 70)}
        ts._score_pairs([e, c], bboxes, crops, params, (100, 100))
        assert calls["n"] == 0

    def test_merge_shape_runs_for_viable_pairs(self, monkeypatch):
        calls = {"n": 0}
        orig = ts._merge_shape

        def spy(*a, **k):
            calls["n"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(ts, "_merge_shape", spy)
        e, c = self._facing_edges(gap=0.0, overlap=1.0)
        params = ts.StitchParams(min_confidence=0.5)
        crops = {1: np.ones((20, 40), bool), 2: np.ones((20, 40), bool)}
        bboxes = {1: (30, 30, 50, 70), 2: (50, 30, 70, 70)}
        pairs = ts._score_pairs([e, c], bboxes, crops, params, (100, 100))
        assert calls["n"] == 1
        assert len(pairs) == 1 and pairs[0].confidence > 0.5

    def test_score_is_flat_mean_of_five(self):
        feats = dict.fromkeys(ts._SCORE_FEATURES, 0.0)
        feats["iou"] = 1.0
        assert ts._score(feats) == pytest.approx(0.2)


class TestGroupGeometry:
    def _pair(self, axis, coord_a, coord_b, lo=0.0, hi=10.0):
        ea = ts._CutEdge(1, axis, coord_a, lo, hi, -1)
        eb = ts._CutEdge(2, axis, coord_b, lo, hi, 1)
        return ts._Pair(1, 2, axis, 0.9, {}, ea, eb)

    def test_same_axis_chain_needs_distinct_seams(self):
        near = [self._pair("h", 49.5, 49.5), self._pair("h", 50.0, 50.0)]
        assert not ts._group_geometry_ok(near, size=3, max_gap=3.0)
        far = [self._pair("h", 49.5, 49.5), self._pair("h", 80.5, 80.5)]
        assert ts._group_geometry_ok(far, size=3, max_gap=3.0)

    def test_two_piece_groups_always_ok(self):
        pairs = [self._pair("h", 49.5, 49.5)]
        assert ts._group_geometry_ok(pairs, size=2, max_gap=3.0)

    def test_four_group_corner_junction(self):
        # chords ending at the (50, 50) junction: accepted
        h = ts._Pair(1, 2, "h", 0.9, {},
                     ts._CutEdge(1, "h", 49.5, 30.0, 50.0, -1),
                     ts._CutEdge(2, "h", 49.5, 30.0, 50.0, 1))
        v = ts._Pair(3, 4, "v", 0.9, {},
                     ts._CutEdge(3, "v", 49.5, 30.0, 50.0, -1),
                     ts._CutEdge(4, "v", 49.5, 30.0, 50.0, 1))
        assert ts._group_geometry_ok([h, v], size=4, max_gap=3.0)
        # chords far from the junction: rejected
        v_far = ts._Pair(3, 4, "v", 0.9, {},
                         ts._CutEdge(3, "v", 49.5, 80.0, 95.0, -1),
                         ts._CutEdge(4, "v", 49.5, 80.0, 95.0, 1))
        assert not ts._group_geometry_ok([h, v_far], size=4, max_gap=3.0)


class TestStitchParamsValidation:
    @pytest.mark.parametrize(
        "kwargs,msg",
        [
            ({"min_confidence": 1.5}, "min_confidence"),
            ({"max_gap": -1.0}, "max_gap"),
            ({"max_group_size": 1}, "max_group_size"),
            ({"min_edge_coverage": 2.0}, "min_edge_coverage"),
            ({"min_edge_length": -3.0}, "min_edge_length"),
            ({"close_radius": -1}, "close_radius"),
        ],
    )
    def test_invalid(self, kwargs, msg):
        with pytest.raises(ValueError, match=msg):
            ts.StitchParams(**kwargs)


class TestWekaFeatureStack:
    def test_feature_count_with_and_without_edges(self):
        from squidpy_tpu.experimental.im._detect_tissue import _multiscale_pixel_features

        img = np.random.default_rng(0).random((32, 32)).astype(np.float32)
        sigmas = (1.0, 2.0, 4.0)
        with_edges = _multiscale_pixel_features(img, sigmas, edges=True)
        without = _multiscale_pixel_features(img, sigmas, edges=False)
        assert with_edges.shape == (32 * 32, 1 + 3 * len(sigmas))
        assert without.shape == (32 * 32, 1 + 2 * len(sigmas))

    def test_constant_image_derivative_channels_zero(self):
        from squidpy_tpu.experimental.im._detect_tissue import _multiscale_pixel_features

        img = np.full((24, 24), 0.7, np.float32)
        feats = _multiscale_pixel_features(img, (1.0, 2.0), edges=True)
        # per sigma: [smooth, laplacian, gradient]; laplacian + gradient ~ 0
        np.testing.assert_allclose(feats[:, 2], 0.0, atol=1e-5)  # laplacian s1
        np.testing.assert_allclose(feats[:, 3], 0.0, atol=1e-5)  # gradient s1
        np.testing.assert_allclose(feats[:, 1], 0.7, atol=1e-4)  # smooth s1

    def test_sigma_ladder_geometric(self):
        from squidpy_tpu.experimental.im._detect_tissue import WekaParams

        assert WekaParams(sigma_min=1.0, sigma_max=8.0).sigmas == (1.0, 2.0, 4.0, 8.0)
        assert WekaParams(sigma_min=2.0, sigma_max=3.0).sigmas == (2.0,)

    def test_weka_params_validation(self):
        from squidpy_tpu.experimental.im._detect_tissue import WekaParams

        with pytest.raises(ValueError, match="sigma"):
            WekaParams(sigma_min=0.0)
        with pytest.raises(ValueError, match="percentile"):
            WekaParams(pseudo_tissue_percentile=100.0)
        with pytest.raises(ValueError, match="rf_estimators"):
            WekaParams(rf_estimators=0)

    def test_pseudo_seed_fallback_takes_top_zscores(self):
        """Sparse tissue: fewer percentile seeds than pseudo_min_pixels ->
        the top-|z| fallback still yields a trainable seed set."""
        from squidpy_tpu.experimental.im._detect_tissue import (
            WekaParams,
            _segment_weka_mask,
        )

        rng = np.random.default_rng(0)
        img = np.full((64, 64), 0.9, np.float32) + rng.normal(0, 0.005, (64, 64)).astype(np.float32)
        img[28:36, 28:36] = 0.1  # tiny dark tissue patch (64 px)
        wp = WekaParams(pseudo_tissue_percentile=99.9, pseudo_min_pixels=100, rf_estimators=10)
        mask = _segment_weka_mask(img, wp, None)
        ys, xs = np.nonzero(mask)
        assert mask.any()
        # detected tissue concentrates on the dark patch
        assert (ys.mean() - 32) ** 2 + (xs.mean() - 32) ** 2 < 10**2

    def test_felzenszwalb_orientation_flips_with_background(self):
        """Bright-field (dark tissue on bright bg) and fluorescence (bright
        tissue on dark bg) both orient the mask toward the tissue."""
        from squidpy_tpu.experimental.im._detect_tissue import _segment_felzenszwalb_mask
        from squidpy_tpu.experimental.im._detect_tissue import FelzenszwalbParams

        base = np.full((80, 80), 0.9, np.float32)
        base[20:60, 20:60] = 0.2  # dark tissue
        fp = FelzenszwalbParams()
        m_bright_bg = _segment_felzenszwalb_mask(base, fp, None)
        assert m_bright_bg[40, 40] and not m_bright_bg[5, 5]

        inv = 1.0 - base  # bright tissue on dark bg
        m_dark_bg = _segment_felzenszwalb_mask(inv, fp, None)
        assert m_dark_bg[40, 40] and not m_dark_bg[5, 5]
