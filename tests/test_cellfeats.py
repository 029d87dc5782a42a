"""cp_measure-equivalent per-cell feature families (ops/cellfeats.py).

Every kernel is validated against literal analytically-known values on
synthetic fixtures (the reference delegates these to cp_measure/CellProfiler:
/root/reference/src/squidpy/experimental/im/_calculate_image_features.py:19,362-537).
"""

from __future__ import annotations

import numpy as np
import pytest

from squidpy_tpu.ops.cellfeats import (
    granularity_batch,
    granularity_per_label,
    pearson_correlation_batch,
    radial_distribution_batch,
    zernike_batch,
    zernike_table,
)


def _disk(size=101, center=50, radius=45):
    yy, xx = np.mgrid[:size, :size]
    return ((yy - center) ** 2 + (xx - center) ** 2) <= radius**2


_ZNAMES = [(n, m) for n, m, _ in zernike_table(9)]


class TestZernike:
    def test_table_has_30_moments(self):
        assert len(zernike_table(9)) == 30
        # classic radial polynomial spot checks: R_20(rho) = 2 rho^2 - 1
        n, m, terms = [t for t in zernike_table(9) if t[0] == 2 and t[1] == 0][0]
        assert dict((p, c) for p, c in terms) == {2: 2.0, 0: -1.0}

    def test_full_disk_is_z00(self):
        mags, _ = zernike_batch(_disk()[None])
        assert abs(mags[0, _ZNAMES.index((0, 0))] - 1.0) < 5e-3
        higher = np.delete(mags[0], _ZNAMES.index((0, 0)))
        assert np.abs(higher).max() < 0.03

    def test_annulus_excites_z20(self):
        yy, xx = np.mgrid[:101, :101]
        r2 = (yy - 50) ** 2 + (xx - 50) ** 2
        ring = (r2 <= 45**2) & (r2 >= 30**2)
        mags, _ = zernike_batch(ring[None])
        # analytic: for an annulus rho in [a,1], Z20 integral = 2(1-a^4)-... > 0.5
        assert mags[0, _ZNAMES.index((2, 0))] > 0.5

    def test_rotation_invariant_magnitudes(self):
        # an off-axis blob rotated 90deg keeps all |Z_nm|
        m = np.zeros((101, 101), bool)
        m[30:60, 40:55] = True
        mags_a, _ = zernike_batch(m[None])
        mags_b, _ = zernike_batch(np.rot90(m).copy()[None])
        np.testing.assert_allclose(mags_a, mags_b, atol=1e-3)

    def test_batched_matches_single(self):
        rng = np.random.default_rng(0)
        masks = rng.random((4, 64, 64)) > 0.6
        masks[:, 0, 0] = True  # never empty
        batch, _ = zernike_batch(masks)
        for i in range(4):
            single, _ = zernike_batch(masks[i][None])
            np.testing.assert_allclose(batch[i], single[0], rtol=1e-5, atol=1e-6)

    def test_intensity_weighted_disk(self):
        # uniform intensity over a disk: distribution Zernike |Z00| = 1/pi
        disk = _disk()
        mags, _ = zernike_batch(disk[None], intensity=disk.astype(np.float32)[None])
        assert abs(mags[0, _ZNAMES.index((0, 0))] - 1.0 / np.pi) < 5e-3


class TestRadialDistribution:
    def test_uniform_disk_ring_fractions(self):
        disk = _disk()
        rd = radial_distribution_batch(disk[None], disk.astype(np.float32)[None])
        # ring b of 4 covers area fraction (2b+1)/16 of the disk
        np.testing.assert_allclose(rd["frac_at_d"][0], [(2 * b + 1) / 16 for b in range(4)], atol=0.01)
        np.testing.assert_allclose(rd["mean_frac"][0], 1.0, atol=1e-5)
        np.testing.assert_allclose(rd["radial_cv"][0], 0.0, atol=1e-5)

    def test_center_hotspot_concentrates_inner_ring(self):
        disk = _disk()
        inten = np.zeros_like(disk, np.float32)
        inten[48:53, 48:53] = 100.0
        rd = radial_distribution_batch(disk[None], inten[None])
        assert rd["frac_at_d"][0, 0] > 0.99
        assert rd["mean_frac"][0, 0] > 10.0

    def test_asymmetric_signal_raises_cv(self):
        disk = _disk()
        inten = np.zeros_like(disk, np.float32)
        inten[:, 50:] = 1.0  # right half only
        rd = radial_distribution_batch(disk[None], inten[None])
        assert (rd["radial_cv"][0] > 0.5).all()


class TestGranularity:
    def test_impulse_vanishes_at_scale_one(self):
        img = np.zeros((64, 64), np.float32)
        lab = np.zeros((64, 64), np.int32)
        img[10, 10] = 1.0
        lab[5:15, 5:15] = 1
        gs = granularity_per_label(img, lab, num_labels=2, length=4)
        np.testing.assert_allclose(gs[1], [100.0, 0.0, 0.0, 0.0], atol=1e-3)

    def test_block_vanishes_at_half_width(self):
        img = np.zeros((64, 64), np.float32)
        lab = np.zeros((64, 64), np.int32)
        img[20:25, 20:25] = 2.0  # 5x5: survives 2 erosions, gone at 3
        lab[15:30, 15:30] = 1
        gs = granularity_per_label(img, lab, num_labels=2, length=5)
        assert np.argmax(gs[1]) == 2  # scale 3 (index 2)
        np.testing.assert_allclose(gs[1].sum(), 100.0, atol=1e-2)

    def test_uniform_image_zero_spectrum(self):
        img = np.full((32, 32), 7.0, np.float32)
        lab = np.ones((32, 32), np.int32)
        gs = granularity_per_label(img, lab, num_labels=2, length=4)
        # interior stays; only the tile border erodes (documented edge effect)
        assert gs[1].sum() < 100.0

    def test_crop_batch_variant_matches_fixture(self):
        # the crop-based variant (used by the pipeline: tile-size invariant)
        crops = np.zeros((2, 32, 32), np.float32)
        masks = np.zeros((2, 32, 32), bool)
        crops[0, 10, 10] = 1.0; masks[0, 5:15, 5:15] = True
        crops[1, 10:15, 10:15] = 2.0; masks[1, 5:20, 5:20] = True
        gs = granularity_batch(crops, masks, length=5)
        np.testing.assert_allclose(gs[0], [100, 0, 0, 0, 0], atol=1e-3)
        assert np.argmax(gs[1]) == 2  # 5x5 block vanishes at scale 3

    def test_spectrum_sums_to_intensity_removed(self):
        rng = np.random.default_rng(0)
        img = rng.random((64, 64)).astype(np.float32)
        lab = np.ones((64, 64), np.int32)
        gs = granularity_per_label(img, lab, num_labels=2, length=8)
        assert (gs[1] >= -1e-4).all()  # opening is monotone: increments non-negative
        assert gs[1].sum() <= 100.0 + 1e-3


class TestPearson:
    def test_identical_and_inverted(self):
        a = np.random.default_rng(0).random((2, 16, 16)).astype(np.float32)
        m = np.ones((2, 16, 16), bool)
        np.testing.assert_allclose(pearson_correlation_batch(m, a, a), 1.0, atol=1e-5)
        np.testing.assert_allclose(pearson_correlation_batch(m, a, -a), -1.0, atol=1e-5)

    def test_mask_restricts_support(self):
        rng = np.random.default_rng(1)
        a = rng.random((1, 16, 16)).astype(np.float32)
        b = a.copy()
        b[0, 8:] = rng.random((8, 16))  # decorrelate outside the mask
        m = np.zeros((1, 16, 16), bool)
        m[0, :8] = True
        np.testing.assert_allclose(pearson_correlation_batch(m, a, b), 1.0, atol=1e-5)


class TestPipelineIntegration:
    def _fixture(self):
        rng = np.random.default_rng(0)
        labels = np.zeros((96, 96), np.int32)
        labels[10:30, 10:30] = 1
        labels[50:80, 40:70] = 2
        labels[15:25, 60:85] = 3
        img = rng.integers(10, 40, (96, 96, 2)).astype(np.uint8)
        img[labels > 0] += 100
        return img, labels

    def test_cp_flags_emit_columns(self):
        from squidpy_tpu.experimental import im as exp_im

        img, labels = self._fixture()
        adata = exp_im.calculate_image_features(
            img, labels, tile_size=96,
            features=["cp_measure:granularity", "cp_measure:zernike", "cp_measure:radial",
                      "cp_measure:correlation"],
        )
        cols = list(adata.var_names)
        assert sum(c.startswith("granularity_") for c in cols) == 16 * 2
        assert sum(c.startswith("zernike_") for c in cols) == 30
        assert sum(c.startswith("radial_frac_at_d_") for c in cols) == 4 * 2
        assert sum(c.startswith("radial_zernike_mag_") for c in cols) == 30 * 2
        assert "correlation_pearson__ch0_ch1" in cols
        assert adata.n_obs == 3
        assert np.isfinite(np.asarray(adata.X, dtype=float)).all()

    def test_default_features_include_cp_families(self):
        from squidpy_tpu.experimental import im as exp_im

        img, labels = self._fixture()
        adata = exp_im.calculate_image_features(img, labels, tile_size=96)
        cols = list(adata.var_names)
        assert any(c.startswith("granularity_") for c in cols)
        assert any(c.startswith("zernike_") for c in cols)
        assert any(c.startswith("radial_") for c in cols)

    def test_sizeshape_flag_includes_zernike(self):
        from squidpy_tpu.experimental.im._calculate_image_features import parse_features

        p = parse_features(["cp_measure:sizeshape"])
        assert p.zernike and p.morphology_props
        p2 = parse_features(["cp_measure:feret"])
        assert p2.morphology_props == frozenset({"feret_diameter_max"})

    def test_tile_size_invariance_with_cp_families(self):
        from squidpy_tpu.experimental import im as exp_im

        img, labels = self._fixture()
        a = exp_im.calculate_image_features(
            img, labels, tile_size=96, features=["cp_measure:zernike", "cp_measure:radial"]
        )
        b = exp_im.calculate_image_features(
            img, labels, tile_size=48, features=["cp_measure:zernike", "cp_measure:radial"]
        )
        sa = a.obs_names.argsort()
        sb = b.obs_names.argsort()
        np.testing.assert_allclose(
            np.asarray(a.X, float)[sa], np.asarray(b.X, float)[sb], rtol=1e-4, atol=1e-5
        )


class TestColocalization:
    """Costes / Manders / RWC channel colocalization kernels."""

    def _mask(self, n=1, s=24):
        return np.ones((n, s, s), bool)

    def test_costes_identical_channels_high_overlap(self):
        rng = np.random.default_rng(0)
        from squidpy_tpu.ops.cellfeats import costes_coloc_batch

        a = rng.random((1, 24, 24)).astype(np.float32)
        res = costes_coloc_batch(self._mask(), a, a)
        # identical channels colocalize almost completely
        assert res["costes_c1"][0] > 0.8 and res["costes_c2"][0] > 0.8
        assert 0.0 <= res["costes_threshold"][0] <= 1.0

    def test_costes_independent_channels_low_overlap(self):
        rng = np.random.default_rng(1)
        from squidpy_tpu.ops.cellfeats import costes_coloc_batch

        a = rng.random((1, 32, 32)).astype(np.float32)
        b = rng.random((1, 32, 32)).astype(np.float32)
        res = costes_coloc_batch(self._mask(s=32), a, b)
        ident = costes_coloc_batch(self._mask(s=32), a, a)
        assert res["costes_c1"][0] < ident["costes_c1"][0]

    def test_manders_disjoint_signals_zero(self):
        from squidpy_tpu.ops.cellfeats import manders_batch

        a = np.zeros((1, 16, 16), np.float32)
        b = np.zeros((1, 16, 16), np.float32)
        a[0, :8] = 1.0   # top half
        b[0, 8:] = 1.0   # bottom half
        res = manders_batch(self._mask(s=16), a, b)
        np.testing.assert_allclose(res["manders_m1"][0], 0.0, atol=1e-6)
        np.testing.assert_allclose(res["manders_m2"][0], 0.0, atol=1e-6)

    def test_manders_full_overlap_one(self):
        from squidpy_tpu.ops.cellfeats import manders_batch

        a = np.full((1, 16, 16), 2.0, np.float32)
        res = manders_batch(self._mask(s=16), a, a)
        np.testing.assert_allclose(res["manders_m1"][0], 1.0, atol=1e-6)
        np.testing.assert_allclose(res["manders_m2"][0], 1.0, atol=1e-6)

    def test_rwc_identical_is_one_and_reversed_low(self):
        rng = np.random.default_rng(2)
        from squidpy_tpu.ops.cellfeats import rwc_batch

        a = rng.random((1, 16, 16)).astype(np.float32)
        same = rwc_batch(self._mask(s=16), a, a)
        np.testing.assert_allclose(same["rwc1"][0], 1.0, atol=1e-6)
        rev = rwc_batch(self._mask(s=16), a, a.max() - a)
        assert rev["rwc1"][0] < 0.7

    def test_pipeline_emits_all_coloc_columns(self):
        from squidpy_tpu.experimental import im as exp_im

        rng = np.random.default_rng(0)
        labels = np.zeros((64, 64), np.int32)
        labels[8:28, 8:28] = 1
        labels[36:60, 30:60] = 2
        img = rng.integers(10, 200, (64, 64, 2)).astype(np.uint8)
        adata = exp_im.calculate_image_features(
            img, labels, tile_size=64, features=["cp_measure:correlation"]
        )
        cols = set(adata.var_names)
        for want in ("correlation_pearson", "correlation_costes_c1", "correlation_costes_c2",
                     "correlation_manders_m1", "correlation_manders_m2",
                     "correlation_rwc1", "correlation_rwc2"):
            assert f"{want}__ch0_ch1" in cols, want

    def test_variant_subselection(self):
        from squidpy_tpu.experimental import im as exp_im

        rng = np.random.default_rng(0)
        labels = np.zeros((48, 48), np.int32)
        labels[8:40, 8:40] = 1
        img = rng.integers(10, 200, (48, 48, 2)).astype(np.uint8)
        adata = exp_im.calculate_image_features(
            img, labels, tile_size=48, features=["cp_measure:correlation_rwc"]
        )
        cols = list(adata.var_names)
        assert any(c.startswith("correlation_rwc") for c in cols)
        assert not any(c.startswith("correlation_pearson") for c in cols)
