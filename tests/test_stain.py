"""Stain-normalization behavioral contracts (experimental/im/_stain.py).

Ports the applicable behaviors from the reference's dedicated stain suite
(/root/reference/tests/experimental/test_stain_*.py — white point, range
validation, reference fitting, decomposition, normalization, Reinhard) to
this build's array-level API, including the round-3 unit-convention
canonicalization (everything internal runs on one 0-255 scale).
"""

from __future__ import annotations

import numpy as np
import pytest

from squidpy_tpu.experimental import im as exp_im
from squidpy_tpu.experimental.im import _stain as st


@pytest.fixture()
def he_rgb():
    """Synthetic H&E-ish uint8 image: two planted stain directions mixed at
    random concentrations over a bright background."""
    rng = np.random.default_rng(0)
    h = np.array([0.65, 0.70, 0.29])
    e = np.array([0.07, 0.99, 0.11])
    n = 96
    # mixture sweeps from pure-H to pure-E so the angular extremes exist,
    # and the first rows are near-unstained (true background)
    t = rng.uniform(0, 1, n * n)
    mag = np.abs(rng.normal(0.8, 0.3, n * n))
    conc = np.stack([mag * t, mag * (1 - t)], axis=1)
    conc[: n * 10] *= 0.01
    od = conc @ np.stack([h / np.linalg.norm(h), e / np.linalg.norm(e)])
    rgb = 240.0 * np.power(10.0, -od)
    return np.clip(rgb, 1, 255).reshape(n, n, 3).astype(np.uint8)


class TestWhitePoint:
    def test_default_white_point_value_aware_floats(self):
        # round-3 extension: 0-255-scale floats get 255, [0,1] floats get 1
        img01 = np.full((4, 4, 3), 0.8, np.float32)
        img255 = np.full((4, 4, 3), 200.0, np.float32)
        assert (exp_im.default_white_point(img01) == 1.0).all()
        assert (exp_im.default_white_point(img255) == 255.0).all()

    def test_estimate_recovers_bright_background(self, he_rgb):
        wp = st.estimate_white_point(he_rgb)
        assert wp.shape == (3,)
        assert (wp > 200).all()  # background is ~240

    def test_background_median_anchor(self):
        img = np.full((20, 20, 3), 50, np.uint8)
        mask = np.zeros((20, 20), bool)
        mask[:5] = True
        img[:5] = [230, 235, 240]
        wp = exp_im.white_point_from_background(img, mask)
        np.testing.assert_array_equal(wp, [230, 235, 240])

    def test_background_mask_errors(self):
        img = np.zeros((10, 10, 3), np.uint8)
        with pytest.raises(ValueError, match="selects no pixels"):
            exp_im.white_point_from_background(img, np.zeros((10, 10), bool))
        with pytest.raises(ValueError, match="does not match"):
            exp_im.white_point_from_background(img, np.zeros((5, 5), bool))


class TestValidateRgbRange:
    def test_passes_uint8_and_unit_float(self):
        exp_im.validate_rgb_range(np.full((4, 4, 3), 200, np.uint8))
        exp_im.validate_rgb_range(np.full((4, 4, 3), 0.8, np.float32))

    def test_passes_0_255_float(self):
        # accepted in this build: canonicalized internally (x1)
        exp_im.validate_rgb_range(np.full((4, 4, 3), 200.0, np.float32))

    def test_raises_8bit_in_uint16(self):
        with pytest.raises(ValueError, match="8-bit data"):
            exp_im.validate_rgb_range(np.full((4, 4, 3), 180, np.uint16))

    def test_raises_ambiguous_float_scale(self):
        with pytest.raises(ValueError, match="neither"):
            exp_im.validate_rgb_range(np.full((4, 4, 3), 2.2, np.float32))


class TestCanonicalization:
    """One internal 0-255 scale: every input convention yields the same fit."""

    def test_uint8_vs_unit_float_identical_fit(self, he_rgb):
        a = exp_im.fit_stain_reference(he_rgb, max_pixels=None)
        b = exp_im.fit_stain_reference(he_rgb.astype(np.float32) / 255.0, max_pixels=None)
        np.testing.assert_allclose(a.stain_matrix, b.stain_matrix, atol=1e-4)
        np.testing.assert_allclose(a.white_point, b.white_point, rtol=1e-5)

    def test_uint16_identical_fit(self, he_rgb):
        img16 = (he_rgb.astype(np.uint16) * 257).astype(np.uint16)
        a = exp_im.fit_stain_reference(he_rgb, max_pixels=None)
        c = exp_im.fit_stain_reference(img16, max_pixels=None)
        np.testing.assert_allclose(a.stain_matrix, c.stain_matrix, atol=2e-3)

    def test_user_white_point_in_image_units(self, he_rgb):
        # a [0,1]-float caller passes the white point in their units
        a = exp_im.fit_stain_reference(he_rgb, white_point=np.full(3, 240.0), max_pixels=None)
        b = exp_im.fit_stain_reference(
            he_rgb.astype(np.float32) / 255.0, white_point=np.full(3, 240.0 / 255.0), max_pixels=None
        )
        np.testing.assert_allclose(a.white_point, b.white_point, rtol=1e-6)
        np.testing.assert_allclose(a.stain_matrix, b.stain_matrix, atol=1e-4)


class TestStainMatrixValidation:
    def test_columns_ordered_h_then_e(self):
        h = np.array([0.65, 0.70, 0.29])
        e = np.array([0.07, 0.99, 0.11])
        swapped = np.stack([e / np.linalg.norm(e), h / np.linalg.norm(h)], axis=1)
        fixed = st._canonicalize(swapped)
        # column 0 is the H-like vector after canonicalization
        assert abs(fixed[:, 0] @ h / np.linalg.norm(h)) > abs(fixed[:, 1] @ h / np.linalg.norm(h))

    def test_residual_third_column_unit_orthogonal(self):
        h = np.array([0.65, 0.70, 0.29])
        e = np.array([0.07, 0.99, 0.11])
        m = st._canonicalize(np.stack([h / np.linalg.norm(h), e / np.linalg.norm(e)], axis=1))
        assert m.shape == (3, 3)
        np.testing.assert_allclose(np.linalg.norm(m[:, 2]), 1.0, atol=1e-6)
        np.testing.assert_allclose(m[:, 2] @ m[:, 0], 0.0, atol=1e-6)
        np.testing.assert_allclose(m[:, 2] @ m[:, 1], 0.0, atol=1e-6)


class TestFitStainReference:
    def test_macenko_recovers_planted_directions(self, he_rgb):
        ref = exp_im.fit_stain_reference(he_rgb, max_pixels=None)
        h = np.array([0.65, 0.70, 0.29])
        h /= np.linalg.norm(h)
        e = np.array([0.07, 0.99, 0.11])
        e /= np.linalg.norm(e)
        assert abs(ref.stain_matrix[:, 0] @ h) > 0.98
        assert abs(ref.stain_matrix[:, 1] @ e) > 0.98
        assert (ref.max_concentrations > 0).all()

    def test_vahadane_runs_and_orders(self, he_rgb):
        # the small NMF fixture recovers an H vector ~46 deg off canonical,
        # so relax the (reference-parity) 45 deg deviation gate here
        ref = exp_im.fit_stain_reference(he_rgb, method="vahadane", max_pixels=5000, max_angle_deg=90.0)
        assert ref.method == "vahadane"
        assert ref.stain_matrix.shape == (3, 3)

    def test_angle_gate_raises_on_non_he(self, he_rgb):
        from squidpy_tpu.experimental.im import StainFittingError

        with pytest.raises(StainFittingError, match="deviates"):
            exp_im.fit_stain_reference(he_rgb, method="vahadane", max_pixels=5000, max_angle_deg=30.0)

    def test_unknown_method_raises(self, he_rgb):
        with pytest.raises(ValueError, match="Unknown stain method"):
            exp_im.fit_stain_reference(he_rgb, method="ruifrok")

    def test_method_params_for_wrong_method_rejected(self, he_rgb):
        from squidpy_tpu.experimental.im._stain import MacenkoParams

        with pytest.raises(ValueError, match="Unknown stain method"):
            exp_im.fit_stain_reference(he_rgb, method="bogus", method_params=MacenkoParams())

    def test_vahadane_params_merge_under_kwargs(self, he_rgb):
        """Explicitly passed kwargs win over method_params fields."""
        from squidpy_tpu.experimental.im._stain import VahadaneParams

        ref = exp_im.fit_stain_reference(
            he_rgb, method="vahadane", max_pixels=4000,
            method_params=VahadaneParams(n_iter=30), n_iter=50,
        )
        assert ref.stain_matrix.shape == (3, 3)

    def test_sample_first_matches_full_fit_direction(self, he_rgb):
        full = exp_im.fit_stain_reference(he_rgb, max_pixels=None)
        sampled = exp_im.fit_stain_reference(he_rgb, max_pixels=500, seed=1)
        assert abs(full.stain_matrix[:, 0] @ sampled.stain_matrix[:, 0]) > 0.99


class TestDecompose:
    def test_decompose_shape_and_h_channel(self, he_rgb):
        conc = exp_im.decompose_stains(he_rgb, max_pixels=None)
        assert conc.shape == he_rgb.shape
        # hematoxylin-heavy pixels decompose to larger channel-0 values
        assert np.isfinite(conc).all()

    def test_roundtrip_through_known_matrix(self):
        rng = np.random.default_rng(1)
        h = np.array([0.65, 0.70, 0.29]); h /= np.linalg.norm(h)
        e = np.array([0.07, 0.99, 0.11]); e /= np.linalg.norm(e)
        planted = np.abs(rng.normal(0.5, 0.3, (48 * 48, 2)))
        od = planted @ np.stack([h, e])
        rgb = np.clip(255.0 * np.power(10.0, -od), 1, 255).reshape(48, 48, 3).astype(np.uint8)
        ref = exp_im.fit_stain_reference(rgb, white_point=np.full(3, 255.0), max_pixels=None)
        conc = exp_im.decompose_stains(rgb, reference=ref)
        got = conc.reshape(-1, 3)[:, :2]
        # concentrations correlate strongly with the planted ones
        for j in range(2):
            r = np.corrcoef(got[:, j], planted[:, j])[0, 1]
            assert r > 0.95, (j, r)


class TestNormalize:
    def test_end_to_end_uint8(self, he_rgb):
        ref = exp_im.fit_stain_reference(he_rgb, max_pixels=None)
        rng = np.random.default_rng(2)
        other = np.clip(he_rgb.astype(np.int32) + rng.integers(-20, 5, he_rgb.shape), 1, 255).astype(np.uint8)
        out = exp_im.normalize_stains(other, ref, max_pixels=None)
        assert out.dtype == np.uint8 and out.shape == he_rgb.shape

    def test_out_dtype_override(self, he_rgb):
        ref = exp_im.fit_stain_reference(he_rgb, max_pixels=None)
        out = exp_im.normalize_stains(he_rgb, ref, out_dtype=np.float32, max_pixels=None)
        assert out.dtype == np.float32

    def test_near_idempotent_on_reference_image(self, he_rgb):
        ref = exp_im.fit_stain_reference(he_rgb, max_pixels=None)
        out = exp_im.normalize_stains(he_rgb, ref, max_pixels=None)
        diff = np.abs(out.astype(float) - he_rgb.astype(float))
        assert np.median(diff) < 8.0


class TestReinhard:
    def test_transfer_matches_reference_stats(self, he_rgb):
        rng = np.random.default_rng(3)
        src = np.clip(he_rgb.astype(np.int32) - 40, 1, 255).astype(np.uint8)
        out = exp_im.reinhard_normalize(src, reference_image=he_rgb, luminosity_threshold=1.0)
        # LAB stats of the output approach the reference's
        lab_out = np.asarray(st._rgb_to_lab_host(out.astype(np.float32))).reshape(-1, 3)
        lab_ref = np.asarray(st._rgb_to_lab_host(he_rgb.astype(np.float32))).reshape(-1, 3)
        assert np.abs(lab_out.mean(0) - lab_ref.mean(0)).max() < 0.25

    def test_explicit_target_stats(self, he_rgb):
        out = exp_im.reinhard_normalize(
            he_rgb, target_means=np.array([0.5, 0.0, 0.0]), target_stds=np.array([0.2, 0.05, 0.05]),
            luminosity_threshold=1.0,
        )
        assert out.shape == he_rgb.shape

    def test_degenerate_channel_no_nan(self):
        img = np.full((32, 32, 3), 128, np.uint8)  # zero-variance channels
        out = exp_im.reinhard_normalize(
            img, target_means=np.array([0.4, 0.0, 0.0]), target_stds=np.array([0.1, 0.02, 0.02]),
            luminosity_threshold=1.0,
        )
        assert np.isfinite(out.astype(float)).all()

    def test_requires_reference_or_stats(self, he_rgb):
        with pytest.raises((ValueError, TypeError)):
            exp_im.reinhard_normalize(he_rgb)


class TestApplyStainNormalization:
    """The one-call wrapper (the reference EXPORTS this name but never
    defines it — /root/reference/src/squidpy/experimental/im/__init__.py:34)."""

    def test_self_normalization(self, he_rgb):
        out = exp_im.apply_stain_normalization(he_rgb, max_pixels=None)
        assert out.dtype == np.uint8 and out.shape == he_rgb.shape

    def test_with_fitted_reference(self, he_rgb):
        ref = exp_im.fit_stain_reference(he_rgb, max_pixels=None)
        out = exp_im.apply_stain_normalization(he_rgb, reference=ref, max_pixels=None)
        assert out.shape == he_rgb.shape

    def test_with_reference_image(self, he_rgb):
        other = np.clip(he_rgb.astype(np.int32) - 30, 1, 255).astype(np.uint8)
        out = exp_im.apply_stain_normalization(other, reference=he_rgb, max_pixels=None)
        assert out.shape == he_rgb.shape

    def test_reinhard_route(self, he_rgb):
        out = exp_im.apply_stain_normalization(he_rgb, reference=he_rgb, method="reinhard")
        assert out.shape == he_rgb.shape
        ref = exp_im.fit_stain_reference(he_rgb, max_pixels=None)
        with pytest.raises(TypeError, match="reference IMAGE"):
            exp_im.apply_stain_normalization(he_rgb, reference=ref, method="reinhard")


class TestStainReferenceContract:
    """Field-consistency gate ported from the reference's dedicated suite
    (/root/reference/tests/experimental/test_stain_reference.py)."""

    def _matrix(self):
        m = st._canonicalize(np.stack([st.RUIFROK_H / np.linalg.norm(st.RUIFROK_H),
                                       st.RUIFROK_E / np.linalg.norm(st.RUIFROK_E)], axis=1))
        return m

    def test_macenko_basic(self):
        ref = st.StainReference(
            method="macenko", stain_matrix=self._matrix(),
            white_point=np.full(3, 240.0), max_concentrations=np.array([1.5, 1.1]),
        )
        assert ref.stain_matrix.dtype == np.float64
        assert ref.white_point.shape == (3,)

    def test_unknown_method_raises(self):
        with pytest.raises(ValueError, match="Unknown method"):
            st.StainReference(method="bogus")

    def test_decomposition_requires_stain_matrix(self):
        with pytest.raises(ValueError, match="requires stain_matrix"):
            st.StainReference(method="macenko", white_point=np.full(3, 240.0))

    def test_decomposition_requires_white_point(self):
        with pytest.raises(ValueError, match="requires white_point"):
            st.StainReference(method="vahadane", stain_matrix=self._matrix())

    def test_decomposition_forbids_mu_sigma(self):
        with pytest.raises(ValueError, match="forbids mu/sigma"):
            st.StainReference(method="macenko", stain_matrix=self._matrix(),
                              white_point=np.full(3, 240.0), mu=np.zeros(3))

    def test_reinhard_requires_mu_and_sigma(self):
        with pytest.raises(ValueError, match="requires both mu and sigma"):
            st.StainReference(method="reinhard", mu=np.zeros(3))

    def test_reinhard_rejects_non_positive_sigma(self):
        with pytest.raises(ValueError, match="strictly positive"):
            st.StainReference(method="reinhard", mu=np.zeros(3), sigma=np.array([1.0, 0.0, 1.0]))

    def test_reinhard_forbids_absorbance_fields(self):
        with pytest.raises(ValueError, match="forbids stain_matrix"):
            st.StainReference(method="reinhard", mu=np.zeros(3), sigma=np.ones(3),
                              stain_matrix=self._matrix())
        with pytest.raises(ValueError, match="forbids white_point"):
            st.StainReference(method="reinhard", mu=np.zeros(3), sigma=np.ones(3),
                              white_point=np.full(3, 240.0))
        with pytest.raises(ValueError, match="forbids max_concentrations"):
            st.StainReference(method="reinhard", mu=np.zeros(3), sigma=np.ones(3),
                              max_concentrations=np.array([1.0, 1.0]))

    def test_bad_white_point(self):
        with pytest.raises(ValueError, match="strictly positive"):
            st.StainReference(method="macenko", stain_matrix=self._matrix(),
                              white_point=np.array([240.0, 0.0, 240.0]))

    def test_rejects_bad_shape(self):
        with pytest.raises(ValueError, match="shape"):
            st.StainReference(method="macenko", stain_matrix=np.eye(2),
                              white_point=np.full(3, 240.0))

    def test_rejects_non_finite(self):
        m = self._matrix()
        m[0, 0] = np.nan
        with pytest.raises(ValueError, match="non-finite"):
            st.StainReference(method="macenko", stain_matrix=m, white_point=np.full(3, 240.0))

    def test_equality_is_array_aware_and_hashable(self):
        a = st.StainReference(method="macenko", stain_matrix=self._matrix(),
                              white_point=np.full(3, 240.0))
        b = st.StainReference(method="macenko", stain_matrix=self._matrix(),
                              white_point=np.full(3, 240.0))
        c = st.StainReference(method="macenko", stain_matrix=self._matrix(),
                              white_point=np.full(3, 239.0))
        assert a == b and a != c
        assert len({a, b}) == 2  # identity hash, like the reference
