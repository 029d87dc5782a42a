"""Typed tuning-knob params objects (reference: the frozen dataclasses passed
as ``method_params``/``tiling_qc_params``/``stitch_params``, e.g.
/root/reference/src/squidpy/experimental/im/_stain/_reinhard.py:34-75)."""

from __future__ import annotations

import numpy as np
import pytest

from squidpy_tpu.experimental import im as exp_im
from squidpy_tpu.experimental import tl as exp_tl
from squidpy_tpu.experimental._params import resolve_params
from squidpy_tpu.experimental.im import (
    BackgroundDetectionParams,
    FelzenszwalbParams,
    MacenkoParams,
    ReinhardParams,
    VahadaneParams,
    WekaParams,
)
from squidpy_tpu.experimental.tl import StitchParams, TilingQCParams


def _he_like(rng: np.random.Generator, h: int = 96, w: int = 96) -> np.ndarray:
    """Synthetic H&E-ish slide: bright background + two stained blobs."""
    img = np.full((h, w, 3), 240.0)
    yy, xx = np.mgrid[:h, :w]
    blob1 = (yy - h // 3) ** 2 + (xx - w // 3) ** 2 < (h // 4) ** 2
    blob2 = (yy - 2 * h // 3) ** 2 + (xx - 2 * w // 3) ** 2 < (h // 5) ** 2
    img[blob1] = [120, 60, 150]
    img[blob2] = [200, 120, 180]
    img += rng.normal(0, 3, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


class TestResolveParams:
    def test_none_gives_defaults(self):
        assert resolve_params(None, MacenkoParams) == MacenkoParams()

    def test_instance_passthrough(self):
        p = MacenkoParams(alpha=2.0)
        assert resolve_params(p, MacenkoParams) is p

    def test_mapping(self):
        p = resolve_params({"alpha": 5.0}, MacenkoParams)
        assert p.alpha == 5.0 and p.beta == MacenkoParams().beta

    def test_unknown_field_raises(self):
        with pytest.raises(ValueError, match="Unknown `method_params` field"):
            resolve_params({"bogus": 1}, MacenkoParams, "method_params")

    def test_wrong_type_raises(self):
        with pytest.raises(TypeError, match="must be MacenkoParams"):
            resolve_params(42, MacenkoParams, "method_params")

    @pytest.mark.parametrize(
        "cls,bad",
        [
            (MacenkoParams, {"alpha": 60.0}),
            (MacenkoParams, {"beta": -1.0}),
            (VahadaneParams, {"lambda1": -0.5}),
            (VahadaneParams, {"n_iter": 0}),
            (ReinhardParams, {"luminosity_threshold": 1.5}),
            (BackgroundDetectionParams, {"corner_size_pct": 0.9}),
            (FelzenszwalbParams, {"grid_rows": 0}),
            (WekaParams, {"sigma_min": 4.0, "sigma_max": 1.0}),
            (WekaParams, {"pseudo_tissue_percentile": 100.0}),
            (TilingQCParams, {"min_area": 0}),
            (TilingQCParams, {"nmads_cut": 0.0}),
            (StitchParams, {"min_confidence": 1.5}),
            (StitchParams, {"max_group_size": 1}),
        ],
    )
    def test_validation(self, cls, bad):
        with pytest.raises(ValueError):
            cls(**bad)

    def test_weka_sigma_ladder(self):
        assert WekaParams(sigma_min=1.0, sigma_max=8.0).sigmas == (1.0, 2.0, 4.0, 8.0)
        assert WekaParams(sigma_min=2.0, sigma_max=3.0).sigmas == (2.0,)

    def test_background_any_corner(self):
        assert BackgroundDetectionParams().any_corner
        none = BackgroundDetectionParams(
            ymin_xmin_is_bg=False, ymax_xmin_is_bg=False,
            ymin_xmax_is_bg=False, ymax_xmax_is_bg=False,
        )
        assert not none.any_corner


class TestStainParams:
    def test_macenko_params_equivalent_to_kwargs(self):
        img = _he_like(np.random.default_rng(0))
        ref_kw = exp_im.fit_stain_reference(img, alpha=2.0, beta=0.1)
        ref_mp = exp_im.fit_stain_reference(img, method_params=MacenkoParams(alpha=2.0, beta=0.1))
        np.testing.assert_allclose(ref_kw.stain_matrix, ref_mp.stain_matrix)
        np.testing.assert_allclose(ref_kw.max_concentrations, ref_mp.max_concentrations)

    def test_macenko_params_mapping_changes_fit(self):
        img = _he_like(np.random.default_rng(1))
        a = exp_im.fit_stain_reference(img, method_params={"alpha": 1.0})
        b = exp_im.fit_stain_reference(img, method_params={"alpha": 20.0})
        assert not np.allclose(a.stain_matrix, b.stain_matrix)

    def test_vahadane_params(self):
        img = _he_like(np.random.default_rng(2))
        ref = exp_im.fit_stain_reference(
            img, method="vahadane",
            method_params=VahadaneParams(n_iter=50, lambda1=0.05),
        )
        assert ref.method == "vahadane"
        assert np.all(np.isfinite(ref.stain_matrix))

    def test_method_params_flow_through_normalize(self):
        rng = np.random.default_rng(3)
        src, tgt = _he_like(rng), _he_like(rng)
        ref = exp_im.fit_stain_reference(tgt)
        out = exp_im.normalize_stains(src, ref, method_params={"alpha": 2.0})
        assert out.shape == src.shape and out.dtype == np.uint8

    def test_reinhard_mask_background_toggle(self):
        rng = np.random.default_rng(4)
        src, tgt = _he_like(rng), _he_like(rng)
        masked = exp_im.reinhard_normalize(src, tgt, method_params=ReinhardParams(mask_background=True))
        vanilla = exp_im.reinhard_normalize(src, tgt, method_params={"mask_background": False})
        # background pixels dominate, so masking the fit must change the output
        assert not np.array_equal(masked, vanilla)


class TestDetectTissueParams:
    def test_background_params_orientation(self):
        img = _he_like(np.random.default_rng(5), 128, 128)
        default = exp_im.detect_tissue(img, method="weka", downscale_to=128)
        custom = exp_im.detect_tissue(
            img, method="weka", downscale_to=128,
            background_params=BackgroundDetectionParams(corner_size_pct=0.08),
        )
        assert default.shape == custom.shape == img.shape[:2]
        assert default.any() and custom.any()

    def test_no_corner_fallback(self):
        img = _he_like(np.random.default_rng(6), 128, 128)
        bg = BackgroundDetectionParams(
            ymin_xmin_is_bg=False, ymax_xmin_is_bg=False,
            ymin_xmax_is_bg=False, ymax_xmax_is_bg=False,
        )
        mask = exp_im.detect_tissue(img, method="weka", downscale_to=128, background_params=bg)
        assert 0 < mask.sum() < mask.size

    def test_felzenszwalb_params(self):
        img = _he_like(np.random.default_rng(7), 160, 160)
        mask = exp_im.detect_tissue(
            img, method="felzenszwalb", downscale_to=160,
            method_params=FelzenszwalbParams(grid_rows=6, grid_cols=6, min_size_coef=0.1),
        )
        assert 0 < mask.sum() < mask.size

    def test_weka_params_rf_knobs(self):
        img = _he_like(np.random.default_rng(8), 128, 128)
        mask = exp_im.detect_tissue(
            img, method="weka", downscale_to=128,
            method_params=WekaParams(rf_estimators=10, rf_max_depth=5, sigma_max=4.0, edges=False),
        )
        assert 0 < mask.sum() < mask.size

    def test_method_params_rejected_for_otsu(self):
        with pytest.raises(ValueError, match="not supported for method"):
            exp_im.detect_tissue(
                np.zeros((64, 64, 3), dtype=np.uint8), method="otsu",
                method_params={"grid_rows": 4},
            )


def _cut_cell_labels() -> np.ndarray:
    """Several intact round cells plus one cell sliced by the tile border at
    y=32 (labels 2/3 are its two halves) — the cut pair must be the MAD
    outlier against the intact population."""
    lab = np.zeros((96, 96), dtype=np.int32)
    yy, xx = np.mgrid[:96, :96]
    lid = 4
    for cy, cx in [(14, 14), (14, 50), (14, 82), (50, 14), (82, 50), (82, 82)]:
        lab[(yy - cy) ** 2 + (xx - cx) ** 2 < 36] = lid
        lid += 1
    disc = (yy - 32) ** 2 + (xx - 48) ** 2 < 64
    lab[disc & (yy < 32)] = 2
    lab[disc & (yy >= 32)] = 3
    return lab


class TestTilingParams:
    def test_tiling_qc_params_min_area(self):
        lab = _cut_cell_labels()
        plain = exp_tl.calculate_tiling_qc(lab, tile_size=32, n_jobs=1)
        strict = exp_tl.calculate_tiling_qc(
            lab, tile_size=32, n_jobs=1,
            tiling_qc_params=TilingQCParams(min_area=10_000),
        )
        assert plain.obs["tile_cut"].sum() > 0
        assert strict.obs["tile_cut"].sum() == 0
        assert np.isnan(strict.obs["cut_score"].to_numpy()).all()

    def test_tiling_qc_params_override_knobs(self):
        lab = _cut_cell_labels()
        qc = exp_tl.calculate_tiling_qc(
            lab, tile_size=32, n_jobs=1,
            tiling_qc_params={"min_run_px": 4, "nmads_cut": 1.0},
        )
        assert len(qc.obs) == 8

    def test_stitch_params(self):
        lab = _cut_cell_labels()
        qc = exp_tl.calculate_tiling_qc(lab, tile_size=32, n_jobs=1)
        df = exp_tl.assign_stitch_groups(
            lab, qc, tile_size=32,
            stitch_params=StitchParams(min_confidence=0.1, max_gap=5.0),
        )
        got = df.loc[df["label"].isin([2, 3]), "stitch_group_id"].to_numpy()
        assert (got == 2).all()  # the two halves stitched under the min label

    def test_smoothed_outlier_columns(self):
        lab = _cut_cell_labels()
        qc = exp_tl.calculate_tiling_qc(lab, tile_size=32, n_jobs=1, n_neighbors=3)
        obs = qc.obs
        for col in ("smoothed_cut_score", "is_outlier", "nhood_outlier_fraction"):
            assert col in obs
        # smoothed = cut_score x mean of neighbor cut_scores: bounded by max^2
        mx = np.nan_to_num(obs["cut_score"].to_numpy()).max()
        assert (obs["smoothed_cut_score"].to_numpy() <= mx * mx + 1e-9).all()
        assert obs["nhood_outlier_fraction"].between(0, 1).all()
        # gates off => nothing is an outlier
        off = exp_tl.calculate_tiling_qc(
            lab, tile_size=32, n_jobs=1,
            outlier_use_cut=False, outlier_use_smoothed=False,
        )
        assert not off.obs["is_outlier"].any()

    def test_stitch_params_equivalent_to_kwargs(self):
        lab = _cut_cell_labels()
        qc = exp_tl.calculate_tiling_qc(lab, tile_size=32, n_jobs=1)
        via_kwargs = exp_tl.assign_stitch_groups(
            lab, qc, tile_size=32, min_confidence=0.3, max_gap=4.0, inplace=False,
        )
        via_params = exp_tl.assign_stitch_groups(
            lab, qc, tile_size=32, inplace=False,
            stitch_params={"min_confidence": 0.3, "max_gap": 4.0},
        )
        assert (via_kwargs["stitch_group_id"] == via_params["stitch_group_id"]).all()
