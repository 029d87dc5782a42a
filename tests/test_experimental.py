"""Experimental subpackage tests: tiling ownership, per-cell featurization,
stain normalization, QC, tissue detection, tiling QC + stitching — with
synthetic ellipsoid cells on a jittered grid and known ground truth, modeled
on the reference's tests/experimental fixtures."""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

import squidpy_tpu as sq
from squidpy_tpu.experimental import im as exp_im
from squidpy_tpu.experimental import tl as exp_tl


def _synthetic_cells(n_side: int = 6, spacing: int = 40, radius: int = 9, size: int = 260, seed: int = 0):
    """Elliptical cells on a jittered grid; returns (labels, image)."""
    rng = np.random.default_rng(seed)
    labels = np.zeros((size, size), dtype=np.int32)
    yy, xx = np.mgrid[0:size, 0:size]
    lid = 1
    for i in range(n_side):
        for j in range(n_side):
            cy = 30 + i * spacing + rng.integers(-4, 5)
            cx = 30 + j * spacing + rng.integers(-4, 5)
            ry, rx = radius, int(radius * 0.7)
            mask = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1
            labels[mask] = lid
            lid += 1
    image = (labels > 0).astype(np.float32) * 150 + rng.normal(0, 5, labels.shape).astype(np.float32)
    return labels, image


class TestTiling:
    def test_cell_info_matches_regionprops(self):
        labels, _ = _synthetic_cells()
        info = exp_im.compute_cell_info(labels)
        from squidpy_tpu.ops.features import regionprops

        res = regionprops(labels, ["label", "area", "centroid"])
        assert set(info.keys()) == set(res["label"].tolist())
        for k, lab in enumerate(res["label"]):
            np.testing.assert_allclose(info[int(lab)].centroid_y, res["centroid-0"][k], rtol=1e-9)
            np.testing.assert_allclose(info[int(lab)].centroid_x, res["centroid-1"][k], rtol=1e-9)

    def test_tiled_cell_info_matches_whole(self):
        labels, _ = _synthetic_cells()
        whole = exp_im.compute_cell_info(labels)
        tiled = exp_im.compute_cell_info_tiled(labels, chunk_size=64)  # cells span chunks
        assert set(whole) == set(tiled)
        for lid in whole:
            np.testing.assert_allclose(tiled[lid].centroid_y, whole[lid].centroid_y, rtol=1e-9)
            np.testing.assert_allclose(tiled[lid].centroid_x, whole[lid].centroid_x, rtol=1e-9)
            assert tiled[lid].bbox_h == whole[lid].bbox_h

    def test_every_cell_owned_exactly_once(self):
        labels, _ = _synthetic_cells()
        info = exp_im.compute_cell_info(labels)
        specs = exp_im.build_tile_specs(labels.shape, info, tile_size=100)
        owned = [lid for s in specs for lid in s.owned_ids]
        assert sorted(owned) == sorted(info.keys())  # exactly once

    def test_ownership_masking(self):
        labels, _ = _synthetic_cells()
        info = exp_im.compute_cell_info(labels)
        specs = exp_im.build_tile_specs(labels.shape, info, tile_size=100)
        seen: set[int] = set()
        total_area = 0
        for spec in specs:
            tile = exp_im.extract_labels_tile(labels, spec)
            present = set(np.unique(tile).tolist()) - {0}
            assert present <= set(spec.owned_ids)
            assert not (present & seen)
            seen |= present
            total_area += int((tile > 0).sum())
        # with auto margin every owned cell is fully contained -> areas add up
        assert total_area == int((labels > 0).sum())


class TestExperimentalFeatures:
    def test_per_cell_features(self):
        labels, image = _synthetic_cells()
        adata = exp_im.calculate_image_features(image, labels, tile_size=100)
        n_cells = len(np.unique(labels)) - 1
        assert adata.n_obs == n_cells
        assert "area" in adata.var_names and "intensity_mean__ch0" in adata.var_names
        areas = adata.obs_vector("area")
        from squidpy_tpu.ops.features import regionprops

        want = regionprops(labels, ["label", "area"])
        np.testing.assert_array_equal(np.sort(areas), np.sort(want["area"]))
        # cells are bright (150) inside
        means = adata.obs_vector("intensity_mean__ch0")
        assert (means > 100).all()
        # the default feature set includes summary, 16-bin histogram, texture
        assert "summary_std__ch0" in adata.var_names
        assert "histogram_bin0__ch0" in adata.var_names and "histogram_bin15__ch0" in adata.var_names
        assert "texture_contrast__ch0" in adata.var_names

    def test_feature_flags_select_families(self):
        labels, image = _synthetic_cells()
        adata = exp_im.calculate_image_features(
            image, labels, tile_size=100,
            features=["skimage:morphology:area", "squidpy:histogram"],
        )
        cols = list(adata.var_names)
        assert "area" in cols
        assert not any(c.startswith("texture_") for c in cols)
        assert not any(c.startswith("summary_") for c in cols)
        assert sum(c.startswith("histogram_bin") for c in cols) == 16
        # histogram rows are normalized frequencies
        hist = adata.X[:, [i for i, c in enumerate(cols) if c.startswith("histogram_bin")]]
        np.testing.assert_allclose(hist.sum(axis=1), 1.0, atol=1e-6)

    def test_feature_flags_errors(self):
        import pytest as _pytest

        from squidpy_tpu.experimental.im._calculate_image_features import parse_features

        with _pytest.raises(ValueError, match="Unknown correlation variant"):
            parse_features(["cp_measure:correlation_bogus"])
        with _pytest.raises(ValueError, match="Unknown feature"):
            parse_features(["bogus:family"])
        with _pytest.raises(ValueError, match="Unknown skimage morphology"):
            parse_features(["skimage:morphology:not_a_prop"])

    def test_per_cell_texture_matches_per_bbox(self):
        """The sentinel-padded batched GLCM equals a per-bbox skimage-recipe
        computation (reference _glcm_features, experimental/im/
        _calculate_image_features.py:496-521)."""
        from squidpy_tpu.ops.features import graycomatrix, graycoprops, per_cell_texture_batch

        rng = np.random.default_rng(3)
        side = 48
        crops = rng.uniform(0, 255, size=(4, side, side)).astype(np.float32)
        masks = np.zeros((4, side, side), dtype=bool)
        masks[0, 5:20, 7:30] = True
        masks[1, 0:48, 0:48] = True
        masks[2, 10:11, 10:25] = True  # single-row cell
        masks[3, 3:40, 3:8] = True
        props = ("contrast", "dissimilarity", "homogeneity", "energy", "ASM", "correlation")
        got = per_cell_texture_batch(crops, masks, props=props, levels=32)

        for i in range(4):
            ys, xs = np.where(masks[i])
            y0, y1, x0, x1 = ys.min(), ys.max() + 1, xs.min(), xs.max() + 1
            ch = crops[i, y0:y1, x0:x1].copy()
            m = masks[i, y0:y1, x0:x1]
            ch[~m] = 0
            lo, hi = ch[m].min(), ch[m].max()
            norm = (ch - lo) / (hi - lo) if hi > lo else np.zeros_like(ch)
            quant = np.clip(np.round(norm * 31), 0, 31).astype(np.uint8)
            quant[~m] = 0
            P = graycomatrix(quant, [1], [0], levels=32, symmetric=True, normed=True)
            for pi, prop in enumerate(props):
                np.testing.assert_allclose(
                    got[i, pi], graycoprops(P, prop)[0, 0], rtol=1e-4, atol=1e-5,
                    err_msg=f"cell {i} prop {prop}",
                )

    def test_align_to_image_grid(self):
        from squidpy_tpu.experimental.im._calculate_image_features import align_to_image_grid

        image = np.arange(100 * 120, dtype=np.float32).reshape(100, 120)
        labels = np.zeros((90, 100), dtype=np.int32)
        labels[10:20, 10:20] = 1   # fully inside the overlap
        labels[0:5, 50:60] = 2     # straddles the cut under a (-3, 0) shift
        img_c, lbl_c = align_to_image_grid(image, labels, labels_translation=(-3, 0))
        assert img_c.shape == (87, 100)
        assert lbl_c.shape == (87, 100)
        # the straddling cell is zeroed, the intact one survives
        assert set(np.unique(lbl_c)) == {0, 1}

        import pytest as _pytest

        with _pytest.raises(ValueError, match="non-integer"):
            align_to_image_grid(image, labels, labels_translation=(0.5, 0), align_mode="strict")
        _, lbl_r = align_to_image_grid(image, labels, labels_translation=(0.5, 0), align_mode="rasterize")
        assert lbl_r.shape == image.shape

    def test_tiling_invariance(self):
        labels, image = _synthetic_cells()
        a1 = exp_im.calculate_image_features(image, labels, tile_size=80)
        a2 = exp_im.calculate_image_features(image, labels, tile_size=260)
        np.testing.assert_allclose(np.asarray(a1.X), np.asarray(a2.X), rtol=1e-6)


class TestStain:
    @pytest.fixture()
    def he_image(self):
        """Synthetic H&E-like image: purple nuclei on pink background."""
        rng = np.random.default_rng(0)
        img = np.full((120, 120, 3), [230.0, 180.0, 200.0])  # pinkish bg
        yy, xx = np.mgrid[0:120, 0:120]
        for _ in range(25):
            cy, cx = rng.integers(10, 110, 2)
            mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= 36
            img[mask] = [90.0, 60.0, 140.0]  # purple nuclei
        img += rng.normal(0, 4, img.shape)
        return np.clip(img, 0, 255)

    def test_fit_macenko(self, he_image):
        ref = exp_im.fit_stain_reference(he_image, method="macenko")
        assert ref.stain_matrix.shape == (3, 3)
        np.testing.assert_allclose(np.linalg.norm(ref.stain_matrix[:, :2], axis=0), 1.0, rtol=1e-6)
        assert (ref.max_concentrations > 0).all()

    def test_fit_vahadane(self, he_image):
        ref = exp_im.fit_stain_reference(he_image, method="vahadane")
        assert ref.stain_matrix.shape == (3, 3)

    def test_decompose_shapes(self, he_image):
        conc = exp_im.decompose_stains(he_image)
        assert conc.shape == he_image.shape
        assert np.isfinite(conc).all()

    def test_normalize_to_reference(self, he_image):
        rng = np.random.default_rng(1)
        shifted = np.clip(he_image * [0.8, 1.1, 0.9] + rng.normal(0, 2, he_image.shape), 1, 255)
        ref = exp_im.fit_stain_reference(he_image, method="macenko")
        out = exp_im.normalize_stains(shifted, ref)
        assert out.dtype == np.uint8
        assert out.shape == he_image.shape
        # normalization moves the color distribution toward the reference
        d_before = np.abs(shifted.mean((0, 1)) - he_image.mean((0, 1))).sum()
        d_after = np.abs(out.astype(float).mean((0, 1)) - he_image.mean((0, 1))).sum()
        assert d_after < d_before

    def test_reinhard(self, he_image):
        shifted = np.clip(he_image * 0.7 + 20, 0, 255)
        out = exp_im.reinhard_normalize(shifted, reference_image=he_image)
        d_before = np.abs(shifted.mean((0, 1)) - he_image.mean((0, 1))).sum()
        d_after = np.abs(out.astype(float).mean((0, 1)) - he_image.mean((0, 1))).sum()
        assert d_after < d_before

    def test_white_point(self, he_image):
        wp = exp_im.estimate_white_point(he_image)
        assert wp.shape == (3,)
        assert (wp > 150).all()  # bright pink background


class TestQCImage:
    def test_basic_grid(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (300, 400), dtype=np.int64).astype(np.uint8)
        qc = exp_im.qc_image(img, tile_size=100)
        assert qc.n_obs == 3 * 4
        assert "qc_tenengrad" in qc.var_names
        assert "tile_row" in qc.obs
        assert np.isfinite(np.asarray(qc.X)).all()

    def test_blur_detected(self):
        """A blurred half must score lower on sharpness metrics."""
        rng = np.random.default_rng(1)
        sharp = rng.integers(0, 255, (128, 256)).astype(np.float32)
        from squidpy_tpu.ops.filters import gaussian_blur

        img = sharp.copy()
        img[:, 128:] = gaussian_blur(sharp[:, 128:], 4.0)
        qc = exp_im.qc_image(img, tile_size=128, metrics=["tenengrad", "var_of_laplacian"])
        t = qc.obs_vector("qc_tenengrad")
        assert t[0] > 5 * t[1]

    def test_hne_metrics_require_rgb(self):
        img = np.zeros((64, 64))
        with pytest.raises(ValueError, match="RGB"):
            exp_im.qc_image(img, tile_size=32, metrics=["hematoxylin_mean"])

    def test_hne_metrics_on_rgb(self):
        rng = np.random.default_rng(2)
        img = rng.integers(50, 255, (64, 64, 3)).astype(np.uint8)
        qc = exp_im.qc_image(img, tile_size=32, metrics=["hematoxylin_mean", "eosin_mean", "he_ratio"])
        assert qc.shape == (4, 3)

    def test_plot(self, tmp_path):
        img = np.random.default_rng(0).integers(0, 255, (128, 128)).astype(np.uint8)
        qc = exp_im.qc_image(img, tile_size=32)
        from squidpy_tpu.experimental import pl as exp_pl

        exp_pl.qc_image(qc, metrics=["tenengrad"], save=str(tmp_path / "qc.png"))
        assert (tmp_path / "qc.png").exists()


class TestDetectTissue:
    def test_detects_dark_blob(self):
        rng = np.random.default_rng(0)
        img = np.full((200, 200), 240.0) + rng.normal(0, 3, (200, 200))
        yy, xx = np.mgrid[0:200, 0:200]
        blob = (yy - 100) ** 2 + (xx - 100) ** 2 <= 50**2
        img[blob] = 120 + rng.normal(0, 10, blob.sum())
        mask = exp_im.detect_tissue(img, downscale_to=128)
        inter = (mask & blob).sum()
        union = (mask | blob).sum()
        assert inter / union > 0.8

    def test_kmeans_method(self):
        rng = np.random.default_rng(0)
        img = np.full((150, 150), 230.0)
        img[40:110, 40:110] = 100.0
        img += rng.normal(0, 2, img.shape)
        mask = exp_im.detect_tissue(img, method="kmeans", downscale_to=150)
        assert mask[70, 70] and not mask[10, 10]

    def test_felzenszwalb_method(self):
        rng = np.random.default_rng(1)
        img = np.full((200, 200), 235.0) + rng.normal(0, 2, (200, 200))
        yy, xx = np.mgrid[0:200, 0:200]
        blob = (yy - 100) ** 2 + (xx - 100) ** 2 <= 55**2
        img[blob] = 110 + rng.normal(0, 5, blob.sum())
        mask = exp_im.detect_tissue(img, method="felzenszwalb", downscale_to=200)
        inter = (mask & blob).sum()
        union = (mask | blob).sum()
        assert inter / union > 0.7

    def test_weka_method(self):
        rng = np.random.default_rng(2)
        img = np.full((180, 180), 240.0) + rng.normal(0, 3, (180, 180))
        img[50:130, 40:140] = 130 + rng.normal(0, 8, (80, 100))
        mask = exp_im.detect_tissue(img, method="weka", downscale_to=180)
        blob = np.zeros((180, 180), dtype=bool)
        blob[50:130, 40:140] = True
        inter = (mask & blob).sum()
        union = (mask | blob).sum()
        assert inter / union > 0.7

    def test_native_felzenszwalb_superpixels(self):
        """Superpixel invariants: full coverage, consecutive labels, min size,
        and a clean two-region image splits along the true boundary."""
        from squidpy_tpu.native import felzenszwalb

        img = np.zeros((60, 90), np.float32)
        img[:, 45:] = 1.0
        labels = felzenszwalb(img, scale=10.0, min_size=10)
        assert labels.min() == 0
        assert len(np.unique(labels)) == labels.max() + 1
        sizes = np.bincount(labels.ravel())
        assert (sizes >= 10).all()
        assert len(np.unique(labels[:, :45])) == 1
        assert len(np.unique(labels[:, 45:])) == 1
        assert labels[0, 0] != labels[0, 89]

    def test_invalid_method(self):
        with pytest.raises(ValueError, match="method"):
            exp_im.detect_tissue(np.zeros((50, 50)), method="banana")


class TestMakeTiles:
    def test_classification(self):
        mask = np.zeros((200, 200), dtype=bool)
        mask[:100, :100] = True  # tissue quadrant
        tiles = exp_im.make_tiles(np.zeros((200, 200)), tissue_mask=mask, tile_size=(100, 100))
        assert len(tiles) == 4
        cls = tiles.set_index(["tile_row", "tile_col"])["tile_classification"]
        assert cls.loc[(0, 0)] == "tissue"
        assert cls.loc[(1, 1)] == "background"

    def test_from_spots(self):
        spots = np.array([[50.0, 50.0], [50.0, 90.0], [90.0, 50.0], [90.0, 90.0]])
        tiles = exp_im.make_tiles_from_spots(spots)
        assert len(tiles) == 4
        # inferred tile size equals vertical spacing (40)
        assert (tiles["pixel_y1"] - tiles["pixel_y0"] == 40).all()

    def test_preview_renders(self):
        import matplotlib.pyplot as plt

        plt.close("all")
        mask = np.zeros((200, 200), dtype=bool)
        mask[:100, :100] = True
        exp_im.make_tiles(np.zeros((200, 200)), tissue_mask=mask, tile_size=(100, 100), preview=True)
        fig = plt.gcf()
        # one rectangle patch per tile + legend drawn
        from matplotlib.patches import Rectangle

        n_rects = sum(isinstance(p, Rectangle) for p in fig.axes[0].patches)
        assert n_rects == 4
        assert fig.axes[0].get_legend() is not None
        plt.close("all")


class TestTilingQCStitch:
    @pytest.fixture()
    def cut_labels(self):
        """Cells cut along a vertical tile border at x=100 (grid spacing
        chosen so one column of cells straddles the border)."""
        labels, _ = _synthetic_cells(size=200, n_side=4, spacing=35)
        cut = labels.copy()
        # simulate a tiled segmentation artifact: relabel right-halves of
        # cells crossing x=100 with new ids
        next_id = labels.max() + 1
        crossing = [
            lid for lid in np.unique(labels) if lid and (labels[:, :100] == lid).any() and (labels[:, 100:] == lid).any()
        ]
        for lid in crossing:
            right = (cut == lid)
            right[:, :100] = False
            cut[right] = next_id
            next_id += 1
        return cut, crossing

    def test_cut_cells_flagged(self, cut_labels):
        cut, crossing = cut_labels
        assert len(crossing) >= 2  # fixture sanity
        qc = exp_tl.calculate_tiling_qc(cut, tile_size=100)
        flagged = set(qc.obs.loc[np.asarray(qc.obs["tile_cut"], dtype=bool), "label"].tolist())
        # every artificial cut produced two flagged pieces
        assert len(flagged) >= len(crossing)
        intact = [lid for lid in np.unique(cut) if lid and lid not in flagged]
        assert len(intact) > 0  # not everything is flagged

    def test_stitch_groups_rejoin_pieces(self, cut_labels):
        cut, crossing = cut_labels
        qc = exp_tl.calculate_tiling_qc(cut, tile_size=100)
        obs = exp_tl.assign_stitch_groups(cut, qc, tile_size=100, min_confidence=0.3)
        groups = obs.groupby("stitch_group_id").size()
        assert (groups > 1).sum() >= len(crossing) // 2

        res = exp_im.make_stitched_labels(cut, qc)
        stitched = res["labels"]
        # stitched image has fewer distinct labels than the cut one
        assert len(np.unique(stitched)) < len(np.unique(cut))
        assert res["table"] is not None

    def test_plot(self, cut_labels, tmp_path):
        cut, _ = cut_labels
        qc = exp_tl.calculate_tiling_qc(cut, tile_size=100)
        from squidpy_tpu.experimental import pl as exp_pl

        exp_pl.tiling_qc(qc, labels=cut, save=str(tmp_path / "tq.png"))
        assert (tmp_path / "tq.png").exists()


class TestUtils:
    def test_derive_mpp(self):
        from squidpy_tpu.experimental.utils import derive_mpp_from_shapes

        radii = np.full(10, 27.5)  # 55 px diameter -> 1 um/px
        assert derive_mpp_from_shapes(radii) == pytest.approx(1.0)

    def test_iter_chunked_regionprops(self):
        """Reference yield contract (utils/_labels.py:19-57): (lid, region,
        y0, x0) tuples with chunk-local coordinates; total area conserved."""
        from squidpy_tpu.experimental.utils import iter_chunked_regionprops

        labels, image = _synthetic_cells()
        out = list(iter_chunked_regionprops(labels, chunk_size=130, intensity_image=image))
        assert len(out) >= 4
        assert all(lid == r.label and lid > 0 for lid, r, _, _ in out)
        assert sum(r.area for _, r, _, _ in out) == (labels > 0).sum()
        for lid, r, y0, x0 in out:
            r0, c0, r1, c1 = r.bbox
            assert r.image.shape == (r1 - r0, c1 - c0)
            assert r.image.sum() == r.area
            # global bbox stays inside the labels array
            assert 0 <= r0 + y0 and r1 + y0 <= labels.shape[0]
            assert 0 <= c0 + x0 and c1 + x0 <= labels.shape[1]
            np.testing.assert_allclose(
                r.centroid, r.coords.mean(axis=0), atol=1e-9
            )
            assert np.isfinite(r.mean_intensity)

    def test_iter_chunked_regionprops_label_subset(self):
        from squidpy_tpu.experimental.utils import iter_chunked_regionprops

        labels, _ = _synthetic_cells()
        present = [int(x) for x in np.unique(labels) if x][:2]
        out = list(iter_chunked_regionprops(labels, chunk_size=130, label_subset=present))
        assert {lid for lid, _, _, _ in out} == set(present)
        assert list(iter_chunked_regionprops(labels, label_subset=[])) == []

    def test_iter_chunked_regionprops_matches_unchunked(self):
        """Chunked stats over one full-size chunk equal the global ones."""
        from squidpy_tpu.experimental.utils import iter_chunked_regionprops

        labels, _ = _synthetic_cells()
        whole = {lid: r for lid, r, _, _ in iter_chunked_regionprops(labels, chunk_size=10_000)}
        for lid in whole:
            m = labels == lid
            assert whole[lid].area == m.sum()
            rr, cc = np.nonzero(m)
            np.testing.assert_allclose(whole[lid].centroid, (rr.mean(), cc.mean()))

    def test_resolve_labels_array(self):
        from squidpy_tpu._core.spatialdata import SpatialData
        from squidpy_tpu.experimental.utils import resolve_labels_array

        lab = np.arange(16, dtype=np.int32).reshape(4, 4)
        sdata = SpatialData(labels={"single": lab, "multi": {"scale0": lab, "scale1": lab[::2, ::2]}})
        np.testing.assert_array_equal(resolve_labels_array(sdata, "single"), lab)
        np.testing.assert_array_equal(resolve_labels_array(sdata, "multi", "scale1"), lab[::2, ::2])
        with pytest.raises(ValueError, match="pyramid"):
            resolve_labels_array(sdata, "multi")
        with pytest.raises(KeyError, match="scale7"):
            resolve_labels_array(sdata, "multi", "scale7")
        with pytest.raises(KeyError, match="nope"):
            resolve_labels_array(sdata, "nope")

    def test_derive_mpp_from_shapes_sdata_form(self):
        """Reference call surface (_derive_mpp.py:22-30): (sdata, shapes_key,
        coordinate_system, *, um_...)."""
        import pandas as pd

        from squidpy_tpu._core.spatialdata import SpatialData
        from squidpy_tpu.experimental.utils import derive_mpp_from_shapes

        yy, xx = np.mgrid[0:10, 0:10]
        spots = pd.DataFrame({
            "x": (xx * 50.0).ravel(), "y": (yy * 50.0).ravel(),
            "radius": np.full(100, 13.75),
        })
        sdata = SpatialData(shapes={"spots": spots})
        # Visium v1: 100 um pitch on a 50 px grid -> 2 um/px
        assert derive_mpp_from_shapes(
            sdata, "spots", "global", um_between_centers=100.0
        ) == pytest.approx(2.0)
        # 55 um diameter on 27.5 px spots -> 2 um/px
        assert derive_mpp_from_shapes(
            sdata, "spots", "global", um_diameter=55.0
        ) == pytest.approx(2.0)
        with pytest.raises(ValueError, match="exactly one"):
            derive_mpp_from_shapes(sdata, "spots", "global")
        with pytest.raises(KeyError, match="missing"):
            derive_mpp_from_shapes(sdata, "missing", "global", um_diameter=55.0)
        with pytest.raises(ValueError, match="empty"):
            derive_mpp_from_shapes(
                SpatialData(shapes={"e": spots.iloc[:0]}), "e", "global", um_diameter=55.0
            )

    def test_derive_mpp_from_shapes_polygons_and_transform(self):
        import pandas as pd

        from squidpy_tpu._core.spatialdata import SpatialData
        from squidpy_tpu.experimental.utils import derive_mpp_from_shapes

        # 8x8 px square bins on a 10 px grid
        polys = []
        for y in range(6):
            for x in range(6):
                x0, y0 = x * 10.0, y * 10.0
                polys.append(np.array([[x0, y0], [x0 + 8, y0], [x0 + 8, y0 + 8], [x0, y0 + 8]]))
        bins = pd.DataFrame({"geometry": polys})
        sdata = SpatialData(shapes={"bins": bins})
        assert derive_mpp_from_shapes(
            sdata, "bins", "global", um_square_edge=16.0
        ) == pytest.approx(2.0)
        # um_diameter needs points
        with pytest.raises(ValueError, match="requires point"):
            derive_mpp_from_shapes(sdata, "bins", "global", um_diameter=55.0)
        # registered transforms: unknown coordinate system raises
        bins2 = pd.DataFrame({"geometry": polys})
        bins2.attrs = {"transform": {"downscaled": np.diag([0.5, 0.5])}}
        sdata2 = SpatialData(shapes={"bins": bins2})
        with pytest.raises(ValueError, match="not registered"):
            derive_mpp_from_shapes(sdata2, "bins", "global", um_square_edge=16.0)
        # a 0.5x similarity into the target frame halves the pixel edge
        assert derive_mpp_from_shapes(
            sdata2, "bins", "downscaled", um_square_edge=16.0
        ) == pytest.approx(4.0)


def test_tiled_featurization_channel_layouts():
    """extract_tile must crop (y, x, c) images on the leading axes; both
    layouts give identical features (regression: channels-last crops were
    sliced on the wrong axes and crashed the intensity reductions)."""
    from squidpy_tpu.experimental.im import calculate_image_features

    rng = np.random.default_rng(0)
    img_last = (rng.random((120, 120, 3)) * 255).astype(np.uint8)
    img_first = np.ascontiguousarray(np.moveaxis(img_last, -1, 0))
    labels = np.zeros((120, 120), np.int32)
    for i, (y, x) in enumerate(rng.integers(15, 105, (8, 2)), start=1):
        labels[y - 5:y + 5, x - 5:x + 5] = i
    a = calculate_image_features(img_last, labels, tile_size=64)
    b = calculate_image_features(img_first, labels, tile_size=64)
    oa = np.argsort(a.obs["label"].to_numpy())
    ob = np.argsort(b.obs["label"].to_numpy())
    np.testing.assert_allclose(np.asarray(a.X)[oa], np.asarray(b.X)[ob])


class TestMultiscaleCellInfo:
    """compute_cell_info_multiscale: centroid pass on the coarsest pyramid
    level, coordinates rescaled to the target scale (reference
    /root/reference/src/squidpy/experimental/im/_tiling.py:115-155)."""

    @staticmethod
    def _pyramid():
        labels, image = _synthetic_cells()
        coarse = labels[::2, ::2]
        coarser = labels[::4, ::4]
        return labels, image, {"scale0": labels, "scale1": coarse, "scale2": coarser}

    def test_mapping_pyramid_centroids_close_to_full(self):
        labels, _, pyr = self._pyramid()
        full = exp_im.compute_cell_info(labels)
        multi = exp_im.compute_cell_info_multiscale(pyr, target_scale="scale0")
        assert set(multi) == set(full)
        for lid, c in multi.items():
            # coarse centroid scaled back: within a few pixels of the truth
            assert abs(c.centroid_y - full[lid].centroid_y) < 4
            assert abs(c.centroid_x - full[lid].centroid_x) < 4
            # scaled bbox must cover the true one
            assert c.bbox_h >= full[lid].bbox_h - 4

    def test_sequence_pyramid(self):
        labels, _, pyr = self._pyramid()
        seq = [pyr["scale0"], pyr["scale1"], pyr["scale2"]]
        multi = exp_im.compute_cell_info_multiscale(seq, target_scale=0)
        full = exp_im.compute_cell_info(labels)
        assert set(multi) == set(full)

    def test_reads_only_coarsest(self):
        """The fine levels must never be materialized."""
        labels, _, pyr = self._pyramid()

        class Booby:
            shape = labels.shape

            def __array__(self, dtype=None, copy=None):
                raise AssertionError("fine level materialized")

        pyr_guarded = {"scale0": Booby(), "scale2": labels[::4, ::4]}
        multi = exp_im.compute_cell_info_multiscale(pyr_guarded, target_scale="scale0")
        assert len(multi) > 0

    def test_featurization_accepts_pyramid(self):
        labels, image, pyr = self._pyramid()
        a_multi = exp_im.calculate_image_features(
            image, pyr, features="skimage:morphology:area", intensity=False, tile_size=96
        )
        a_full = exp_im.calculate_image_features(
            image, labels, features="skimage:morphology:area", intensity=False, tile_size=96
        )
        assert a_multi.shape == a_full.shape
        np.testing.assert_allclose(np.asarray(a_multi.X), np.asarray(a_full.X))


class TestStainConversion:
    """OD / LAB conversion invariants from the reference's stain conversion
    suite (/root/reference/tests/experimental/test_stain_conversion.py,
    test_stain_white_point.py, test_stain_validation.py)."""

    @staticmethod
    def _rgb_patch(seed=0, lo=30, hi=250):
        rng = np.random.default_rng(seed)
        return rng.uniform(lo, hi, size=(32, 32, 3)).astype(np.float32)

    def test_od_round_trip(self):
        import jax.numpy as jnp

        from squidpy_tpu.experimental.im._stain import _od_to_rgb, _rgb_to_od

        rgb = self._rgb_patch()
        wp = np.array([255.0, 255.0, 255.0])
        back = np.asarray(_od_to_rgb(_rgb_to_od(jnp.asarray(rgb), jnp.asarray(wp)), jnp.asarray(wp)))
        np.testing.assert_allclose(back, rgb, rtol=1e-4, atol=0.05)

    def test_white_maps_to_zero_od(self):
        import jax.numpy as jnp

        from squidpy_tpu.experimental.im._stain import _rgb_to_od

        wp = np.array([255.0, 255.0, 255.0])
        od = np.asarray(_rgb_to_od(jnp.asarray(np.full((4, 4, 3), 255.0, np.float32)), jnp.asarray(wp)))
        np.testing.assert_allclose(od, 0.0, atol=1e-6)

    def test_od_non_negative_below_white_point(self):
        import jax.numpy as jnp

        from squidpy_tpu.experimental.im._stain import _rgb_to_od

        rgb = self._rgb_patch(hi=240)
        wp = np.array([250.0, 250.0, 250.0])
        od = np.asarray(_rgb_to_od(jnp.asarray(rgb), jnp.asarray(wp)))
        assert (od >= -1e-6).all()

    def test_off_white_background_round_trip(self):
        import jax.numpy as jnp

        from squidpy_tpu.experimental.im._stain import _od_to_rgb, _rgb_to_od

        rgb = self._rgb_patch(seed=1, hi=235)
        wp = np.array([240.0, 238.0, 242.0])  # off-white scanner background
        back = np.asarray(_od_to_rgb(_rgb_to_od(jnp.asarray(rgb), jnp.asarray(wp)), jnp.asarray(wp)))
        np.testing.assert_allclose(back, rgb, rtol=1e-4, atol=0.05)

    def test_uint8_input_promoted(self):
        rgb8 = (self._rgb_patch() + 0.5).astype(np.uint8)
        conc = exp_im.decompose_stains(rgb8)
        assert conc.dtype.kind == "f"

    def test_rgba_rejected(self):
        with pytest.raises(ValueError, match="RGB"):
            exp_im.decompose_stains(np.zeros((8, 8, 4), np.uint8))

    def test_grayscale_rejected(self):
        with pytest.raises(ValueError, match="RGB"):
            exp_im.decompose_stains(np.zeros((8, 8), np.uint8))

    def test_lab_round_trip(self):
        from squidpy_tpu.experimental.im._stain import _lab_to_rgb_host, _rgb_to_lab_host

        rgb = self._rgb_patch(seed=2, lo=10, hi=250)
        back = _lab_to_rgb_host(_rgb_to_lab_host(rgb.copy()))
        np.testing.assert_allclose(back, rgb, rtol=1e-3, atol=0.5)


class TestStainCanonicalize:
    def test_swapped_columns_restored(self):
        from squidpy_tpu.experimental.im._stain import RUIFROK_E, RUIFROK_H, _canonicalize, _unit_columns

        swapped = _unit_columns(np.stack([RUIFROK_E, RUIFROK_H], axis=1))
        fixed = _canonicalize(swapped)
        h_unit = RUIFROK_H / np.linalg.norm(RUIFROK_H)
        assert abs(fixed[:, 0] @ h_unit) > abs(fixed[:, 1] @ h_unit)

    def test_canonical_order_preserved(self):
        from squidpy_tpu.experimental.im._stain import RUIFROK_E, RUIFROK_H, _canonicalize, _unit_columns

        he = _unit_columns(np.stack([RUIFROK_H, RUIFROK_E], axis=1))
        fixed = _canonicalize(he)
        np.testing.assert_allclose(fixed[:, :2], he, atol=1e-12)

    def test_residual_column_unit_orthogonal(self):
        from squidpy_tpu.experimental.im._stain import RUIFROK_E, RUIFROK_H, _canonicalize, _unit_columns

        fixed = _canonicalize(_unit_columns(np.stack([RUIFROK_H, RUIFROK_E], axis=1)))
        third = fixed[:, 2]
        np.testing.assert_allclose(np.linalg.norm(third), 1.0, rtol=1e-9)
        np.testing.assert_allclose(fixed[:, 0] @ third, 0.0, atol=1e-9)
        np.testing.assert_allclose(fixed[:, 1] @ third, 0.0, atol=1e-9)


class TestStainBehaviors:
    @staticmethod
    def _two_stain_image(seed=0):
        """Synthetic slide mixing two known absorbance vectors."""
        from squidpy_tpu.experimental.im._stain import RUIFROK_E, RUIFROK_H, _unit_columns

        rng = np.random.default_rng(seed)
        n = 96
        stains = _unit_columns(np.stack([RUIFROK_H, RUIFROK_E], axis=1))  # (3,2)
        conc = rng.gamma(2.0, 0.25, size=(n, n, 2))
        conc[: n // 3] *= [2.0, 0.3]   # H-dominant band
        conc[-n // 3 :] *= [0.3, 2.0]  # E-dominant band
        od = conc @ stains.T
        rgb = 255.0 * np.power(10.0, -od)
        return np.clip(rgb, 1, 255), stains

    def test_macenko_recovers_generating_vectors(self):
        img, true_stains = self._two_stain_image()
        ref = exp_im.fit_stain_reference(img, method="macenko", white_point=np.array([255.0] * 3))
        got = ref.stain_matrix[:, :2]
        for j in range(2):
            cos = abs(got[:, j] @ true_stains[:, j])
            assert cos > 0.98, (j, cos)

    def test_decompose_reconstructs_od(self):
        import jax.numpy as jnp

        from squidpy_tpu.experimental.im._stain import _rgb_to_od

        img, _ = self._two_stain_image(seed=3)
        ref = exp_im.fit_stain_reference(img, method="macenko", white_point=np.array([255.0] * 3))
        conc = exp_im.decompose_stains(img, reference=ref)
        od_back = conc.reshape(-1, 3) @ ref.stain_matrix.T
        od_true = np.asarray(_rgb_to_od(jnp.asarray(img.astype(np.float32)), jnp.asarray(ref.white_point)))
        np.testing.assert_allclose(od_back.reshape(img.shape), od_true, atol=5e-3)

    def test_normalize_identity_near_noop(self):
        img, _ = self._two_stain_image(seed=4)
        ref = exp_im.fit_stain_reference(img, method="macenko", white_point=np.array([255.0] * 3))
        out = exp_im.normalize_stains(img, ref)
        assert np.abs(out.astype(float) - img).mean() < 3.0  # self-normalization ~ identity

    def test_normalize_background_stays_white(self):
        img, _ = self._two_stain_image(seed=5)
        img[:8, :8] = 255.0  # white background patch
        ref = exp_im.fit_stain_reference(img, method="macenko", white_point=np.array([255.0] * 3))
        out = exp_im.normalize_stains(img, ref)
        assert out[:4, :4].astype(float).min() > 245

    def test_reinhard_exact_stats_transfer(self):
        from squidpy_tpu.experimental.im._stain import _rgb_to_lab_host

        rng = np.random.default_rng(6)
        src = np.clip(rng.normal(120, 30, (64, 64, 3)), 5, 250).astype(np.float32)
        ref = np.clip(rng.normal(150, 20, (64, 64, 3)), 5, 250).astype(np.float32)
        out = exp_im.reinhard_normalize(
            src, reference_image=ref, luminosity_threshold=2.0, out_dtype=np.float32
        )
        lab_out = _rgb_to_lab_host(np.asarray(out, dtype=np.float32)).reshape(-1, 3)
        lab_ref = _rgb_to_lab_host(ref.copy()).reshape(-1, 3)
        # whole image is "tissue" (threshold 2.0): in-gamut transfer ->
        # output LAB stats land on the reference's
        np.testing.assert_allclose(lab_out.mean(axis=0), lab_ref.mean(axis=0), atol=0.02)
        np.testing.assert_allclose(lab_out.std(axis=0), lab_ref.std(axis=0), rtol=0.05)

    def test_reinhard_requires_reference_or_targets(self):
        with pytest.raises(ValueError, match="reference_image"):
            exp_im.reinhard_normalize(np.full((8, 8, 3), 100, np.uint8))

    def test_estimate_white_point_recovers_background(self):
        rng = np.random.default_rng(7)
        img = np.full((60, 60, 3), 40.0)          # dark tissue
        img[:30] = [236.0, 234.0, 238.0]          # bright background half
        img += rng.normal(0, 1.0, img.shape)
        wp = exp_im.estimate_white_point(img)
        np.testing.assert_allclose(wp, [236, 234, 238], atol=2.0)


class TestStitchedLabelsBehaviors:
    """make_stitched_labels behaviors from the reference suite
    (/root/reference/tests/experimental/test_stitched_labels.py)."""

    @staticmethod
    def _qc_and_cut(min_confidence=0.3):
        labels, _ = _synthetic_cells(size=200, n_side=4, spacing=35)
        cut = labels.copy()
        next_id = labels.max() + 1
        for lid in np.unique(labels):
            if lid and (labels[:, :100] == lid).any() and (labels[:, 100:] == lid).any():
                right = cut == lid
                right[:, :100] = False
                cut[right] = next_id
                next_id += 1
        qc = exp_tl.calculate_tiling_qc(cut, tile_size=100)
        exp_tl.assign_stitch_groups(cut, qc, tile_size=100, min_confidence=min_confidence)
        return cut, qc

    def test_original_labels_unchanged(self):
        cut, qc = self._qc_and_cut()
        before = cut.copy()
        exp_im.make_stitched_labels(cut, qc)
        np.testing.assert_array_equal(cut, before)

    def test_remap_unifies_stitched_pieces(self):
        cut, qc = self._qc_and_cut()
        res = exp_im.make_stitched_labels(cut, qc)
        obs = qc.obs
        for gid, grp in obs.groupby("stitch_group_id"):
            if len(grp) < 2:
                continue
            for lab in grp["label"]:
                # every member's pixels now carry the group id
                assert (res["labels"][cut == int(lab)] == int(gid)).all()

    def test_unstitched_pieces_keep_their_id(self):
        cut, qc = self._qc_and_cut()
        res = exp_im.make_stitched_labels(cut, qc)
        obs = qc.obs
        singles = obs.groupby("stitch_group_id").filter(lambda g: len(g) == 1)
        for lab in singles["label"]:
            assert (res["labels"][cut == int(lab)] == int(lab)).all()

    def test_join_labels_closes_cut_stripe(self):
        from scipy import ndimage as ndi

        cut, qc = self._qc_and_cut()
        plain = exp_im.make_stitched_labels(cut, qc)["labels"]
        joined = exp_im.make_stitched_labels(cut, qc, join_labels=True, join_close_radius=3)["labels"]
        multi = [
            int(g) for g, grp in qc.obs.groupby("stitch_group_id") if len(grp) >= 2
        ]
        assert multi
        for gid in multi:
            # plain remap leaves the cut stripe: >1 connected component
            _, n_plain = ndi.label(plain == gid)
            _, n_joined = ndi.label(joined == gid)
            assert n_joined <= n_plain
            assert n_joined == 1
        # joining only fills background: other cells' pixels never overwritten
        changed = joined != plain
        assert (plain[changed] == 0).all()

    def test_collapsed_table_one_row_per_group(self):
        cut, qc = self._qc_and_cut()
        res = exp_im.make_stitched_labels(cut, qc)
        n_groups = qc.obs["stitch_group_id"].nunique()
        assert res["table"].shape[0] == n_groups

    @pytest.mark.parametrize("strategy", ["sum", "mean"])
    def test_merge_strategies(self, strategy):
        # user numeric obs columns aggregate via merge_strategy and STAY in
        # obs (X carries the QC score matrix, aggregated separately)
        cut, qc = self._qc_and_cut()
        qc.obs["metric"] = np.arange(len(qc.obs), dtype=float)
        res = exp_im.make_stitched_labels(cut, qc, merge_strategy=strategy)
        tab = res["table"]
        want = qc.obs.groupby("stitch_group_id")["metric"].agg(strategy)
        got = dict(zip(tab.obs["stitch_group_id"], tab.obs["metric"]))
        for gid, v in want.items():
            np.testing.assert_allclose(got[int(gid)], v)

    def test_merge_strategy_callable(self):
        cut, qc = self._qc_and_cut()
        qc.obs["metric"] = np.arange(len(qc.obs), dtype=float)
        res = exp_im.make_stitched_labels(cut, qc, merge_strategy=lambda s: s.max())
        tab = res["table"]
        want = qc.obs.groupby("stitch_group_id")["metric"].max()
        got = dict(zip(tab.obs["stitch_group_id"], tab.obs["metric"]))
        for gid, v in want.items():
            np.testing.assert_allclose(got[int(gid)], v)

    def test_missing_groups_raises(self):
        labels, _ = _synthetic_cells(size=120, n_side=2)
        qc = exp_tl.calculate_tiling_qc(labels, tile_size=60)
        with pytest.raises(KeyError, match="stitch_group_id"):
            exp_im.make_stitched_labels(labels, qc)

    def test_idempotent(self):
        cut, qc = self._qc_and_cut()
        res1 = exp_im.make_stitched_labels(cut, qc)
        stitched = res1["labels"]
        qc2 = exp_tl.calculate_tiling_qc(stitched, tile_size=100)
        exp_tl.assign_stitch_groups(stitched, qc2, tile_size=100, min_confidence=0.3)
        res2 = exp_im.make_stitched_labels(stitched, qc2)
        # re-running on the stitched output leaves label count stable or lower
        assert len(np.unique(res2["labels"])) <= len(np.unique(stitched))

    def test_unmapped_label_passes_through(self):
        from squidpy_tpu.experimental.im._stitched_labels import _apply_lut

        arr = np.array([[0, 5, 9], [9, 5, 0]])
        out = _apply_lut(arr, {5: 2})
        np.testing.assert_array_equal(out, np.array([[0, 2, 9], [9, 2, 0]]))


class TestTilingQCBehaviors:
    def test_returns_anndata_with_scores(self):
        labels, _ = _synthetic_cells(size=200, n_side=4, spacing=35)
        qc = exp_tl.calculate_tiling_qc(labels, tile_size=100)
        for col in ("label", "tile_cut", "cut_score", "straight_v", "straight_h"):
            assert col in qc.obs
        assert "spatial" in qc.obsm
        cent = np.asarray(qc.obsm["spatial"])
        assert (cent >= 0).all() and (cent <= 200).all()

    def test_clean_dataset_few_flags(self):
        """Intact cells away from borders: nothing (or nearly nothing) is cut."""
        labels, _ = _synthetic_cells(size=200, n_side=3, spacing=50)
        qc = exp_tl.calculate_tiling_qc(labels, tile_size=200)  # one tile, no borders
        assert np.asarray(qc.obs["tile_cut"], dtype=bool).mean() < 0.2

    def test_tiled_vs_single_tile_same_cells(self):
        labels, _ = _synthetic_cells(size=200, n_side=4, spacing=35)
        qc_one = exp_tl.calculate_tiling_qc(labels, tile_size=200)
        qc_four = exp_tl.calculate_tiling_qc(labels, tile_size=100)
        assert set(qc_one.obs["label"]) == set(qc_four.obs["label"])


class TestMakeTilesBehaviors:
    def test_tile_size_respected(self):
        mask = np.zeros((300, 300), bool)
        mask[:150, :150] = True
        tiles = exp_im.make_tiles(np.zeros((300, 300)), tissue_mask=mask, tile_size=(150, 100))
        assert (tiles["pixel_y1"] - tiles["pixel_y0"]).max() == 150
        assert (tiles["pixel_x1"] - tiles["pixel_x0"]).max() == 100

    def test_min_tissue_fraction_moves_boundary(self):
        mask = np.zeros((200, 200), bool)
        mask[:100, :150] = True  # covers 1.5 of the two top tiles
        strict = exp_im.make_tiles(np.zeros((200, 200)), tissue_mask=mask, tile_size=(100, 100),
                                   min_tissue_fraction=1.0)
        lax = exp_im.make_tiles(np.zeros((200, 200)), tissue_mask=mask, tile_size=(100, 100),
                                min_tissue_fraction=0.4)
        n_tissue_strict = (strict["tile_classification"] == "tissue").sum()
        n_tissue_lax = (lax["tile_classification"] == "tissue").sum()
        assert n_tissue_lax > n_tissue_strict

    def test_from_spots_tile_centers_on_spots(self):
        spots = np.array([[40.0, 40.0], [40.0, 80.0], [80.0, 40.0], [80.0, 80.0]])
        tiles = exp_im.make_tiles_from_spots(spots)
        cy = (tiles["pixel_y0"] + tiles["pixel_y1"]) / 2
        cx = (tiles["pixel_x0"] + tiles["pixel_x1"]) / 2
        got = np.sort(np.stack([cy, cx], axis=1), axis=0)
        np.testing.assert_allclose(got, np.sort(spots, axis=0))


class TestDeriveMpp:
    """derive_mpp methods + validation, ported from the reference's
    tests/experimental/test_derive_mpp.py (16 cases adapted to the
    array-first API)."""

    @staticmethod
    def _hex_lattice(pitch=50.0, n=12):
        pts = []
        for r in range(n):
            for c in range(n):
                x = c * pitch + (pitch / 2 if r % 2 else 0.0)
                y = r * pitch * np.sqrt(3) / 2
                pts.append((x, y))
        return np.asarray(pts)

    @staticmethod
    def _squares(edge=8.0, n=16, rot=0.0):
        rng = np.random.default_rng(0)
        base = np.array([[0, 0], [edge, 0], [edge, edge], [0, edge]], float)
        c, s = np.cos(rot), np.sin(rot)
        base = base @ np.array([[c, -s], [s, c]]).T
        return [base + rng.uniform(0, 500, 2) for _ in range(n)]

    from squidpy_tpu.experimental.utils import derive_mpp as _dm

    def test_pitch_identity_transform(self):
        from squidpy_tpu.experimental.utils import derive_mpp

        pts = self._hex_lattice(pitch=50.0)
        got = derive_mpp(pts, um_between_centers=100.0)
        np.testing.assert_allclose(got, 2.0, rtol=1e-9)  # 100 um / 50 px

    def test_pitch_with_scale_transform(self):
        from squidpy_tpu.experimental.utils import derive_mpp

        pts = self._hex_lattice(pitch=50.0)
        got = derive_mpp(pts, um_between_centers=100.0, transform=np.diag([0.5, 0.5]))
        np.testing.assert_allclose(got, 4.0, rtol=1e-9)

    def test_pitch_rotation_preserved(self):
        from squidpy_tpu.experimental.utils import derive_mpp

        pts = self._hex_lattice(pitch=40.0)
        th = 0.3
        rot = np.array([[np.cos(th), -np.sin(th), 7.0], [np.sin(th), np.cos(th), -3.0]])
        got = derive_mpp(pts, um_between_centers=100.0, transform=rot)
        np.testing.assert_allclose(got, 2.5, rtol=1e-9)

    def test_pitch_large_grid_subsampled(self):
        from squidpy_tpu.experimental.utils import derive_mpp

        n = 80  # 6400 > 5000 sample cap
        yy, xx = np.mgrid[0:n, 0:n].astype(float)
        pts = np.stack([xx.ravel() * 10, yy.ravel() * 10], axis=1)
        got = derive_mpp(pts, um_between_centers=20.0)
        np.testing.assert_allclose(got, 2.0, rtol=1e-9)

    def test_diameter_points(self):
        from squidpy_tpu.experimental.utils import derive_mpp

        pts = self._hex_lattice()
        radii = np.full(len(pts), 27.5)
        got = derive_mpp(pts, um_diameter=55.0, radii=radii)
        np.testing.assert_allclose(got, 1.0, rtol=1e-9)

    def test_diameter_with_scale(self):
        from squidpy_tpu.experimental.utils import derive_mpp

        pts = self._hex_lattice()
        got = derive_mpp(pts, um_diameter=55.0, radii=np.full(len(pts), 27.5), transform=np.diag([2.0, 2.0]))
        np.testing.assert_allclose(got, 0.5, rtol=1e-9)

    def test_square_edge_polygons(self):
        from squidpy_tpu.experimental.utils import derive_mpp

        got = derive_mpp(self._squares(edge=8.0), um_square_edge=16.0)
        np.testing.assert_allclose(got, 2.0, rtol=1e-9)

    def test_square_edge_rotated_squares_ok(self):
        from squidpy_tpu.experimental.utils import derive_mpp

        got = derive_mpp(self._squares(edge=10.0, rot=0.4), um_square_edge=10.0)
        np.testing.assert_allclose(got, 1.0, rtol=1e-9)

    def test_diameter_on_polygons_rejected(self):
        from squidpy_tpu.experimental.utils import derive_mpp

        with pytest.raises(ValueError, match="um_square_edge"):
            derive_mpp(self._squares(), um_diameter=55.0, radii=[1.0])

    def test_square_edge_on_points_rejected(self):
        from squidpy_tpu.experimental.utils import derive_mpp

        with pytest.raises(ValueError, match="polygon"):
            derive_mpp(self._hex_lattice(), um_square_edge=16.0)

    def test_non_square_polygons_rejected(self):
        from squidpy_tpu.experimental.utils import derive_mpp

        tri = [np.array([[0, 0], [10, 0], [5, 9.0]]) + off for off in np.random.default_rng(1).uniform(0, 100, (12, 2))]
        with pytest.raises(ValueError, match="square/rectangular"):
            derive_mpp(tri, um_square_edge=10.0)

    def test_anisotropy_rejected(self):
        from squidpy_tpu.experimental.utils import derive_mpp

        with pytest.raises(ValueError, match="anisotropic"):
            derive_mpp(self._hex_lattice(), um_between_centers=100.0, transform=np.diag([1.0, 2.0]))

    def test_three_d_rejected(self):
        from squidpy_tpu.experimental.utils import derive_mpp

        with pytest.raises(ValueError, match="3D"):
            derive_mpp(np.zeros((5, 3)), um_between_centers=100.0)

    def test_single_shape_pitch_rejected(self):
        from squidpy_tpu.experimental.utils import derive_mpp

        with pytest.raises(ValueError, match="single shape"):
            derive_mpp(np.array([[1.0, 2.0]]), um_between_centers=100.0)

    def test_single_shape_diameter_works(self):
        from squidpy_tpu.experimental.utils import derive_mpp

        got = derive_mpp(np.array([[1.0, 2.0]]), um_diameter=55.0, radii=[27.5])
        np.testing.assert_allclose(got, 1.0)

    @pytest.mark.parametrize(
        "kwargs",
        [{}, {"um_between_centers": 1.0, "um_diameter": 1.0},
         {"um_between_centers": 1.0, "um_diameter": 1.0, "um_square_edge": 1.0}],
    )
    def test_mutex_args_rejected(self, kwargs):
        from squidpy_tpu.experimental.utils import derive_mpp

        with pytest.raises(ValueError, match="exactly one"):
            derive_mpp(self._hex_lattice(), **kwargs)

    def test_empty_rejected(self):
        from squidpy_tpu.experimental.utils import derive_mpp

        with pytest.raises(ValueError, match="empty"):
            derive_mpp(np.zeros((0, 2)), um_between_centers=100.0)


class TestRunTiledDevices:
    """run_tiled round-robins tiles over the local device mesh (the SURVEY
    §2.2 multi-node tile-execution row)."""

    def test_tiles_land_on_distinct_devices(self):
        import jax
        import jax.numpy as jnp

        labels, _ = _synthetic_cells(size=200, n_side=4, spacing=45)
        info = exp_im.compute_cell_info(labels)
        specs = exp_im.build_tile_specs(labels.shape, info, tile_size=50)
        seen = []

        def probe(spec):
            arr = jnp.zeros(4) + 1  # computed under the worker's default_device
            seen.append(next(iter(arr.devices())))
            return float(arr.sum())

        out = exp_im.run_tiled(specs, probe, n_jobs=4)
        assert len(out) == len(specs)
        assert len(set(seen)) > 1  # 8-device CPU mesh: tiles spread out

    def test_devices_single_pins_default(self):
        import jax
        import jax.numpy as jnp

        labels, _ = _synthetic_cells(size=120, n_side=2)
        info = exp_im.compute_cell_info(labels)
        specs = exp_im.build_tile_specs(labels.shape, info, tile_size=60)
        seen = []

        def probe(spec):
            arr = jnp.zeros(2) + 1
            seen.append(next(iter(arr.devices())))
            return 0

        exp_im.run_tiled(specs, probe, n_jobs=2, devices="single")
        assert set(seen) == {jax.devices()[0]}

    def test_multidevice_featurization_matches_serial(self):
        labels, image = _synthetic_cells(size=200, n_side=4, spacing=45)
        a1 = exp_im.calculate_image_features(image, labels, tile_size=60, n_jobs=1)
        a4 = exp_im.calculate_image_features(image, labels, tile_size=60, n_jobs=4)
        assert list(a1.var_names) == list(a4.var_names)
        np.testing.assert_allclose(np.asarray(a1.X), np.asarray(a4.X), rtol=1e-6)


class TestQCImageBehaviors:
    """Tissue classification + unfocus scoring parity with the reference's
    qc_image (tests/experimental/test_qc_image.py:86-210)."""

    @staticmethod
    def _slide():
        rng = np.random.default_rng(0)
        img = np.full((256, 512), 0.95, np.float32)           # bright background
        img[:, 256:] = rng.uniform(0.2, 0.6, (256, 256))      # textured tissue right half
        return img

    def test_detect_tissue_columns(self):
        qc = exp_im.qc_image(self._slide(), tile_size=128, detect_tissue=True)
        assert "is_tissue" in qc.obs and "is_background" in qc.obs
        tiss = qc.obs["is_tissue"].to_numpy() == "True"
        assert tiss.any() and (~tiss).any()
        # right-half tiles are the tissue ones
        assert (qc.obs.loc[tiss, "x0"] >= 256).all()

    def test_unfocus_score_with_tissue_restricted(self):
        qc = exp_im.qc_image(self._slide(), tile_size=128, detect_tissue=True)
        uf = qc.obs["unfocus_score"].to_numpy(dtype=float)
        tiss = qc.obs["is_tissue"].to_numpy() == "True"
        assert np.isnan(uf[~tiss]).all()
        assert np.isfinite(uf[tiss]).all()
        assert (uf[tiss] >= 0).all() and (uf[tiss] <= 1).all()

    def test_unfocus_blurry_tile_scores_worst(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 1, (128, 512)).astype(np.float32)
        img[:, 384:] = 0.5  # constant (perfectly blurry) last tile
        qc = exp_im.qc_image(img, tile_size=128, metrics=["tenengrad", "var_of_laplacian"])
        uf = qc.obs["unfocus_score"].to_numpy(dtype=float)
        assert np.argmax(uf) == 3
        np.testing.assert_allclose(uf[3], 1.0)

    def test_detect_outliers_false_skips_columns(self):
        qc = exp_im.qc_image(self._slide(), tile_size=128, detect_outliers=False)
        assert "unfocus_score" not in qc.obs
        assert not any(c.endswith("_outlier_low") for c in qc.obs.columns)

    def test_tissue_fraction_not_added_to_X_when_unrequested(self):
        qc = exp_im.qc_image(self._slide(), tile_size=128, metrics=["tenengrad"], detect_tissue=True)
        assert list(qc.var_names) == ["qc_tenengrad"]
        assert "is_tissue" in qc.obs


class TestStitchScoring:
    """Cut-edge pairing + 5-feature scoring behaviors (reference:
    /root/reference/tests/experimental/test_tiling_stitch.py)."""

    @staticmethod
    def _corner_cut(radius=30, extra_intact=True):
        """Disk cut into 4 quarters at a (100,100) tile corner + an intact disk."""
        lab = np.zeros((200, 200), np.int32)
        yy, xx = np.mgrid[:200, :200]
        disk = ((yy - 100) ** 2 + (xx - 100) ** 2) <= radius ** 2
        lab[disk & (yy < 100) & (xx < 100)] = 1
        lab[disk & (yy < 100) & (xx >= 100)] = 2
        lab[disk & (yy >= 100) & (xx < 100)] = 3
        lab[disk & (yy >= 100) & (xx >= 100)] = 4
        if extra_intact:
            lab[((yy - 40) ** 2 + (xx - 40) ** 2) <= 15 ** 2] = 5
        return lab

    @classmethod
    def _qc(cls, lab, outliers):
        qc = exp_tl.calculate_tiling_qc(lab, tile_size=100)
        qc.obs["is_outlier"] = qc.obs["label"].isin(outliers)
        return qc

    def test_corner_group_reassembled(self):
        lab = self._corner_cut()
        qc = self._qc(lab, [1, 2, 3, 4])
        obs = exp_tl.assign_stitch_groups(lab, qc, min_confidence=0.4)
        quarters = obs[obs["label"].isin([1, 2, 3, 4])]
        assert quarters["is_stitched"].all()
        assert quarters["stitch_group_id"].nunique() == 1
        assert (quarters["n_pieces"] == 4).all()
        # all four seam pairs found and scored high
        pairs = qc.uns["tiling_stitch"]["pair_features"]
        assert len(pairs) == 4
        assert (pairs["confidence"] > 0.8).all()

    def test_confidence_conventions(self):
        lab = self._corner_cut()
        qc = self._qc(lab, [1, 2, 3, 4, 5])  # intact disk 5 flagged too (solo)
        obs = exp_tl.assign_stitch_groups(lab, qc, min_confidence=0.4)
        # never-evaluated cells: NaN; checked solos: 1.0; stitched: composite
        row5 = obs[obs["label"] == 5].iloc[0]
        assert row5["stitch_confidence"] == 1.0 and not row5["is_stitched"]
        stitched = obs[obs["is_stitched"].astype(bool)]
        assert ((stitched["stitch_confidence"] > 0) & (stitched["stitch_confidence"] <= 1)).all()

    def test_unevaluated_cells_are_nan(self):
        lab = self._corner_cut()
        qc = self._qc(lab, [1, 2, 3, 4])
        obs = exp_tl.assign_stitch_groups(lab, qc, min_confidence=0.4)
        assert np.isnan(obs.loc[obs["label"] == 5, "stitch_confidence"]).all()

    def test_high_threshold_blocks_weak_pairs(self):
        lab = self._corner_cut()
        qc = self._qc(lab, [1, 2, 3, 4])
        obs = exp_tl.assign_stitch_groups(lab, qc, min_confidence=0.999)
        assert not obs["is_stitched"].any()

    def test_oversized_group_collapses_to_singletons(self):
        # 5 stacked slabs from one tall rectangle -> chain of 5 > max_group_size 4
        lab = np.zeros((250, 80), np.int32)
        for i in range(5):
            lab[i * 50 : (i + 1) * 50, 20:60] = i + 1
        qc = self._qc(lab, [1, 2, 3, 4, 5])
        obs = exp_tl.assign_stitch_groups(lab, qc, min_confidence=0.4, max_group_size=4)
        assert not obs["is_stitched"].any()
        assert (obs["stitch_group_id"] == obs["label"]).all()
        # confirmed solos get confidence 1.0 (evaluated, collapsed)
        assert (obs["stitch_confidence"] == 1.0).all()

    def test_chain_within_cap_assembles(self):
        lab = np.zeros((150, 80), np.int32)
        for i in range(3):
            lab[i * 50 : (i + 1) * 50, 20:60] = i + 1
        qc = self._qc(lab, [1, 2, 3])
        obs = exp_tl.assign_stitch_groups(lab, qc, min_confidence=0.4)
        assert obs["is_stitched"].all()
        assert obs["stitch_group_id"].nunique() == 1
        assert (obs["n_pieces"] == 3).all()

    def test_non_facing_edges_not_paired(self):
        # two squares far apart vertically: bottom edge of 1 and top edge of 2
        # are 40 px apart -> outside max_gap, no pair
        lab = np.zeros((200, 80), np.int32)
        lab[10:50, 20:60] = 1
        lab[90:130, 20:60] = 2
        qc = self._qc(lab, [1, 2])
        obs = exp_tl.assign_stitch_groups(lab, qc, min_confidence=0.2, max_gap=3.0)
        assert not obs["is_stitched"].any()

    def test_concave_union_scores_below_straight_cut(self):
        # same-size squares offset by half their width: chords overlap partially,
        # and the L-shaped union drops compactness/solidity vs the aligned cut
        lab_aligned = np.zeros((120, 120), np.int32)
        lab_aligned[20:60, 30:90] = 1
        lab_aligned[60:100, 30:90] = 2
        lab_offset = np.zeros((120, 120), np.int32)
        lab_offset[20:60, 10:70] = 1
        lab_offset[60:100, 50:110] = 2
        scores = {}
        for name, lab in (("aligned", lab_aligned), ("offset", lab_offset)):
            qc = self._qc(lab, [1, 2])
            exp_tl.assign_stitch_groups(lab, qc, min_confidence=0.0)
            pf = qc.uns["tiling_stitch"]["pair_features"]
            scores[name] = float(pf["confidence"].max()) if len(pf) else 0.0
        assert scores["aligned"] > scores["offset"]

    def test_uns_metadata_recorded(self):
        lab = self._corner_cut()
        qc = self._qc(lab, [1, 2, 3, 4])
        exp_tl.assign_stitch_groups(lab, qc, min_confidence=0.4, max_gap=4.0)
        meta = qc.uns["tiling_stitch"]
        assert meta["params"]["max_gap"] == 4.0
        assert set(meta["score_features"]) == {
            "iou", "endpoint_match", "merge_compactness", "merge_solidity", "gap_proximity",
        }
        assert meta["n_stitched_groups"] == 1 and meta["n_stitched_cells"] == 4
        for col in ("iou", "endpoint_match", "gap_proximity", "merge_compactness", "merge_solidity"):
            assert col in meta["pair_features"].columns

    def test_inplace_false_leaves_obs(self):
        lab = self._corner_cut()
        qc = self._qc(lab, [1, 2, 3, 4])
        cols_before = list(qc.obs.columns)
        out = exp_tl.assign_stitch_groups(lab, qc, min_confidence=0.4, inplace=False)
        assert "stitch_group_id" in out.columns
        assert list(qc.obs.columns) == cols_before

    def test_missing_flags_raise(self):
        lab = self._corner_cut()
        qc = exp_tl.calculate_tiling_qc(lab, tile_size=100)
        qc.obs = qc.obs.drop(columns=["tile_cut", "is_outlier"])
        with pytest.raises(KeyError, match="calculate_tiling_qc"):
            exp_tl.assign_stitch_groups(lab, qc)

    def test_curved_boundary_produces_no_edges(self):
        # an intact disk grazes its bbox at single points -> no chords
        from squidpy_tpu.experimental.tl._tiling_stitch import StitchParams, _extract_cut_edges

        lab = np.zeros((100, 100), np.int32)
        yy, xx = np.mgrid[:100, :100]
        lab[((yy - 50) ** 2 + (xx - 50) ** 2) <= 20 ** 2] = 1
        edges, _ = _extract_cut_edges(lab, [1], {1: (30, 30, 71, 71)}, StitchParams())
        assert edges == []

    def test_cut_piece_produces_facing_edge(self):
        from squidpy_tpu.experimental.tl._tiling_stitch import StitchParams, _extract_cut_edges

        lab = np.zeros((100, 100), np.int32)
        yy, xx = np.mgrid[:100, :100]
        disk = ((yy - 50) ** 2 + (xx - 50) ** 2) <= 20 ** 2
        lab[disk & (yy < 50)] = 1  # top half only: flat bottom edge
        edges, crops = _extract_cut_edges(lab, [1], {1: (30, 30, 50, 71)}, StitchParams())
        assert len(edges) == 1
        e = edges[0]
        assert e.axis == "h" and e.normal == -1 and e.coord == 49.5
        assert 1 in crops


class TestQCImagePlotAnatomy:
    """3-panel qc_image plot (spatial map / KDE / stats), reference:
    /root/reference/src/squidpy/experimental/pl/_qc_image.py:45-199."""

    @staticmethod
    def _qc():
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (256, 256)).astype(np.float32)
        img[:128] *= 0.2  # darker half -> classified as non-tissue
        return exp_im.qc_image(img, tile_size=64, metrics=["tenengrad", "brightness_mean"],
                               detect_tissue=True)

    def test_rows_per_metric_with_three_panels(self):
        from squidpy_tpu.experimental import pl as exp_pl

        axes = exp_pl.qc_image(self._qc(), return_ax=True)
        assert axes.shape == (2, 3)

    def test_metric_subset_and_unknown_raises(self, tmp_path):
        from squidpy_tpu.experimental import pl as exp_pl

        qc = self._qc()
        axes = exp_pl.qc_image(qc, metrics=["tenengrad"], return_ax=True,
                               save=str(tmp_path / "one.png"))
        assert axes.shape == (1, 3)
        assert (tmp_path / "one.png").exists()
        with pytest.raises(ValueError, match="not found"):
            exp_pl.qc_image(qc, metrics=["bogus"])

    def test_constant_metric_renders_text(self):
        from squidpy_tpu.experimental import pl as exp_pl

        qc = self._qc()
        qc.X[:, 0] = 1.0  # constant column -> KDE panel falls back to text
        axes = exp_pl.qc_image(qc, metrics=[qc.var_names[0]], return_ax=True)
        assert axes.shape == (1, 3)


class TestDetectTissueMaskKnobs:
    """Labeled-specimen output, bounded hole filling and edge smoothing
    (reference: /root/reference/src/squidpy/experimental/im/_detect_tissue.py:219-226)."""

    @staticmethod
    def _slide():
        rng = np.random.default_rng(0)
        img = np.full((300, 300), 0.9, np.float32)
        yy, xx = np.mgrid[:300, :300]
        img[((yy - 80) ** 2 + (xx - 80) ** 2) <= 50 ** 2] = 0.3   # specimen 1
        img[((yy - 210) ** 2 + (xx - 210) ** 2) <= 40 ** 2] = 0.35  # specimen 2
        img[((yy - 80) ** 2 + (xx - 80) ** 2) <= 6 ** 2] = 0.9   # small hole in 1
        return img + rng.normal(0, 0.01, img.shape).astype(np.float32)

    def test_label_components_returns_int_ids(self):
        labeled = exp_im.detect_tissue(self._slide(), downscale_to=300,
                                       label_components=True)
        assert labeled.dtype == np.int32
        ids = set(np.unique(labeled)) - {0}
        assert len(ids) == 2

    def test_bounded_hole_filling(self):
        img = self._slide()
        # bound below the hole size: the hole survives
        m_keep = exp_im.detect_tissue(img, downscale_to=300,
                                      close_holes_smaller_than_frac=1e-5, sigma=0.5)
        # bound above the hole size: the hole is filled
        m_fill = exp_im.detect_tissue(img, downscale_to=300,
                                      close_holes_smaller_than_frac=0.01, sigma=0.5)
        assert int(m_fill.sum()) > int(m_keep.sum())
        assert not m_keep[80, 80] and m_fill[80, 80]

    def test_smoothing_cycles_reduce_perimeter(self):
        rng = np.random.default_rng(1)
        img = self._slide() + rng.normal(0, 0.15, (300, 300)).astype(np.float32)
        m0 = exp_im.detect_tissue(img, downscale_to=300, sigma=0.0, close_holes=False)
        m2 = exp_im.detect_tissue(img, downscale_to=300, sigma=0.0, close_holes=False,
                                  mask_smoothing_cycles=2)

        def perim(m):
            return int((m[:, 1:] != m[:, :-1]).sum() + (m[1:, :] != m[:-1, :]).sum())

        assert perim(m2) < perim(m0)


class TestCalculateFeaturesKnobs:
    """channels / invalid_as_zero / drop_constant_features (reference kwargs,
    /root/reference/src/squidpy/experimental/im/_calculate_image_features.py:881-887)."""

    @staticmethod
    def _pair():
        labels, image = _synthetic_cells(size=200, n_side=4, spacing=35)
        rgb = np.stack([image, image * 0.5, np.zeros_like(image)], axis=-1)
        return rgb, labels

    def test_channels_subset(self):
        rgb, labels = self._pair()
        a_all = exp_im.calculate_image_features(rgb, labels, features="squidpy:summary")
        a_sub = exp_im.calculate_image_features(rgb, labels, features="squidpy:summary", channels=[0])
        assert a_sub.n_vars < a_all.n_vars
        assert all("ch-0" in v or "ch0" in v or "0" in v for v in a_sub.var_names)

    def test_channels_out_of_range(self):
        rgb, labels = self._pair()
        with pytest.raises(ValueError, match="out of range"):
            exp_im.calculate_image_features(rgb, labels, features="squidpy:summary", channels=[7])

    def test_drop_constant_features(self):
        rgb, labels = self._pair()  # channel 2 is all zeros -> constant columns
        a_keep = exp_im.calculate_image_features(rgb, labels, features="squidpy:summary")
        a_drop = exp_im.calculate_image_features(rgb, labels, features="squidpy:summary",
                                                 drop_constant_features=True)
        assert a_drop.n_vars < a_keep.n_vars
        assert np.nanstd(np.asarray(a_drop.X), axis=0).min() > 0

    def test_invalid_as_zero(self):
        rgb, labels = self._pair()
        a = exp_im.calculate_image_features(rgb, labels, features="skimage:morphology",
                                            invalid_as_zero=True)
        assert np.isfinite(np.asarray(a.X)).all()


def test_tiling_qc_no_neighbors_self_fraction():
    """n_neighbors=0: nhood_outlier_fraction must reflect each cell itself,
    not cell 0 (regression: the fallback neighbor index pointed all cells
    at row 0)."""
    labels = np.zeros((120, 120), np.int32)
    labels[10:50, 10:30] = 1
    labels[10:50, 32:58] = 2
    labels[70:100, 70:100] = 3
    qc = exp_tl.calculate_tiling_qc(labels, tile_size=60, n_neighbors=0)
    frac = qc.obs["nhood_outlier_fraction"].to_numpy(dtype=float)
    smoothed = qc.obs["smoothed_cut_score"].to_numpy(dtype=float)
    med = np.median(smoothed)
    mad = np.median(np.abs(smoothed - med)) or 1e-9
    own_outlier = smoothed > med + 3.0 * mad * 1.4826
    np.testing.assert_array_equal(frac, own_outlier.astype(float))


class TestWhitePointUtilities:
    """Dtype-aware I_0 handling (reference:
    tests/experimental/test_stain_white_point.py)."""

    def test_default_white_point_dtypes(self):
        assert (exp_im.default_white_point(np.zeros((4, 4, 3), np.uint8)) == 255.0).all()
        assert (exp_im.default_white_point(np.zeros((4, 4, 3), np.uint16)) == 65535.0).all()
        assert (exp_im.default_white_point(np.zeros((4, 4, 3), np.float32)) == 1.0).all()

    def test_validate_passes_on_uint8(self):
        exp_im.validate_rgb_range((np.ones((4, 4, 3)) * 200).astype(np.uint8))

    def test_validate_passes_on_float_unit_range(self):
        exp_im.validate_rgb_range(np.full((4, 4, 3), 0.8, np.float32))

    def test_validate_raises_on_8bit_in_uint16(self):
        with pytest.raises(ValueError, match="8-bit data stored in a uint16"):
            exp_im.validate_rgb_range((np.ones((4, 4, 3)) * 200).astype(np.uint16))

    def test_background_median_recovered(self):
        img = np.full((20, 20, 3), 50, np.uint8)
        img[:10] = [240, 235, 230]  # background half
        mask = np.zeros((20, 20), bool)
        mask[:10] = True
        wp = exp_im.white_point_from_background(img, mask)
        np.testing.assert_allclose(wp, [240, 235, 230])

    def test_background_requires_pixels(self):
        img = np.full((8, 8, 3), 100, np.uint8)
        with pytest.raises(ValueError, match="selects no pixels"):
            exp_im.white_point_from_background(img, np.zeros((8, 8), bool))

    def test_background_mask_shape_checked(self):
        img = np.full((8, 8, 3), 100, np.uint8)
        with pytest.raises(ValueError, match="does not match"):
            exp_im.white_point_from_background(img, np.ones((4, 4), bool))
