"""Golden-image plot tests.

Pixel comparison against committed baselines via
``matplotlib.testing.compare.compare_images`` — the reference's plot-testing
strategy (/root/reference/tests/conftest.py:22-36: DPI 40, TOL 50, baselines
under ``tests/_images``). Every public ``pl`` function has at least one
baseline here. Regenerate baselines after an intentional visual change with
``SQ_TPU_GENERATE_BASELINES=1 python -m pytest tests/test_plotting_golden.py``.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

import squidpy_tpu as sq

HERE = Path(__file__).parent
BASELINE_DIR = HERE / "_images"
ACTUAL_DIR = HERE / "_images" / "actual"
DPI = 40
TOL = 50


def compare_figure(name: str) -> None:
    """Save the current figure and pixel-compare it to the committed baseline."""
    from matplotlib.testing.compare import compare_images

    fig = plt.gcf()
    ACTUAL_DIR.mkdir(parents=True, exist_ok=True)
    actual = ACTUAL_DIR / f"{name}.png"
    fig.savefig(actual, dpi=DPI)
    plt.close(fig)

    baseline = BASELINE_DIR / f"{name}.png"
    if not baseline.exists():
        if os.environ.get("SQ_TPU_GENERATE_BASELINES"):
            shutil.copy(actual, baseline)
            return
        raise AssertionError(
            f"Missing baseline `{baseline}`. Generate with SQ_TPU_GENERATE_BASELINES=1."
        )
    if os.environ.get("SQ_TPU_GENERATE_BASELINES"):
        shutil.copy(actual, baseline)
        return
    res = compare_images(str(baseline), str(actual), tol=TOL)
    assert res is None, res


@pytest.fixture(scope="module")
def golden_adata(adata_ref):
    """Deterministic analyzed dataset shared by all golden tests."""
    adata = adata_ref.copy()
    sq.gr.spatial_neighbors_knn(adata, n_neighs=6)
    sq.gr.nhood_enrichment(adata, "leiden", n_perms=50, seed=0)
    sq.gr.interaction_matrix(adata, "leiden")
    sq.gr.centrality_scores(adata, "leiden")
    sq.gr.co_occurrence(adata, "leiden", interval=10)
    sq.gr.ripley(adata, "leiden", mode="G", n_simulations=5, n_observations=50, n_steps=10, seed=0)
    return adata


@pytest.fixture(autouse=True)
def _close_figs():
    yield
    plt.close("all")


class TestGoldenGraphPlots:
    def test_nhood_enrichment(self, golden_adata):
        sq.pl.nhood_enrichment(golden_adata, "leiden")
        compare_figure("nhood_enrichment")

    def test_nhood_enrichment_dendrogram(self, golden_adata):
        sq.pl.nhood_enrichment(golden_adata, "leiden", method="ward", annotate=True)
        compare_figure("nhood_enrichment_dendrogram")

    def test_interaction_matrix(self, golden_adata):
        sq.pl.interaction_matrix(golden_adata, "leiden")
        compare_figure("interaction_matrix")

    def test_centrality_scores(self, golden_adata):
        sq.pl.centrality_scores(golden_adata, "leiden")
        compare_figure("centrality_scores")

    def test_ripley(self, golden_adata):
        sq.pl.ripley(golden_adata, "leiden", mode="G")
        compare_figure("ripley_G")

    def test_co_occurrence(self, golden_adata):
        sq.pl.co_occurrence(golden_adata, "leiden", clusters="0")
        compare_figure("co_occurrence")


class TestGoldenSpatialPlots:
    def test_scatter_categorical(self, golden_adata):
        sq.pl.spatial_scatter(golden_adata, color="leiden", img=False)
        compare_figure("spatial_scatter_categorical")

    def test_scatter_continuous(self, golden_adata):
        gene = str(golden_adata.var_names[0])
        sq.pl.spatial_scatter(golden_adata, color=gene, img=False)
        compare_figure("spatial_scatter_continuous")

    def test_scatter_outline_crop_scalebar(self, golden_adata):
        coords = np.asarray(golden_adata.obsm["spatial"])
        x0, y0 = coords.min(axis=0)
        x1, y1 = coords.max(axis=0)
        sq.pl.spatial_scatter(
            golden_adata, color="leiden", img=False, outline=True,
            crop_coord=(x0, y0, (x0 + x1) / 2, (y0 + y1) / 2),
            scalebar_dx=1.0, scalebar_units="um", size=40,
        )
        compare_figure("spatial_scatter_outline_crop_scalebar")

    def test_scatter_library_panels(self, golden_adata):
        adata = golden_adata.copy()
        n = adata.n_obs
        adata.obs["lib"] = pd.Categorical(["A"] * (n // 2) + ["B"] * (n - n // 2))
        sq.pl.spatial_scatter(adata, color="leiden", library_key="lib", img=False)
        compare_figure("spatial_scatter_library_panels")

    def test_segment(self):
        rng = np.random.default_rng(0)
        seg = np.zeros((64, 64), dtype=np.int32)
        centers = [(10, 12, 1), (30, 40, 2), (50, 20, 3), (45, 52, 4)]
        yy, xx = np.mgrid[:64, :64]
        for cy, cx, lab in centers:
            seg[(yy - cy) ** 2 + (xx - cx) ** 2 <= 36] = lab
        adata = sq.AnnData(
            X=rng.normal(size=(4, 2)),
            obs=pd.DataFrame({
                "cell_id": [1, 2, 3, 4],
                "cl": pd.Categorical(["a", "b", "a", "b"]),
            }),
        )
        adata.obsm["spatial"] = np.array([[12, 10], [40, 30], [20, 50], [52, 45]], dtype=float)
        adata.uns["spatial"] = {"lib": {"images": {"segmentation": seg}, "scalefactors": {}}}
        sq.pl.spatial_segment(
            adata, color="cl", seg_cell_id="cell_id", seg_key="segmentation", seg_outline=True
        )
        compare_figure("spatial_segment")

    def test_segment_contourpx(self):
        rng = np.random.default_rng(0)
        seg = np.zeros((64, 64), dtype=np.int32)
        centers = [(10, 12, 1), (30, 40, 2), (50, 20, 3), (45, 52, 4)]
        yy, xx = np.mgrid[:64, :64]
        for cy, cx, lab in centers:
            seg[(yy - cy) ** 2 + (xx - cx) ** 2 <= 36] = lab
        adata = sq.AnnData(
            X=rng.normal(size=(4, 2)),
            obs=pd.DataFrame({
                "cell_id": [1, 2, 3, 4],
                "cl": pd.Categorical(["a", "b", "a", "b"]),
            }),
        )
        adata.obsm["spatial"] = np.array([[12, 10], [40, 30], [20, 50], [52, 45]], dtype=float)
        adata.uns["spatial"] = {"lib": {"images": {"segmentation": seg}, "scalefactors": {}}}
        sq.pl.spatial_segment(
            adata, color="cl", seg_cell_id="cell_id", seg_key="segmentation", seg_contourpx=3
        )
        compare_figure("spatial_segment_contourpx")


class TestGoldenOtherPlots:
    def test_ligrec(self, golden_adata):
        adata = golden_adata.copy()
        genes = list(adata.var_names[:6])
        res = sq.gr.ligrec(
            adata, "leiden",
            interactions=[(genes[0], genes[1]), (genes[2], genes[3]), (genes[4], genes[5])],
            n_perms=50, seed=0, copy=True, threshold=0.0, use_raw=False,
        )
        sq.pl.ligrec(res, alpha=1.0)
        compare_figure("ligrec")

    def test_ligrec_dendrogram(self, golden_adata):
        adata = golden_adata.copy()
        genes = list(adata.var_names[:8])
        res = sq.gr.ligrec(
            adata, "leiden",
            interactions=[(genes[i], genes[i + 1]) for i in range(0, 8, 2)],
            n_perms=50, seed=0, copy=True, threshold=0.0, use_raw=False,
        )
        sq.pl.ligrec(res, dendrogram="both", alpha=0.05)
        compare_figure("ligrec_dendrogram")

    def test_var_by_distance(self, golden_adata):
        adata = golden_adata.copy()
        sq.tl.var_by_distance(adata, groups="0", cluster_key="leiden")
        sq.pl.var_by_distance(adata, var=str(adata.var_names[0]), anchor_key="0")
        compare_figure("var_by_distance")

    def test_var_by_distance_stacked(self, golden_adata):
        adata = golden_adata.copy()
        sq.tl.var_by_distance(adata, groups="0", cluster_key="leiden")
        sq.pl.var_by_distance(
            adata, var=[str(v) for v in adata.var_names[:3]], anchor_key="0",
            stack_vars=True, order=3,
        )
        compare_figure("var_by_distance_stacked")

    def test_var_by_distance_covariate(self, golden_adata):
        adata = golden_adata.copy()
        sq.tl.var_by_distance(adata, groups="0", cluster_key="leiden")
        sq.pl.var_by_distance(
            adata, var=str(adata.var_names[0]), anchor_key="0",
            covariate="leiden", order=3, line_palette="tab10",
        )
        compare_figure("var_by_distance_covariate")


class TestGoldenScatterFeatures:
    """New reference-parity scatter features: data-unit shapes, graph edges,
    category subsetting, diverging norms."""

    def test_scatter_hex_shape(self, golden_adata):
        sq.pl.spatial_scatter(golden_adata, color="leiden", img=False, shape="hex")
        compare_figure("spatial_scatter_hex")

    def test_scatter_square_shape(self, golden_adata):
        sq.pl.spatial_scatter(golden_adata, color="leiden", img=False, shape="square")
        compare_figure("spatial_scatter_square")

    def test_scatter_points_no_shape(self, golden_adata):
        sq.pl.spatial_scatter(golden_adata, color="leiden", img=False, shape=None)
        compare_figure("spatial_scatter_points")

    def test_scatter_edges(self, golden_adata):
        sq.pl.spatial_scatter(
            golden_adata, color="leiden", img=False,
            connectivity_key="spatial_connectivities", edges_width=0.8,
        )
        compare_figure("spatial_scatter_edges")

    def test_scatter_groups_subset(self, golden_adata):
        cats = list(golden_adata.obs["leiden"].cat.categories[:2])
        sq.pl.spatial_scatter(golden_adata, color="leiden", img=False, groups=cats)
        compare_figure("spatial_scatter_groups")

    def test_scatter_vcenter(self, golden_adata):
        from scipy import sparse as sp

        X = golden_adata.X
        dense = np.asarray(X.todense() if sp.issparse(X) else X, dtype=float)
        gene = str(golden_adata.var_names[int(np.argmax(dense.var(axis=0)))])
        vals = dense[:, int(np.argmax(dense.var(axis=0)))]
        center = float((vals.min() + vals.max()) / 2.0)
        sq.pl.spatial_scatter(golden_adata, color=gene, img=False, vcenter=center, cmap="coolwarm")
        compare_figure("spatial_scatter_vcenter")

    def test_scatter_over_image(self, golden_adata):
        sq.pl.spatial_scatter(golden_adata, color="leiden", img=True, img_res_key="hires")
        compare_figure("spatial_scatter_image")

    def test_scatter_frameoff(self, golden_adata):
        sq.pl.spatial_scatter(golden_adata, color="leiden", img=False, frameon=False)
        compare_figure("spatial_scatter_frameoff")


class TestGoldenContainerShow:
    """ImageContainer.show renders (reference: tests/_images/ContainerShow_*)."""

    @staticmethod
    def _cont():
        rng = np.random.default_rng(0)
        yy, xx = np.mgrid[:64, :64]
        img = np.stack(
            [
                np.sin(xx / 8.0) * 0.5 + 0.5,
                np.cos(yy / 8.0) * 0.5 + 0.5,
                ((xx + yy) % 32) / 32.0,
            ],
            axis=-1,
        ).astype(np.float32)
        cont = sq.im.ImageContainer(img, layer="image")
        seg = np.zeros((64, 64), np.int32)
        seg[10:30, 10:30] = 1
        seg[35:55, 35:55] = 2
        cont.add_img(seg, layer="seg")
        return cont

    def test_show_default(self):
        self._cont().show("image")
        compare_figure("container_show")

    def test_show_channelwise(self):
        self._cont().show("image", channelwise=True)
        compare_figure("container_show_channelwise")

    def test_show_channel_subset(self):
        self._cont().show("image", channel=0)
        compare_figure("container_show_channel0")

    def test_show_segmentation_overlay(self):
        self._cont().show("image", segmentation_layer="seg", segmentation_alpha=0.6)
        compare_figure("container_show_segmentation")
