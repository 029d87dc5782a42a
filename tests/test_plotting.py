"""Plotting smoke tests (Agg backend): every public pl function produces a
figure and saves to disk without error, fed by real upstream results."""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")

from itertools import product

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

import squidpy_tpu as sq
from squidpy_tpu._core.anndata import Raw


@pytest.fixture()
def analyzed_adata(adata_ref):
    adata = adata_ref.copy()
    sq.gr.spatial_neighbors_knn(adata, n_neighs=6)
    sq.gr.nhood_enrichment(adata, "leiden", n_perms=20, seed=0)
    sq.gr.interaction_matrix(adata, "leiden")
    sq.gr.centrality_scores(adata, "leiden")
    sq.gr.co_occurrence(adata, "leiden", interval=10)
    sq.gr.ripley(adata, "leiden", mode="G", n_simulations=3, n_observations=50, n_steps=10, seed=0)
    return adata


@pytest.fixture(autouse=True)
def _close_figs():
    yield
    plt.close("all")


class TestGraphPlots:
    def test_nhood_enrichment(self, analyzed_adata, tmp_path):
        sq.pl.nhood_enrichment(analyzed_adata, "leiden", save=str(tmp_path / "nhood.png"))
        assert (tmp_path / "nhood.png").exists()

    def test_nhood_enrichment_dendrogram(self, analyzed_adata):
        sq.pl.nhood_enrichment(analyzed_adata, "leiden", method="ward", annotate=True)

    def test_interaction_matrix(self, analyzed_adata, tmp_path):
        sq.pl.interaction_matrix(analyzed_adata, "leiden", save=str(tmp_path / "im.png"))
        assert (tmp_path / "im.png").exists()

    def test_centrality_scores(self, analyzed_adata, tmp_path):
        sq.pl.centrality_scores(analyzed_adata, "leiden", save=str(tmp_path / "cs.png"))
        assert (tmp_path / "cs.png").exists()

    def test_ripley(self, analyzed_adata, tmp_path):
        sq.pl.ripley(analyzed_adata, "leiden", mode="G", save=str(tmp_path / "rip.png"))
        assert (tmp_path / "rip.png").exists()

    def test_ripley_legend_kwargs(self, analyzed_adata):
        ax = plt.subplots()[1]
        sq.pl.ripley(analyzed_adata, "leiden", mode="G", ax=ax, legend_kwargs={"loc": "lower right", "ncols": 2})
        assert ax.get_legend() is not None

    def test_heatmap_palette_override(self, analyzed_adata, tmp_path):
        sq.pl.nhood_enrichment(analyzed_adata, "leiden", palette="Set2", save=str(tmp_path / "n1.png"))
        sq.pl.interaction_matrix(analyzed_adata, "leiden", palette=["red", "green", "blue", "orange", "purple"],
                                 save=str(tmp_path / "n2.png"))
        assert (tmp_path / "n1.png").exists() and (tmp_path / "n2.png").exists()

    def test_co_occurrence(self, analyzed_adata, tmp_path):
        sq.pl.co_occurrence(analyzed_adata, "leiden", clusters="0", save=str(tmp_path / "co.png"))
        assert (tmp_path / "co.png").exists()

    def test_missing_uns_raises(self, adata_ref):
        adata = adata_ref.copy()
        with pytest.raises(KeyError, match="nhood_enrichment"):
            sq.pl.nhood_enrichment(adata, "leiden")


class TestLigrecPlot:
    def test_dotplot(self, adata_ref, tmp_path):
        adata = adata_ref.copy()
        adata.raw = Raw(adata)
        inter = tuple(product(adata.raw.var_names[:4], adata.raw.var_names[:4]))
        res = sq.gr.ligrec(adata, "leiden", interactions=inter, n_perms=10, seed=0, copy=True)
        sq.pl.ligrec(res, save=str(tmp_path / "lig.png"))
        assert (tmp_path / "lig.png").exists()

    def test_from_uns(self, adata_ref):
        adata = adata_ref.copy()
        adata.raw = Raw(adata)
        inter = tuple(product(adata.raw.var_names[:3], adata.raw.var_names[:3]))
        sq.gr.ligrec(adata, "leiden", interactions=inter, n_perms=5, seed=0)
        sq.pl.ligrec(adata, cluster_key="leiden", pvalue_threshold=1.0)

    def test_missing_cluster_key(self, adata_ref):
        with pytest.raises(ValueError, match="cluster_key"):
            sq.pl.ligrec(adata_ref.copy())

    def test_invalid_dendrogram(self, adata_ref):
        adata = adata_ref.copy()
        adata.raw = Raw(adata)
        inter = tuple(product(adata.raw.var_names[:3], adata.raw.var_names[:3]))
        res = sq.gr.ligrec(adata, "leiden", interactions=inter, n_perms=5, seed=0, copy=True)
        with pytest.raises(ValueError, match="Invalid `dendrogram`"):
            sq.pl.ligrec(res, dendrogram="bananas")

    def test_dendrogram_orders(self, adata_ref, tmp_path):
        adata = adata_ref.copy()
        adata.raw = Raw(adata)
        inter = tuple(product(adata.raw.var_names[:4], adata.raw.var_names[:4]))
        res = sq.gr.ligrec(adata, "leiden", interactions=inter, n_perms=10, seed=0, copy=True)
        for mode in ("interacting_molecules", "interacting_clusters", "both"):
            sq.pl.ligrec(res, dendrogram=mode, save=str(tmp_path / f"lig_{mode}.png"))
            assert (tmp_path / f"lig_{mode}.png").exists()


class TestSpatialPlots:
    def test_scatter_categorical(self, adata_ref, tmp_path):
        sq.pl.spatial_scatter(adata_ref.copy(), color="leiden", img=False, save=str(tmp_path / "sc.png"))
        assert (tmp_path / "sc.png").exists()

    def test_scatter_gene(self, adata_ref):
        adata = adata_ref.copy()
        gene = adata.var_names[0]
        sq.pl.spatial_scatter(adata, color=gene, img=False)

    def test_scatter_with_image(self, adata_ref):
        adata = adata_ref.copy()
        lid = list(adata.uns["spatial"])[0]
        adata.uns["spatial"][lid]["images"] = {"hires": np.zeros((80, 80, 3), dtype=np.uint8)}
        adata.uns["spatial"][lid].setdefault("scalefactors", {})["tissue_hires_scalef"] = 0.01
        sq.pl.spatial_scatter(adata, color="leiden", img=True)

    def test_segment(self, adata_ref):
        adata = adata_ref.copy()
        lid = list(adata.uns["spatial"])[0]
        seg = np.zeros((60, 60), dtype=np.int32)
        for i in range(adata.n_obs):
            y, x = divmod(i, 8)
            seg[y * 7 : y * 7 + 5, x * 7 : x * 7 + 5] = i + 1
        adata.uns["spatial"][lid]["images"] = {"segmentation": seg}
        adata.obs["cell_id"] = np.arange(1, adata.n_obs + 1)
        sq.pl.spatial_segment(adata, color="leiden", seg_cell_id="cell_id")

    def test_unknown_color_raises(self, adata_ref):
        with pytest.raises(KeyError, match="NOT_THERE"):
            sq.pl.spatial_scatter(adata_ref.copy(), color="NOT_THERE", img=False)


class TestExtract:
    def test_extract_dataframe(self, adata_ref):
        adata = adata_ref.copy()
        adata.obsm["feats"] = pd.DataFrame(
            {"f1": np.arange(adata.n_obs), "f2": np.ones(adata.n_obs)}, index=adata.obs.index
        )
        out = sq.pl.extract(adata, "feats")
        assert "f1" in out.obs and "f2" in out.obs
        assert "f1" not in adata.obs  # original untouched

    def test_extract_array_with_prefix(self, adata_ref):
        adata = adata_ref.copy()
        out = sq.pl.extract(adata, "X_pca", prefix="pca")
        assert "pca_0" in out.obs


class TestVarByDistancePlot:
    def test_plot(self, adata_ref, tmp_path):
        adata = adata_ref.copy()
        sq.tl.var_by_distance(adata, groups="0", cluster_key="leiden")
        gene = adata.var_names[0]
        sq.pl.var_by_distance(adata, var=gene, anchor_key="0", save=str(tmp_path / "vbd.png"))
        assert (tmp_path / "vbd.png").exists()

    def test_stack_vars_and_covariate_exclusive(self, adata_ref):
        adata = adata_ref.copy()
        sq.tl.var_by_distance(adata, groups="0", cluster_key="leiden")
        with pytest.raises(ValueError, match="cannot be combined"):
            sq.pl.var_by_distance(
                adata, var=[str(v) for v in adata.var_names[:2]], anchor_key="0",
                stack_vars=True, covariate="leiden",
            )

    def test_covariate_missing(self, adata_ref):
        adata = adata_ref.copy()
        sq.tl.var_by_distance(adata, groups="0", cluster_key="leiden")
        with pytest.raises(KeyError, match="Covariate"):
            sq.pl.var_by_distance(adata, var=str(adata.var_names[0]), anchor_key="0", covariate="nope")

    def test_return_ax(self, adata_ref):
        adata = adata_ref.copy()
        sq.tl.var_by_distance(adata, groups="0", cluster_key="leiden")
        ax = sq.pl.var_by_distance(
            adata, var=str(adata.var_names[0]), anchor_key="0",
            stack_vars=False, covariate="leiden", return_ax=True,
        )
        assert ax is not None and ax.get_legend() is not None


class TestALayer:
    def test_layer_raw_switching(self):
        from squidpy_tpu.pl._utils import ALayer

        ad = sq.AnnData(
            X=np.arange(12, dtype=float).reshape(4, 3),
            var=pd.DataFrame(index=["g1", "g2", "g3"]),
            layers={"counts": 10 + np.arange(12, dtype=float).reshape(4, 3)},
        )
        ad.obs["cl"] = ["a", "a", "b", "b"]
        ad.raw = ad
        al = ALayer(ad, ["lib1", "lib2"])
        np.testing.assert_array_equal(al.get_var("g2")[0], [1, 4, 7, 10])
        al.layer = "counts"
        np.testing.assert_array_equal(al.get_var("g2")[0], [11, 14, 17, 20])
        al.raw = True
        assert al.layer is None
        np.testing.assert_array_equal(al.get_var("g2")[0], [1, 4, 7, 10])
        al.raw = False
        assert al.layer == "counts"  # restored
        assert str(al.get_obs("cl")[0].dtype) == "category"
        np.testing.assert_allclose(al.get_var("g1", normalize=True)[0], [0, 1 / 3, 2 / 3, 1])
        al.library_id = 1
        assert al.library_id == "lib2"
        with pytest.raises(KeyError, match="Invalid layer"):
            al.layer = "nope"
        with pytest.raises(AttributeError):
            ALayer(sq.AnnData(X=np.ones((2, 2))), ["l"], is_raw=True)

    def test_points_inside_triangles(self):
        from squidpy_tpu.pl._utils import _points_inside_triangles

        tri = np.array([[[0, 0], [2, 0], [0, 2]]], float)
        pts = np.array([[0.5, 0.5], [3, 3]], float)
        np.testing.assert_array_equal(_points_inside_triangles(pts, tri), [True, False])


def test_nhood_plot_after_analytic_mode(adata_ref):
    """pl.nhood_enrichment renders from analytic-mode results (same uns contract)."""
    adata = adata_ref.copy()
    sq.gr.spatial_neighbors_knn(adata, n_neighs=6)
    sq.gr.nhood_enrichment(adata, cluster_key="leiden", mode="analytic")
    sq.pl.nhood_enrichment(adata, cluster_key="leiden")
    import matplotlib.pyplot as plt

    assert plt.gcf().axes
    plt.close("all")


def test_interactive_module_is_deprecation_stub():
    """pl._interactive raises on import with the reference's removal message
    (reference: pl/_interactive/__init__.py deprecation stub)."""
    import importlib

    with pytest.raises(ImportError, match="napari-spatialdata"):
        importlib.import_module("squidpy_tpu.pl._interactive")


class TestLigrecPlotParams:
    """Parameter/error matrix from the reference's plotting/test_graph.py
    ligrec suite (means_range, alpha, groups, dendrogram, swap_axes)."""

    @pytest.fixture()
    def ligrec_result(self, adata_ref):
        adata = adata_ref.copy()
        adata.raw = Raw(adata)
        inter = tuple(product(adata.raw.var_names[:5], adata.raw.var_names[:5]))
        return sq.gr.ligrec(adata, "leiden", interactions=inter, n_perms=10, seed=0, copy=True)

    def test_invalid_alpha(self, ligrec_result):
        with pytest.raises(ValueError, match=r"in range `\[0, 1\]`"):
            sq.pl.ligrec(ligrec_result, alpha=1.2)

    def test_invalid_means_range_size(self, ligrec_result):
        with pytest.raises(ValueError, match="size `2`"):
            sq.pl.ligrec(ligrec_result, means_range=(0, 1, 2))

    def test_invalid_source_clusters(self, ligrec_result):
        with pytest.raises(ValueError, match="source_groups"):
            sq.pl.ligrec(ligrec_result, source_groups="no-such-cluster")

    def test_invalid_target_clusters(self, ligrec_result):
        with pytest.raises(ValueError, match="target_groups"):
            sq.pl.ligrec(ligrec_result, target_groups=["also-missing"])

    def test_source_groups_subset(self, ligrec_result, tmp_path):
        src = ligrec_result["means"].columns[0][0]
        sq.pl.ligrec(ligrec_result, source_groups=src, save=str(tmp_path / "src.png"))
        assert (tmp_path / "src.png").exists()

    def test_target_groups_subset(self, ligrec_result, tmp_path):
        tgt = ligrec_result["means"].columns[0][1]
        sq.pl.ligrec(ligrec_result, target_groups=[tgt], save=str(tmp_path / "tgt.png"))
        assert (tmp_path / "tgt.png").exists()

    def test_all_interactions_empty_raises(self, ligrec_result):
        import pandas as pd

        empty = pd.DataFrame(
            np.nan, index=ligrec_result["pvalues"].index, columns=ligrec_result["pvalues"].columns
        )
        with pytest.raises(ValueError, match="no interactions remain"):
            sq.pl.ligrec({"means": empty, "pvalues": empty}, remove_empty_interactions=True)

    @pytest.mark.parametrize("dendro", ["interacting_molecules", "interacting_clusters", "both"])
    def test_dendrogram_variants(self, ligrec_result, dendro, tmp_path):
        sq.pl.ligrec(ligrec_result, dendrogram=dendro, save=str(tmp_path / f"{dendro}.png"))
        assert (tmp_path / f"{dendro}.png").exists()

    def test_swap_axes(self, ligrec_result, tmp_path):
        sq.pl.ligrec(ligrec_result, swap_axes=True, save=str(tmp_path / "swap.png"))
        assert (tmp_path / "swap.png").exists()

    def test_pvalue_threshold_filters_dots(self, ligrec_result, tmp_path):
        sq.pl.ligrec(ligrec_result, pvalue_threshold=0.5, save=str(tmp_path / "thresh.png"))
        assert (tmp_path / "thresh.png").exists()

    def test_remove_nonsig(self, ligrec_result, tmp_path):
        sq.pl.ligrec(
            ligrec_result, remove_nonsig_interactions=True, alpha=0.5,
            save=str(tmp_path / "nonsig.png"),
        )
        assert (tmp_path / "nonsig.png").exists()

    def test_cmap_and_kwargs(self, ligrec_result, tmp_path):
        sq.pl.ligrec(ligrec_result, cmap="magma", save=str(tmp_path / "cmap.png"))
        assert (tmp_path / "cmap.png").exists()


class TestSpatialScatterParams:
    """Parameter matrix from the reference's plotting/test_spatial_static.py."""

    def test_title_single_string(self, adata_ref, tmp_path):
        sq.pl.spatial_scatter(adata_ref, color="leiden", img=False, title="my title",
                              save=str(tmp_path / "t.png"))
        assert (tmp_path / "t.png").exists()

    def test_title_list(self, adata_ref, tmp_path):
        sq.pl.spatial_scatter(adata_ref, color=["leiden"], img=False, title=["panel A"],
                              save=str(tmp_path / "tl.png"))
        assert (tmp_path / "tl.png").exists()

    def test_crop_coord(self, adata_ref, tmp_path):
        sq.pl.spatial_scatter(adata_ref, color="leiden", img=False,
                              crop_coord=(2000, 2000, 15000, 15000),
                              save=str(tmp_path / "crop.png"))
        assert (tmp_path / "crop.png").exists()

    def test_groups_subset(self, adata_ref, tmp_path):
        groups = list(adata_ref.obs["leiden"].cat.categories[:2])
        sq.pl.spatial_scatter(adata_ref, color="leiden", groups=groups, img=False,
                              save=str(tmp_path / "g.png"))
        assert (tmp_path / "g.png").exists()

    def test_missing_spatial_key_raises(self, adata_ref):
        with pytest.raises((KeyError, ValueError)):
            sq.pl.spatial_scatter(adata_ref.copy(), color="leiden", spatial_key="not_spatial", img=False)

    def test_user_ax_respected(self, adata_ref):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        sq.pl.spatial_scatter(adata_ref, color="leiden", img=False, ax=ax)
        assert len(ax.collections) > 0
        plt.close(fig)

    def test_categorical_alpha(self, adata_ref, tmp_path):
        sq.pl.spatial_scatter(adata_ref, color="leiden", alpha=0.4, img=False,
                              save=str(tmp_path / "a.png"))
        assert (tmp_path / "a.png").exists()

    def test_palette_listed(self, adata_ref, tmp_path):
        n = len(adata_ref.obs["leiden"].cat.categories)
        palette = ["#ff0000", "#00ff00", "#0000ff", "#ffff00", "#00ffff"][:n]
        sq.pl.spatial_scatter(adata_ref, color="leiden", palette=palette, img=False,
                              save=str(tmp_path / "p.png"))
        assert (tmp_path / "p.png").exists()

    def test_vmin_vmax_continuous(self, adata_ref, tmp_path):
        gene = adata_ref.var_names[0]
        sq.pl.spatial_scatter(adata_ref, color=gene, vmin=0.0, vmax=1.0, img=False,
                              save=str(tmp_path / "v.png"))
        assert (tmp_path / "v.png").exists()

    def test_frameon_off(self, adata_ref, tmp_path):
        sq.pl.spatial_scatter(adata_ref, color="leiden", frameon=False, img=False,
                              save=str(tmp_path / "f.png"))
        assert (tmp_path / "f.png").exists()

    def test_connectivity_edges(self, adata_ref, tmp_path):
        adata = adata_ref.copy()
        sq.gr.spatial_neighbors_knn(adata, n_neighs=4)
        sq.pl.spatial_scatter(adata, color="leiden", img=False,
                              connectivity_key="spatial_connectivities",
                              save=str(tmp_path / "e.png"))
        assert (tmp_path / "e.png").exists()
