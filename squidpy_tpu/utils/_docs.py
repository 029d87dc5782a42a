"""Shared parameter documentation, injected into every public docstring.

The reference shares ~465 LoC of parameter semantics across its public
surface through docrep templates (/root/reference/src/squidpy/_docs.py:1-465).
Here the same contract is a central table + an import-time injector:
:func:`inject_parameter_docs` walks a module's public functions, appends a
numpydoc ``Parameters`` section generated from each signature, and RAISES if
any parameter lacks documentation — adding an undocumented parameter to the
public surface is an import error, so coverage can never regress
(tests/test_docs.py asserts the same from the outside).

Descriptions are written fresh for this package (no docrep dependency);
where one name means different things in different functions, the override
table keyed by ``(function, parameter)`` wins.
"""

from __future__ import annotations

import inspect
from typing import Any

__all__ = ["PARAM_DOCS", "PARAM_OVERRIDES", "inject_parameter_docs"]

_MISSING: list[str] = []  # populated only under SQUIDPY_TPU_DOCS_LENIENT


PARAM_DOCS: dict[str, str] = {
    # -- containers / keys ------------------------------------------------
    "adata": "Annotated data object (or a SpatialData object whose table is "
             "resolved via ``table_key``). Results are written back under "
             "conventional keys unless ``copy=True``.",
    "sdata": "SpatialData object holding the images/labels/shapes/tables the "
             "function operates on.",
    "table_key": "When a SpatialData object is passed, name of the table in "
                 "``sdata.tables`` to analyze; ``None`` uses the only table "
                 "present (ambiguity raises).",
    "cluster_key": "Key in ``adata.obs`` with the categorical cluster/group "
                   "labels the statistic is computed over.",
    "spatial_key": "Key in ``adata.obsm`` with the spatial coordinates "
                   "(``(x, y[, z])`` per observation).",
    "connectivity_key": "Key in ``adata.obsp`` with the spatial graph's "
                        "connectivity (weights) matrix, as written by the "
                        "``spatial_neighbors*`` builders.",
    "library_key": "Key in ``adata.obs`` assigning each observation to a "
                   "library/slide; computations and plots are performed "
                   "per library block.",
    "library_id": "Library (slide) identifier(s) under ``uns['spatial']`` to "
                  "use; ``None`` uses all (or the first, where a single "
                  "library is required).",
    "key_added": "Key (or key infix) under which the result is stored; "
                 "``None`` uses the function's conventional default key.",
    "layer": "Layer in ``adata.layers`` to read expression values from; "
             "``None`` uses ``adata.X``.",
    "use_raw": "Whether to read expression from ``adata.raw`` instead of "
               "``adata.X``.",
    "genes": "Gene name(s) (or indices, per ``attr``) to compute the "
             "statistic for; ``None`` uses ``var['highly_variable']`` when "
             "present, otherwise all genes.",
    "copy": "If ``True``, return the result instead of writing it into the "
            "annotated data object.",
    "inplace": "If ``True``, modify the input object in place; otherwise "
               "return a modified copy.",
    "attr": "Which AnnData attribute to read feature vectors from: ``'X'`` "
            "(expression), ``'obs'`` (numeric obs columns) or ``'obsm'`` "
            "(an embedding selected via ``layer``).",
    "obsm_key": "Key in ``adata.obsm`` holding the array to operate on.",
    "elements_to_coordinate_systems": "Mapping of SpatialData element names "
            "to the coordinate system each should be resolved in.",
    # -- graph construction ------------------------------------------------
    "n_neighs": "Number of nearest neighbors each observation is connected "
                "to (kNN builder), or expected neighbors for grid graphs.",
    "n_neighbors": "Number of nearest neighbors of the (feature-space) kNN "
                   "graph used for clustering.",
    "radius": "Connect observations closer than this distance (radius "
              "builder); for grid/hex graphs an optional cutoff.",
    "delaunay": "Whether to build the graph from the Delaunay triangulation "
                "of the coordinates instead of neighbor queries.",
    "n_rings": "Connect grid nodes up to this many rings away (ring index "
               "is stored in the distances matrix).",
    "set_diag": "Whether to set the adjacency diagonal (self-loops) to 1.",
    "percentile": "Prune edges longer than this percentile of the edge-length "
                  "distribution (radius/Delaunay postprocessing).",
    "transform": "Adjacency transform applied after construction: ``'spectral'`` "
                 "(D^-1/2 A D^-1/2), ``'cosine'`` or ``None``.",
    "coord_type": "Type of coordinate layout: ``'grid'`` (lattice, e.g. "
                  "Visium) or ``'generic'`` (arbitrary points).",
    "builder": "A :class:`~squidpy_tpu.gr.neighbors.GraphBuilder` instance "
               "implementing the construction strategy.",
    "mask": "Boolean mask (or polygon, per function) selecting which "
            "observations/edges to keep.",
    "polygon_mask": "Polygon vertices ``(k, 2)``; edges are kept (or "
                    "removed, per ``negative_mask``) when both endpoints "
                    "fall inside the polygon.",
    "negative_mask": "If ``True``, REMOVE the edges selected by the polygon "
                     "instead of keeping them.",
    "spatial_connectivities_key": "Key in ``adata.obsp`` of the connectivity "
                                  "matrix the mask is applied to.",
    "latent_connectivities_key": "Key in ``adata.obsp`` under which the "
                                 "masked graph is stored.",
    "max_neighs": "Expected lattice degree: 4 (square grid) or 6 (hex grid); "
                  "other degrees raise.",
    # -- permutation statistics ---------------------------------------------
    "n_perms": "Number of label permutations for the null distribution (all "
               "permutations run as one batched device computation).",
    "seed": "Random seed; together with the permutation index it fully "
            "determines each shuffle, independent of device count.",
    "n_jobs": "Ignored (kept for API compatibility): permutations are a "
              "batched device axis here, not a process pool.",
    "backend": "Ignored (kept for API compatibility with the reference's "
               "joblib backends).",
    "show_progress_bar": "Ignored (kept for API compatibility): device "
                         "batches complete as a whole.",
    "numba_parallel": "Ignored (kept for API compatibility with the "
                      "reference's numba kernels).",
    "two_tailed": "Whether p-values are two-tailed (default one-tailed, "
                  "matching the reference).",
    "corr_method": "Multiple-testing correction method (statsmodels name, "
                   "e.g. ``'fdr_bh'``); ``None`` skips correction.",
    "corr_axis": "Axis to correct along for ligrec: ``'interactions'`` or "
                 "``'clusters'``.",
    "alpha": "Significance level used by the FDR correction.",
    "threshold": "Minimum fraction of cells expressing a gene for a "
                 "(gene, cluster) pair to be testable (ligrec).",
    "interactions": "Receptor-ligand interaction pairs: a DataFrame/sequence "
                    "of (source, target) gene names; ``None`` fetches the "
                    "omnipath intercell network.",
    "complex_policy": "How protein complexes are reduced to genes: ``'min'`` "
                      "(minimum-expression member) or ``'all'`` (every member).",
    "clusters": "Restrict the test to these cluster names (or cluster-pair "
                "tuples); ``None`` tests all pairs.",
    "gene_symbols": "Column in ``adata.var`` to use as gene symbols instead "
                    "of ``var_names``.",
    "remove_empty_interactions": "Drop interactions with no testable cluster "
                                 "pair (all-NaN rows).",
    "remove_nonsig_interactions": "Drop interactions with no significant "
                                  "cluster pair at ``alpha``.",
    "mode": "Which statistic to compute (function-specific set of values).",
    "transformation": "Whether to row-normalize (L1) the spatial weights "
                      "before computing the statistic.",
    "gene_block_size": "Genes processed per device block; ``None`` picks the "
                       "measured HBM-optimal width automatically.",
    "cache": "``True`` or a directory: memoize scores/permutations on disk "
             "keyed by graph, expression and seed.",
    "interval": "Number of distance bins (int) or explicit distance "
                "thresholds (array) for the co-occurrence sweep.",
    "use_pallas": "Use the fused Pallas kernel variant instead of the XLA "
                  "formulation (identical results; different compile/runtime "
                  "trade-off).",
    "n_simulations": "Number of Monte-Carlo envelope simulations.",
    "n_observations": "Number of points sampled per Poisson point-process "
                      "simulation.",
    "max_dist": "Maximum support distance; ``None`` derives it from the "
                "convex-hull area.",
    "n_steps": "Number of support (distance) steps.",
    "n_neigh": "Number of nearest neighbors used by the F/G empirical CDFs.",
    "metric": "Distance metric (euclidean only on the TPU kernels).",
    "n_iter": "Maximum diffusion iterations per gene (sepal).",
    "dt": "Diffusion time step (sepal).",
    "thresh": "Entropy-convergence threshold that freezes a gene's "
              "diffusion (sepal).",
    "score": "Which centrality scores to compute; ``None`` computes all "
             "(degree, average clustering, closeness).",
    "normalized": "Whether the interaction counts are row-normalized.",
    "weights": "Whether edge weights (not plain counts) are accumulated.",
    # -- niches ---------------------------------------------------------------
    "flavor": "Niche detection flavor: ``'neighborhood'``, ``'utag'``, "
              "``'cellcharter'`` or ``'spatialleiden'``.",
    "n_hop_weights": "Per-hop weights of the aggregated n-hop neighborhood "
                     "profile (``'neighborhood'`` flavor).",
    "aggregation": "How k-hop neighborhoods aggregate features for the "
                   "cellcharter flavor: ``'mean'`` or ``'variance'``.",
    "n_components": "Number of Gaussian-mixture components (cellcharter).",
    "min_niche_size": "Drop niches smaller than this cell count (label "
                      "becomes ``-1``).",
    "resolutions": "Leiden/Louvain resolution(s) to cluster at.",
    "n_iterations": "Maximum clustering iterations per resolution "
                    "(spatialleiden delegation).",
    "abs_nhood": "Use absolute neighborhood counts instead of relative "
                 "frequencies (``'neighborhood'`` flavor).",
    "use_rep": "Key in ``adata.obsm`` of the representation clustered by "
               "the utag flavor; ``None`` computes PCA.",
    "random_state": "Seed for the clustering backend.",
    "distance": "Neighborhood hop distance (niche flavors).",
    # -- images ----------------------------------------------------------------
    "img": "ImageContainer (or, in plotting, whether/which image to show "
           "under the scatter).",
    "img_res_key": "Resolution key under ``uns['spatial'][lib]['images']`` "
                   "to use (e.g. ``'hires'``).",
    "img_alpha": "Opacity of the background tissue image.",
    "img_cmap": "Colormap for the background image (``'gray'`` converts to "
                "luminance grayscale).",
    "img_channel": "Channel(s) of the background image to show: ``None`` "
                   "(first 3), an int, or a list of ints.",
    "channel": "Image channel to operate on; ``None`` uses all channels.",
    "channel_dim": "Name of the channel dimension of the produced layer.",
    "chunks": "Tile size for chunked (tiled) processing; ``None`` processes "
              "whole images.",
    "lazy": "If ``True``, defer computation (kept for reference API "
            "compatibility; evaluation here is eager device dispatch).",
    "layer_added": "Name of the produced image layer; ``None`` derives "
                   "``{layer}_{op}``.",
    "scale": "Scale factor between the image resolution and the spatial "
             "coordinates.",
    "apply_kwargs": "Keyword arguments forwarded to the per-chunk apply "
                    "function.",
    "features": "Feature families to compute (``'summary'``, ``'texture'``, "
                "``'histogram'``, ``'segmentation'``, ``'custom'``), with "
                "per-family parameters in ``features_kwargs``.",
    "features_kwargs": "Per-family keyword arguments, keyed by feature "
                       "family name.",
    "size": "Spot-crop scale factor (images; crop radius multiplier) or "
            "marker size (plots).",
    # -- tools ------------------------------------------------------------------
    "window_size": "Side length of each sliding window in spatial units; "
                   "``None`` derives a square from the coordinate extent.",
    "overlap": "Overlap between adjacent sliding windows (same units); "
               "windows become multi-membership columns when > 0.",
    "coord_columns": "Names of the two obs columns (or obsm columns) holding "
                     "the coordinates used for window assignment.",
    "sliding_window_key": "Prefix of the obs column(s) the window labels are "
                          "written to.",
    "drop_partial_windows": "Drop windows extending past the coordinate "
                            "range instead of clipping them.",
    "groups": "Category subset to include (plots) or group labels to "
              "compute for.",
    "anchor_key": "Obs key (or keys) of the anchor group distances are "
                  "measured from (var_by_distance).",
    "design_matrix_key": "Key under which the design matrix is stored in "
                         "``adata.obsm``.",
    "covariates": "Obs column(s) appended to the design matrix unchanged.",
    "metric_key": "Name of the distance metric column in the design matrix.",
    "min_x": "Lower x bound of the window; ``None`` uses the data minimum.",
    "max_x": "Upper x bound of the window; ``None`` uses the data maximum.",
    "min_y": "Lower y bound of the window; ``None`` uses the data minimum.",
    "max_y": "Upper y bound of the window; ``None`` uses the data maximum.",
    # -- plotting ----------------------------------------------------------------
    "color": "Obs column(s) or gene name(s) to color by; each entry becomes "
             "a panel.",
    "shape": "Spot shape drawn in data units: ``'circle'``, ``'square'``, "
             "``'hex'``, or ``None`` for plain point scatter.",
    "size_key": "Scalefactor key holding the spot diameter (validated "
                "against the library's scalefactors).",
    "cmap": "Matplotlib colormap for continuous values.",
    "norm": "Explicit matplotlib normalizer for continuous colors "
            "(overrides vmin/vmax/vcenter).",
    "vmin": "Lower bound of the continuous color scale.",
    "vmax": "Upper bound of the continuous color scale.",
    "vcenter": "Center of a diverging color scale (TwoSlopeNorm).",
    "palette": "Categorical palette: a name, list of colors, or mapping "
               "from category to color.",
    "na_color": "Color used for NaN / filtered-out observations.",
    "legend_loc": "Legend placement (``'right margin'`` or any matplotlib "
                  "location); falsy values hide the legend.",
    "legend_kwargs": "Extra keyword arguments for the legend call.",
    "colorbar": "Whether to draw a colorbar for continuous panels.",
    "frameon": "Whether to draw the axes frame.",
    "title": "Panel title(s); ``None`` derives them from ``color`` and the "
             "library.",
    "axis_label": "Axis label pair; ``None`` uses ``spatial1``/``spatial2``.",
    "crop_coord": "View window ``(x0, y0, x1, y1)`` in data units.",
    "scalebar_dx": "Physical units per data unit; when set, a scale bar is "
                   "drawn.",
    "scalebar_units": "Unit label of the scale bar (e.g. ``'um'``).",
    "outline": "Draw a two-tone outline ring around each spot.",
    "outline_color": "Outer/inner outline colors.",
    "outline_width": "Outer/inner outline widths as fractions of the spot "
                     "radius.",
    "edges_width": "Line width of the spatial-graph edge overlay.",
    "edges_color": "Color of the spatial-graph edge overlay.",
    "ncols": "Maximum panels per row of the panel grid.",
    "wspace": "Horizontal spacing between panels; ``None`` derives it from "
              "the figure width.",
    "hspace": "Vertical spacing between panels.",
    "library_first": "Panel order: libraries-major (``True``) or "
                     "colors-major (``False``).",
    "fig": "Existing figure to draw into (required when a list of axes is "
           "passed).",
    "ax": "Existing axes (or list of axes matching the panel count) to draw "
          "into.",
    "return_ax": "Return the drawn Axes (or list of Axes for multi-panel "
                 "figures).",
    "figsize": "Figure size per panel in inches.",
    "dpi": "Figure resolution in dots per inch.",
    "save": "Path to save the figure to.",
    "seg": "Whether to show the segmentation mask (or an explicit mask "
           "array).",
    "seg_key": "Key under ``uns['spatial'][lib]['images']`` holding the "
               "segmentation label image.",
    "seg_cell_id": "Obs column with each observation's label id in the "
                   "segmentation image.",
    "seg_outline": "Highlight segment boundaries.",
    "seg_contourpx": "Erode each segment by this many pixels and draw only "
                     "the remaining contour ring.",
    "annotate": "Write the values into the heatmap cells.",
    "method": "Linkage method for the dendrogram ordering (heatmaps), or "
              "algorithm variant (function-specific).",
    "dendrogram": "Which dendrogram(s) to draw on the ligrec dotplot.",
    "swap_axes": "Transpose the plot's axes.",
    "cbar_kwargs": "Extra keyword arguments for the colorbar.",
    "means_range": "Keep interactions whose mean expression falls in this "
                   "closed interval.",
    "pvalue_threshold": "Keep interactions significant at this p-value in "
                        "at least one cluster pair.",
    "source_groups": "Source (first) cluster subset to show.",
    "target_groups": "Target (second) cluster subset to show.",
    "plot_sims": "Overlay the simulation envelope curves.",
    "alpha_min": "Lower opacity bound.",
    "stack_vars": "Stack the variables into one axes instead of panels.",
    "line_palette": "Palette for line plots.",
    "scatter_palette": "Palette for scatter overlays.",
    "regplot_kwargs": "Extra keyword arguments for the regression plot.",
    "scatterplot_kwargs": "Extra keyword arguments for the scatter plot.",
    "show_scatter": "Overlay the raw per-cell scatter under the fit.",
    "order": "Polynomial order of the fitted trend.",
    "covariate": "Obs column whose levels are drawn as separate lines.",
    "var": "Variable (gene) name(s) whose trend is plotted.",
    "layer_ratio": "Relative height of the image strip vs the main panel.",
    "use_weights": "Weight cells by the design-matrix weights.",
    "key": "Key of the stored result to read.",
    "prefix": "Prefix of the obs/uns keys read or written.",
    "data": "Input data object/array of the function.",
    "kwargs": "Additional keyword arguments forwarded to the underlying "
              "implementation (matplotlib/readers/builders).",
}

# (function __qualname__, parameter) -> description, when the shared entry
# does not fit that function's meaning
PARAM_OVERRIDES: dict[tuple[str, str], str] = {
    ("spatial_autocorr", "mode"): "Statistic: ``'moran'`` (Moran's I) or ``'geary'`` (Geary's C).",
    ("ripley", "mode"): "Ripley statistic: ``'F'``, ``'G'`` or ``'L'``.",
    ("spatial_neighbors", "mode"): "Graph type to build (deprecated façade): "
                                   "``'grid'``, ``'generic'`` or ``'delaunay'``.",
    ("ligrec", "data"): "AnnData holding expression (or a pre-built "
                        "PermutationTest instance).",
    ("nhood_enrichment", "mode"): "``'perms'`` (permutation z-scores) or "
                                  "``'analytic'`` (exact join-count moments, zero permutations).",
    ("spatial_scatter", "img"): "Whether to show the tissue image under the scatter.",
    ("spatial_segment", "seg"): "Whether to show the segmentation mask overlay.",
    ("extract", "obsm_key"): "Key(s) in ``adata.obsm`` whose columns are "
                             "extracted into temporary obs columns.",
    ("var_by_distance", "groups"): "Anchor group(s) distances are measured from.",
}


def _build_section(fn: Any, indent: str = "    ") -> str | None:
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return None
    lines: list[str] = []
    for name, p in sig.parameters.items():
        if name in ("self", "cls") or p.kind is p.VAR_POSITIONAL:
            continue
        label = f"**{name}" if p.kind is p.VAR_KEYWORD else name
        lookup = "kwargs" if p.kind is p.VAR_KEYWORD else name
        desc = PARAM_OVERRIDES.get((fn.__name__, lookup), PARAM_DOCS.get(lookup))
        if desc is None:
            import os

            if os.environ.get("SQUIDPY_TPU_DOCS_LENIENT"):
                _MISSING.append(f"{lookup} @ {fn.__qualname__}")
                continue
            raise RuntimeError(
                f"No parameter documentation for `{lookup}` of `{fn.__qualname__}` — "
                f"add it to squidpy_tpu/utils/_docs.py (PARAM_DOCS or PARAM_OVERRIDES)."
            )
        lines.append(f"{indent}{label}")
        lines.append(f"{indent}    {desc}")
    if not lines:
        return None
    return f"\n\n{indent}Parameters\n{indent}----------\n" + "\n".join(lines) + "\n" + indent


def inject_parameter_docs(module: Any, names: list[str] | None = None) -> None:
    """Append generated ``Parameters`` sections to a module's public functions.

    Idempotent (marks functions it has processed); raises at import time when
    a public parameter has no documentation entry.
    """
    for name in names if names is not None else getattr(module, "__all__", []):
        fn = getattr(module, name, None)
        if not inspect.isfunction(fn) or getattr(fn, "__param_docs_injected__", False):
            continue
        if "Parameters\n" in (fn.__doc__ or "") or "Parameters\r" in (fn.__doc__ or ""):
            fn.__param_docs_injected__ = True
            continue
        section = _build_section(fn)
        if section is not None:
            fn.__doc__ = (fn.__doc__ or "").rstrip() + section
        fn.__param_docs_injected__ = True
