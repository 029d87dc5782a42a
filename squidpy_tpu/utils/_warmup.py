"""Warmup / precompile helper.

Remote XLA compiles in this TPU environment cost 20-300 s per new shape and
the persistent compile cache does not reach through the remote-compile
tunnel, so the first call of each kernel shape dominates cold end-to-end
runs (e.g. the 100k-cell integration example pays ~4 min of compiles for
~2 s of compute). :func:`warmup` drives the PUBLIC API once per requested
family on synthetic data of the caller's production shapes, so every kernel
the real calls will hit is traced, compiled and dispatched up front — in a
warm pool process, while data loads, or at service start.

Shape bucketing makes this effective: the public API compiles a bounded set
of shapes per configuration —

* nhood permutations run in 500-wide chunks (1 kernel regardless of
  ``n_perms``), with the O(n) cipher generator above 65_536 cells;
* Moran/Geary run the gene axis in blocks of ≤512 (1 SpMV kernel per
  ``(n_cells, k, block)``);
* co-occurrence/Ripley sweep fixed ``(tile, tile)`` coordinate blocks with
  tile-bucketed pair lists;
* per-cell featurization pads label counts to multiples of 128 and crop
  sides to multiples of 32.

so one warmup at the production ``(n_cells, k, n_clusters, …)`` covers every
later call with the same configuration. Different ``n_cells``/``k`` DO
recompile — warm each distinct production configuration.
"""

from __future__ import annotations

import time
from typing import Any, Iterable

import numpy as np

__all__ = ["warmup"]

_FAMILIES = ("graph", "nhood", "moran", "cooccur", "ripley", "ligrec", "features", "niche")


def _synthetic_adata(n_cells: int, n_genes: int, n_clusters: int, seed: int = 0):
    import pandas as pd

    from squidpy_tpu._core.anndata import AnnData

    rng = np.random.default_rng(seed)
    n_genes = max(n_genes, 1)
    adata = AnnData(
        X=rng.poisson(1.0, (n_cells, n_genes)).astype(np.float32),
        obs=pd.DataFrame(
            {"cluster": pd.Categorical(rng.integers(0, n_clusters, n_cells).astype(str))},
            index=[f"c{i}" for i in range(n_cells)],
        ),
        var=pd.DataFrame(index=[f"g{i}" for i in range(n_genes)]),
    )
    adata.obsm["spatial"] = rng.uniform(0, max(1.0, np.sqrt(n_cells)), (n_cells, 2))
    return adata


def warmup(
    n_cells: int,
    *,
    n_genes: int = 512,
    n_clusters: int = 16,
    n_neighs: int = 6,
    n_perms: int = 1000,
    n_interactions: int = 500,
    families: Iterable[str] = ("graph", "nhood", "moran"),
    seed: int = 0,
    verbose: bool = True,
) -> dict[str, float]:
    """Precompile the hot kernels for a production configuration.

    Runs each requested family once through the public API on synthetic data
    of the given shapes (synthetic values, real shapes — compilation is
    keyed on shapes/dtypes only). Returns seconds spent per family; the
    first run of a family is almost entirely remote compile, so these
    timings double as a compile-cost report for the configuration.

    ``families``: subset of ``{"graph", "nhood", "moran", "cooccur",
    "ripley", "ligrec", "features", "niche"}`` (order respected; "graph" is
    implied by the graph statistics and always runs first when any of them
    is requested).

    The "niche" family drives all three device-backed ``calculate_niche``
    flavors: the feature-space kNN compiles once per (n_cells,
    bucketed-width, n_neighbors) — widths are zero-padded to buckets so the
    neighborhood profile (bucket of ``n_clusters``) and PCA embeddings
    (bucket 64) cover later runs — and the cellcharter GMM compiles per
    (n_cells, embedding width, n_components).
    """
    import squidpy_tpu as sq
    from squidpy_tpu.utils import logg

    families = list(families)
    unknown = set(families) - set(_FAMILIES)
    if unknown:
        raise ValueError(f"Unknown warmup families {sorted(unknown)}. Valid: {_FAMILIES}.")
    graph_users = {"nhood", "moran", "cooccur", "ripley", "ligrec", "niche"}
    if graph_users & set(families):
        # the graph build must precede every statistic that reads it —
        # including when the caller listed "graph" explicitly but later
        families = ["graph"] + [f for f in families if f != "graph"]

    adata = _synthetic_adata(n_cells, n_genes, n_clusters, seed)
    timings: dict[str, float] = {}

    def _run(name: str, fn: Any) -> None:
        t0 = time.perf_counter()
        fn()
        timings[name] = time.perf_counter() - t0
        if verbose:
            logg.info(f"warmup[{name}]: {timings[name]:.1f}s")

    for fam in families:
        if fam == "graph":
            _run("graph", lambda: sq.gr.spatial_neighbors_knn(adata, n_neighs=n_neighs))
        elif fam == "nhood":
            # chunked at 500 perms internally: warming min(n_perms, 500)
            # compiles the chunk kernel every later n_perms reuses
            _run(
                "nhood",
                lambda: sq.gr.nhood_enrichment(
                    adata, cluster_key="cluster", n_perms=min(n_perms, 500), seed=seed,
                    copy=True, show_progress_bar=False,
                ),
            )
        elif fam == "moran":
            # warm BOTH modes the production call may hit: the analytic
            # score path, and — when the caller plans permutation p-values —
            # the perm-mode kernels (cipher + per-perm gather-dots), which
            # compile separately. Perm chunks are internally bucketed, so
            # min(n_perms, 100) compiles the same kernels as the full run.
            _run(
                "moran",
                lambda: sq.gr.spatial_autocorr(
                    adata, mode="moran", n_perms=None, copy=True, seed=seed
                ),
            )
            if n_perms:
                _run(
                    "moran_perms",
                    lambda: sq.gr.spatial_autocorr(
                        adata, mode="moran", n_perms=min(n_perms, 100), copy=True, seed=seed
                    ),
                )
        elif fam == "cooccur":
            _run(
                "cooccur",
                lambda: sq.gr.co_occurrence(adata, cluster_key="cluster", copy=True),
            )
        elif fam == "ripley":
            _run(
                "ripley",
                lambda: sq.gr.ripley(adata, cluster_key="cluster", mode="L", copy=True),
            )
        elif fam == "ligrec":
            rng = np.random.default_rng(seed)
            genes = list(adata.var_names)
            import pandas as pd

            inter = pd.DataFrame(
                {
                    "source": rng.choice(genes, n_interactions),
                    "target": rng.choice(genes, n_interactions),
                }
            )
            _run(
                "ligrec",
                lambda: sq.gr.ligrec(
                    adata, cluster_key="cluster", interactions=inter,
                    n_perms=n_perms, seed=seed, copy=True, use_raw=False,
                ),
            )
        elif fam == "features":
            rng = np.random.default_rng(seed)
            side = 256
            labels = np.zeros((side, side), np.int32)
            lid = 1
            for y in range(0, side - 24, 24):
                for x in range(0, side - 24, 24):
                    labels[y + 4 : y + 20, x + 4 : x + 20] = lid
                    lid += 1
            img = rng.integers(0, 255, (side, side, 3)).astype(np.uint8)
            from squidpy_tpu.experimental import im as exp_im

            _run(
                "features",
                lambda: exp_im.calculate_image_features(img, labels, tile_size=side),
            )
        elif fam == "niche":
            # the three device backends behind calculate_niche: feature-kNN
            # at the n_clusters bucket (neighborhood flavor), at bucket 64
            # (utag/cellcharter PCA embeddings), and the GMM EM
            # distance=3 also precompiles the device hop_reach expansion
            # (the hop_rings variant is covered by the cellcharter call)
            _run(
                "niche_neighborhood",
                lambda: sq.gr.calculate_niche(
                    adata, flavor="neighborhood", groups="cluster",
                    n_neighbors=15, resolutions=1.0, distance=3, inplace=False,
                ),
            )
            _run(
                "niche_utag",
                lambda: sq.gr.calculate_niche(
                    adata, flavor="utag", n_neighbors=15, resolutions=1.0, inplace=False,
                ),
            )
            _run(
                "niche_cellcharter",
                lambda: sq.gr.calculate_niche(
                    adata, flavor="cellcharter", groups="cluster",
                    n_components=min(8, n_clusters), inplace=False,
                ),
            )

    return timings
