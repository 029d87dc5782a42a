"""End-to-end squidpy_tpu workflow on one dataset.

Mirrors the reference's core tutorial flow (graph -> neighborhood statistics
-> spatial patterns -> receptor-ligand -> image features) against the small
AnnData fixture committed in the reference repo. Runs on whatever JAX backend
is available (TPU when present, CPU otherwise).

    python examples/tutorial.py [path/to/data.h5ad]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

try:
    import squidpy_tpu as sq
except ModuleNotFoundError:  # running the script in place, package not installed
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import squidpy_tpu as sq
from squidpy_tpu._core.anndata import Raw
from squidpy_tpu._core.io_h5ad import read_h5ad


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tests/_data/test_data.h5ad"
    t0 = time.perf_counter()
    adata = read_h5ad(path)
    adata.raw = Raw(adata)
    print(f"loaded {adata.shape[0]} cells x {adata.shape[1]} genes")

    # -- spatial graph -----------------------------------------------------
    sq.gr.spatial_neighbors_knn(adata, n_neighs=6)
    sq.gr.spatial_neighbors_delaunay(adata)  # overwrites with Delaunay

    # -- neighborhood statistics ------------------------------------------
    sq.gr.nhood_enrichment(adata, "leiden", n_perms=100, seed=0)
    sq.gr.interaction_matrix(adata, "leiden")
    sq.gr.centrality_scores(adata, "leiden")
    z = adata.uns["leiden_nhood_enrichment"]["zscore"]
    print(f"nhood z-score range: [{np.nanmin(z):.2f}, {np.nanmax(z):.2f}]")

    # -- spatial patterns --------------------------------------------------
    sq.gr.spatial_autocorr(adata, mode="moran", n_perms=50, seed=0)
    sq.gr.spatial_autocorr(adata, mode="geary")
    sq.gr.co_occurrence(adata, "leiden")
    sq.gr.ripley(adata, "leiden", mode="L", n_simulations=20, seed=0)
    top = adata.uns["moranI"].index[0]
    print(f"most autocorrelated gene: {top} (I={adata.uns['moranI']['I'].iloc[0]:.3f})")

    # -- receptor-ligand ---------------------------------------------------
    from itertools import product

    genes = list(adata.raw.var_names[:6])
    sq.gr.ligrec(adata, "leiden", interactions=list(product(genes[:3], genes[3:])),
                 n_perms=50, seed=0, show_progress_bar=False)
    print("ligrec pvalues:", adata.uns["leiden_ligrec"]["pvalues"].shape)

    # -- niches + tools ----------------------------------------------------
    sq.gr.calculate_niche(adata, flavor="neighborhood", groups="leiden",
                          n_neighbors=6, resolutions=0.5)
    sq.tl.sliding_window(adata, window_size=400)
    anchor = str(adata.obs["leiden"].cat.categories[0])
    sq.tl.var_by_distance(adata, groups=anchor, cluster_key="leiden")

    # -- image pipeline ----------------------------------------------------
    from squidpy_tpu.im import ImageContainer

    rng = np.random.default_rng(0)
    img = ImageContainer((rng.random((256, 256, 3)) * 255).astype(np.uint8), layer="image")
    sq.im.process(img, method="smooth")
    sq.im.segment(img, method="watershed", layer="image_smooth")
    n_cells = int(np.asarray(img["segmented_watershed"]).max())
    spots = sq.AnnData(
        X=np.ones((16, 1)),
        obsm={"spatial": rng.integers(40, 216, (16, 2)).astype(float)},
        uns={"spatial": {"lib": {"scalefactors": {"spot_diameter_fullres": 30.0}}}},
    )
    feats = sq.im.calculate_image_features(
        spots, img, layer="image", features=["summary", "histogram", "texture"], copy=True
    )
    print(f"segmented {n_cells} regions; {feats.shape[1]} image features/spot")

    print(f"total wall time: {time.perf_counter() - t0:.1f}s "
          f"(backend: {__import__('jax').devices()[0].platform})")


if __name__ == "__main__":
    main()
