"""Spatial dataset readers: Visium, Vizgen, Nanostring.

API/semantics parity with /root/reference/src/squidpy/read/_read.py:21-344:
same directory layouts, SpaceRanger v1/v2/v3 tissue-position handling, key
conventions into ``obsm['spatial']`` / ``uns['spatial'][library_id]``.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path
from typing import Any

import numpy as np
import pandas as pd
from scipy.sparse import csr_matrix

from squidpy_tpu._constants._pkg_constants import Key
from squidpy_tpu._core.anndata import AnnData
from squidpy_tpu.read._utils import PathLike, _load_image, _read_counts
from squidpy_tpu.utils import logg

__all__ = ["visium", "vizgen", "nanostring"]


def visium(
    path: PathLike,
    *,
    counts_file: str = "filtered_feature_bc_matrix.h5",
    library_id: str | None = None,
    load_images: bool = True,
    source_image_path: PathLike | None = None,
    **kwargs: Any,
) -> AnnData:
    """Read a *10x Genomics* Visium (Space Ranger) dataset.

    Loads counts, hires/lowres tissue images, scale factors and spot
    coordinates (handling the v1 headerless / v2-v3 headered
    ``tissue_positions`` formats).
    """
    path = Path(path)
    adata, library_id = _read_counts(path, counts_file=counts_file, library_id=library_id, **kwargs)

    if not load_images:
        return adata

    adata.uns[Key.uns.spatial][library_id][Key.uns.image_key] = {
        res: _load_image(path / f"{Key.uns.spatial}/tissue_{res}_image.png") for res in ["hires", "lowres"]
    }
    adata.uns[Key.uns.spatial][library_id]["scalefactors"] = json.loads(
        (path / f"{Key.uns.spatial}/scalefactors_json.json").read_bytes()
    )

    tissue_positions_file = (
        path / "spatial/tissue_positions.csv"
        if (path / "spatial/tissue_positions.csv").exists()
        else path / "spatial/tissue_positions_list.csv"
    )
    with open(tissue_positions_file) as f:
        first_cell = f.readline().split(",")[0].strip()
    has_header = first_cell.lower() == "barcode"

    coords = pd.read_csv(tissue_positions_file, header=0 if has_header else None, index_col=0)
    coords.columns = ["in_tissue", "array_row", "array_col", "pxl_col_in_fullres", "pxl_row_in_fullres"]
    coords.set_index(coords.index.astype(str), inplace=True)

    adata.obs = pd.merge(adata.obs, coords, how="left", left_index=True, right_index=True)
    adata.obsm[Key.obsm.spatial] = adata.obs[["pxl_row_in_fullres", "pxl_col_in_fullres"]].values
    adata.obs.drop(columns=["pxl_row_in_fullres", "pxl_col_in_fullres"], inplace=True)

    if source_image_path is not None:
        source_image_path = Path(source_image_path).absolute()
        if not source_image_path.exists():
            logg.warning(f"Path to the high-resolution tissue image `{source_image_path}` does not exist")
        adata.uns["spatial"][library_id]["metadata"]["source_image_path"] = str(source_image_path)

    return adata


def vizgen(
    path: str | Path,
    *,
    counts_file: str,
    meta_file: str,
    transformation_file: str | None = None,
    library_id: str = "library",
    **kwargs: Any,
) -> AnnData:
    """Read a *Vizgen* (MERSCOPE) dataset: cell-by-gene counts, metadata with
    micron centroids, optional micron→pixel transformation matrix."""
    path = Path(path)
    adata, library_id = _read_counts(
        path=path, counts_file=counts_file, library_id=library_id, delimiter=",", first_column_names=True, **kwargs
    )
    blank_genes = np.array(["Blank" in v for v in adata.var_names])
    adata.obsm["blank_genes"] = pd.DataFrame(
        np.asarray(adata[:, blank_genes].X), columns=adata.var_names[blank_genes], index=adata.obs_names
    )
    adata = adata[:, ~blank_genes].copy()
    adata.X = csr_matrix(adata.X)

    coords = pd.read_csv(path / meta_file, header=0, index_col=0)
    coords.set_index(coords.index.astype("str"), inplace=True)

    adata.obs = pd.merge(adata.obs, coords, how="left", left_index=True, right_index=True)
    adata.obsm[Key.obsm.spatial] = adata.obs[["center_x", "center_y"]].values
    adata.obs.drop(columns=["center_x", "center_y"], inplace=True)

    if transformation_file is not None:
        matrix = pd.read_csv(path / f"images/{transformation_file}", sep=" ", header=None)
        matrix.columns = matrix.columns.astype(str)
        adata.uns[Key.uns.spatial][library_id]["scalefactors"] = {"transformation_matrix": matrix}

    return adata


def nanostring(
    path: str | Path,
    *,
    counts_file: str,
    meta_file: str,
    fov_file: str | None = None,
) -> AnnData:
    """Read a *Nanostring* (CosMx) dataset: per-FOV counts/metadata, composite
    and segmentation images, optional FOV positions."""
    path, fov_key = Path(path), "fov"
    cell_id_key = "cell_ID"
    counts = pd.read_csv(path / counts_file, header=0, index_col=cell_id_key)
    counts.index = counts.index.astype(str).str.cat(counts.pop(fov_key).astype(str).values, sep="_")

    obs = pd.read_csv(path / meta_file, header=0, index_col=cell_id_key)
    obs[fov_key] = pd.Categorical(obs[fov_key].astype(str))
    obs[cell_id_key] = obs.index.astype(np.int64)
    obs.rename_axis(None, inplace=True)
    obs.index = obs.index.astype(str).str.cat(obs[fov_key].values, sep="_")

    common_index = obs.index.intersection(counts.index)

    adata = AnnData(
        csr_matrix(counts.loc[common_index, :].values),
        obs=obs.loc[common_index, :],
        var=pd.DataFrame(index=counts.columns),
        uns={Key.uns.spatial: {}},
    )

    adata.obsm[Key.obsm.spatial] = adata.obs[["CenterX_local_px", "CenterY_local_px"]].values
    adata.obsm["spatial_fov"] = adata.obs[["CenterX_global_px", "CenterY_global_px"]].values
    adata.obs.drop(columns=["CenterX_local_px", "CenterY_local_px"], inplace=True)

    for fov in adata.obs[fov_key].cat.categories:
        adata.uns[Key.uns.spatial][fov] = {
            "images": {},
            "scalefactors": {"tissue_hires_scalef": 1, "spot_diameter_fullres": 1},
        }

    file_extensions = (".jpg", ".png", ".jpeg", ".tif", ".tiff")
    pat = re.compile(r".*_F(\d+)")
    for subdir in ["CellComposite", "CellLabels"]:
        if os.path.exists(path / subdir) and os.path.isdir(path / subdir):
            kind = "hires" if subdir == "CellComposite" else "segmentation"
            for fname in os.listdir(path / subdir):
                if fname.endswith(file_extensions):
                    fov = str(int(pat.findall(fname)[0]))
                    try:
                        adata.uns[Key.uns.spatial][fov]["images"][kind] = _load_image(path / subdir / fname)
                    except KeyError:
                        logg.warning(f"FOV `{fov}` does not exist in {subdir} folder, skipping it.")
                        continue

    if fov_file is not None:
        fov_positions = pd.read_csv(path / fov_file, header=0, index_col=fov_key)
        for fov, row in fov_positions.iterrows():
            try:
                adata.uns[Key.uns.spatial][str(fov)]["metadata"] = row.to_dict()
            except KeyError:
                logg.warning(f"FOV `{fov}` does not exist, skipping it.")
                continue

    return adata
