"""Dataset loaders (reference: /root/reference/src/squidpy/datasets)."""

from __future__ import annotations

from typing import Any, Literal

from squidpy_tpu.datasets._registry import (
    DatasetDownloader,
    DatasetRegistry,
    download,
    get_downloader,
    get_registry,
)


# name-enumerating type aliases (reference: datasets/_datasets.py:71-93),
# derived from the registry so they never drift from the YAML
AnnDataDatasets = Literal[tuple(get_registry().names("anndata"))]
ImageDatasets = Literal[tuple(get_registry().names("image"))]
VisiumDatasets = Literal[tuple(get_registry().names("visium_10x"))]
SpatialDataDatasets = Literal[tuple(get_registry().names("spatialdata"))]


def _make_loader(dataset_name: str):  # noqa: ANN202
    entry = get_registry().get(dataset_name)
    if entry is None:
        raise ValueError(f"Unknown dataset: {dataset_name}")

    def loader(path: Any = None, **kwargs: Any) -> Any:
        return get_downloader().download(dataset_name, path, **kwargs)

    loader.__doc__ = f"{entry.doc_header}\n\nShape: ``{entry.shape}``."
    loader.__name__ = dataset_name
    return loader


# AnnData datasets
four_i = _make_loader("four_i")
imc = _make_loader("imc")
seqfish = _make_loader("seqfish")
visium_hne_adata = _make_loader("visium_hne_adata")
visium_fluo_adata = _make_loader("visium_fluo_adata")
visium_hne_adata_crop = _make_loader("visium_hne_adata_crop")
visium_fluo_adata_crop = _make_loader("visium_fluo_adata_crop")
sc_mouse_cortex = _make_loader("sc_mouse_cortex")
mibitof = _make_loader("mibitof")
merfish = _make_loader("merfish")
slideseqv2 = _make_loader("slideseqv2")

# Image datasets
visium_fluo_image_crop = _make_loader("visium_fluo_image_crop")
visium_hne_image_crop = _make_loader("visium_hne_image_crop")
visium_hne_image = _make_loader("visium_hne_image")

# SpatialData datasets
visium_hne_sdata = _make_loader("visium_hne_sdata")
cells = _make_loader("cells")


def visium(
    sample_id: str,
    *,
    include_hires_tiff: bool = False,
    base_dir: Any = None,
    path: Any = None,
    **kwargs: Any,
) -> Any:
    """Download a 10x Genomics Visium sample by name (e.g. ``V1_Human_Heart``).

    Mirrors the reference signature (datasets/_datasets.py:101-137):
    ``base_dir`` is where the three SpaceRanger files land; ``path`` is kept
    as a backwards-compatible alias for earlier squidpy_tpu releases.
    """
    downloader = get_downloader()
    if sample_id not in downloader.registry:
        raise ValueError(
            f"Unknown Visium sample: {sample_id}. "
            f"Available samples: {downloader.registry.visium_datasets}"
        )
    if base_dir is None:
        base_dir = path
    return downloader.download(sample_id, base_dir, include_hires_tiff=include_hires_tiff, **kwargs)


__all__ = [
    # Type aliases (reference: datasets/__init__.py:31-59)
    "AnnDataDatasets",
    "ImageDatasets",
    "VisiumDatasets",
    "SpatialDataDatasets",
    "DatasetRegistry",
    "DatasetDownloader",
    "download",
    "get_downloader",
    "get_registry",
    "four_i",
    "imc",
    "seqfish",
    "visium_hne_adata",
    "visium_hne_adata_crop",
    "visium_fluo_adata",
    "visium_fluo_adata_crop",
    "sc_mouse_cortex",
    "mibitof",
    "merfish",
    "slideseqv2",
    "visium",
    "visium_fluo_image_crop",
    "visium_hne_image_crop",
    "visium_hne_image",
    "visium_hne_sdata",
    "cells",
]
