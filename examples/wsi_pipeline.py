"""Whole-slide image pipeline: tissue detection -> QC -> stain
normalization -> segmentation -> per-cell features.

Mirrors the reference's experimental H&E workflow (detect_tissue, qc_image,
normalize_stains, tiled featurization) on a synthetic slide so it runs
anywhere.

    python examples/wsi_pipeline.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

try:
    import squidpy_tpu as sq
except ModuleNotFoundError:  # running the script in place, package not installed
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import squidpy_tpu as sq

from squidpy_tpu.experimental.im import (
    calculate_image_features,
    detect_tissue,
    fit_stain_reference,
    normalize_stains,
    qc_image,
)
from squidpy_tpu.im import ImageContainer


def synthetic_he_slide(n: int = 2048, seed: int = 0) -> np.ndarray:
    """Bright background with an H&E-stained tissue blob + nuclei spots."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[:n, :n]
    tissue = ((yy - n / 2) ** 2 + (xx - n / 2) ** 2) < (n * 0.35) ** 2
    h_vec = np.array([0.65, 0.70, 0.29])
    e_vec = np.array([0.07, 0.99, 0.11])
    ch = rng.gamma(2.0, 0.25, (n, n))
    ce = rng.gamma(2.0, 0.20, (n, n))
    # nuclei: dense hematoxylin dots
    ny, nx = rng.integers(0, n, 4000), rng.integers(0, n, 4000)
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            if dy * dy + dx * dx <= 9:
                ch[np.clip(ny + dy, 0, n - 1), np.clip(nx + dx, 0, n - 1)] += 2.0
    od = ch[..., None] * h_vec + ce[..., None] * e_vec
    rgb = np.exp(-od) * 255
    rgb[~tissue] = 250.0
    return rgb.astype(np.uint8)


def main() -> None:
    t0 = time.perf_counter()
    slide = synthetic_he_slide()
    print(f"slide: {slide.shape}")

    # 1. tissue detection (full-res boolean mask)
    mask = detect_tissue(slide, method="otsu")
    print(f"tissue fraction: {mask.mean():.2f}")

    # 2. per-tile QC (blur/intensity/H&E metrics as one batched device pass)
    qc = qc_image(slide, tile_size=256)
    flagged = int((qc.obs["qc_outlier"] == "True").sum())
    print(f"QC tiles: {qc.shape[0]} ({qc.shape[1]} metrics), outliers flagged: {flagged}")

    # 3. stain normalization to a reference slide
    ref = fit_stain_reference(synthetic_he_slide(seed=7))
    normalized = normalize_stains(slide, reference=ref)
    print(f"stain-normalized: dtype {normalized.dtype}")

    # 4. nuclei segmentation: unmix the hematoxylin channel (nuclei signal),
    #    smooth, then native watershed
    from squidpy_tpu.experimental.im import decompose_stains

    conc = decompose_stains(normalized, reference=ref)
    h_channel = np.clip(conc[..., 0] / max(np.percentile(conc[..., 0], 99.9), 1e-6), 0, 1)
    cont = ImageContainer((h_channel * 255).astype(np.uint8)[..., None], layer="image")
    sq.im.process(cont, method="smooth", sigma=2.0)
    # explicit threshold: Otsu on an H image splits tissue-vs-background,
    # not nuclei-vs-stroma — pick the nuclei mode directly
    sq.im.segment(cont, method="watershed", layer="image_smooth", thresh=100)
    labels = np.asarray(cont["segmented_watershed"]).squeeze()
    n_cells = int(labels.max())
    print(f"segmented {n_cells} nuclei")

    # 5. per-cell morphology + intensity features over tiles
    feats = calculate_image_features(normalized, labels, tile_size=1024)
    print(f"per-cell features: {feats.shape[0]} cells x {feats.shape[1]} features")
    print(f"total: {time.perf_counter() - t0:.1f}s (backend: {__import__('jax').devices()[0].platform})")


if __name__ == "__main__":
    main()
