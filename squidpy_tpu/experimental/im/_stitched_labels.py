"""Materialize stitched labels from a stitch-group assignment.

Functional counterpart of /root/reference/src/squidpy/experimental/im/_stitched_labels.py:76-430:
rewrite the label image through an int→int LUT so every stitch group shares
one id, and collapse the companion table rows via a merge strategy.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd

from squidpy_tpu._core.anndata import AnnData
from squidpy_tpu.utils import logg

__all__ = ["make_stitched_labels"]


def _apply_lut(labels: np.ndarray, mapping: dict[int, int]) -> np.ndarray:
    """Rewrite labels through a LUT (dense array lookup)."""
    max_label = int(labels.max())
    lut = np.arange(max_label + 1, dtype=np.int64)
    for old, new in mapping.items():
        if old <= max_label:
            lut[old] = new
    return lut[labels]


def _join_stitched_labels(labels: np.ndarray, group_ids: set[int], close_radius: int) -> np.ndarray:
    """Close the cut stripe inside each stitched group: fill background pixels
    covered by the binary closing of the group's mask — never another cell's.

    Each group's closing runs on its padded bounding box, not the whole image
    (a WSI-scale image with hundreds of groups would otherwise pay a full
    H×W morphology pass per group)."""
    from scipy import ndimage as ndi

    r = max(int(close_radius), 1)
    yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
    disk = (yy * yy + xx * xx) <= r * r
    out = labels.copy()
    slices = ndi.find_objects(labels)
    h, w = labels.shape
    for gid in group_ids:
        if gid <= 0 or gid > len(slices) or slices[gid - 1] is None:
            continue
        sy, sx = slices[gid - 1]
        y0, y1 = max(sy.start - r - 1, 0), min(sy.stop + r + 1, h)
        x0, x1 = max(sx.start - r - 1, 0), min(sx.stop + r + 1, w)
        crop = labels[y0:y1, x0:x1]
        mask = crop == gid
        closed = ndi.binary_closing(mask, structure=disk)
        fill = closed & ~mask & (crop == 0)
        out[y0:y1, x0:x1][fill] = gid
    return out


def make_stitched_labels(
    labels: Any,
    qc_table: Any = None,
    *,
    qc_table_key: str | None = None,
    scale: str = "full",
    inplace: bool = True,
    merge_strategy: str | Callable[[pd.Series], Any] = "sum",
    write_table: bool = True,
    join_labels: bool = False,
    join_close_radius: int = 3,
    sdata: Any = None,
    labels_key: str = "labels",
    labels_key_added: str | None = None,
    table_key_added: str | None = None,
) -> dict[str, Any]:
    """Build the stitched label image (+ merged per-group table).

    ``qc_table`` must carry ``obs['stitch_group_id']`` from
    :func:`squidpy_tpu.experimental.tl.assign_stitch_groups`. Returns
    ``{'labels': stitched array, 'table': merged AnnData or None}``; also
    registered on ``sdata`` when given.

    ``join_labels=True`` morphologically closes the cut stripe between the
    pieces of each stitched group (disk radius ``join_close_radius``),
    filling only genuine background pixels so each group becomes one
    connected component (reference ``_join_stitched_labels``,
    /root/reference/src/squidpy/experimental/im/_stitched_labels.py:99-137).
    """
    from squidpy_tpu.experimental._sdata import is_sdata, resolve_element

    if is_sdata(labels):
        sdata = labels
        labels = resolve_element(sdata, labels_key, tree="labels", scale=scale, what="labels")
    if qc_table is None and sdata is not None:
        qc_table = sdata.tables[qc_table_key or f"{labels_key}_qc"]
    obs = qc_table.obs
    if "stitch_group_id" not in obs:
        raise KeyError("`stitch_group_id` not found; run `assign_stitch_groups` first.")
    labels_arr = np.asarray(labels).squeeze()

    mapping = {
        int(lab): int(gid)
        for lab, gid in zip(obs["label"].to_numpy(), obs["stitch_group_id"].to_numpy())
        if int(lab) != int(gid)
    }
    stitched = _apply_lut(labels_arr, mapping)
    logg.info(f"Stitched `{len(mapping)}` labels into their groups")
    if join_labels and mapping:
        stitched = _join_stitched_labels(stitched, set(mapping.values()), join_close_radius)

    table = None
    if write_table:
        numeric = obs.select_dtypes(include=np.number).drop(
            columns=["label", "stitch_group_id"], errors="ignore"
        )
        grouped = pd.concat([obs[["stitch_group_id"]], numeric], axis=1)
        merged = grouped.groupby("stitch_group_id").agg(merge_strategy)
        merged.index.name = None
        table = AnnData(
            X=merged.to_numpy(dtype=float),
            obs=pd.DataFrame({"stitch_group_id": merged.index.to_numpy()},
                             index=pd.Index([f"group_{int(g)}" for g in merged.index])),
            var=pd.DataFrame(index=merged.columns.astype(str)),
        )

    if sdata is not None and inplace:
        if hasattr(sdata, "labels"):
            sdata.labels[labels_key_added or f"{labels_key}_stitched"] = stitched
        if table is not None and hasattr(sdata, "tables"):
            sdata.tables[table_key_added or f"{labels_key}_stitched_table"] = table
    return {"labels": stitched, "table": table}
