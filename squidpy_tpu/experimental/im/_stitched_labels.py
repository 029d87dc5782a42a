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


def make_stitched_labels(
    labels: Any,
    qc_table: Any,
    *,
    merge_strategy: str | Callable[[pd.Series], Any] = "sum",
    write_table: bool = True,
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
    """
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

    if sdata is not None:
        if hasattr(sdata, "labels"):
            sdata.labels[labels_key_added or f"{labels_key}_stitched"] = stitched
        if table is not None and hasattr(sdata, "tables"):
            sdata.tables[table_key_added or f"{labels_key}_stitched_table"] = table
    return {"labels": stitched, "table": table}
