"""Stitch-group assignment for tile-cut cell pieces.

Functional counterpart of /root/reference/src/squidpy/experimental/tl/_tiling_stitch.py:457-800:
cells flagged as cut at tile borders are paired with their counterpart on
the other side of the border (facing straight edges within ``max_gap``
pixels whose border intervals overlap), scored, and merged into stitch
groups; the native union-find merge bounds group size transitively.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import pandas as pd

from squidpy_tpu.experimental._params import resolve_params
from squidpy_tpu.utils import logg

__all__ = ["StitchParams", "assign_stitch_groups"]


@dataclass(frozen=True)
class StitchParams:
    """Advanced knobs for :func:`assign_stitch_groups` (reference:
    experimental/tl/_tiling_stitch.py:57-105). ``min_confidence``: pair-score
    floor for a stitch; ``max_gap``: maximum pixel gap between the facing
    straight edges; ``max_group_size``: transitive cap on merged group size."""

    min_confidence: float = 0.7
    max_gap: float = 3.0
    max_group_size: int = 4

    def __post_init__(self) -> None:
        if not 0.0 <= self.min_confidence <= 1.0:
            raise ValueError(f"`min_confidence` must be in [0, 1], got {self.min_confidence}.")
        if self.max_gap < 0:
            raise ValueError(f"`max_gap` must be >= 0, got {self.max_gap}.")
        if self.max_group_size < 2:
            raise ValueError(f"`max_group_size` must be >= 2, got {self.max_group_size}.")


def _border_interval(mask: np.ndarray, axis: int, position: int) -> tuple[float, float] | None:
    """Extent of the cell's pixels along the border line at ``position``."""
    if axis == 0:  # horizontal border: row == position
        if position < 0 or position >= mask.shape[0]:
            return None
        cols = np.nonzero(mask[position, :])[0]
        return (float(cols.min()), float(cols.max())) if len(cols) else None
    if position < 0 or position >= mask.shape[1]:
        return None
    rows = np.nonzero(mask[:, position])[0]
    return (float(rows.min()), float(rows.max())) if len(rows) else None


def assign_stitch_groups(
    labels: Any,
    qc_table: Any,
    *,
    tile_size: int = 2048,
    min_confidence: float = 0.7,
    max_gap: float = 3.0,
    max_group_size: int = 4,
    inplace: bool = True,
    stitch_params: Any = None,
) -> pd.DataFrame:
    """Pair tile-cut cells across tile borders into stitch groups.

    ``qc_table`` is the AnnData from
    :func:`squidpy_tpu.experimental.tl.calculate_tiling_qc`. Adds
    ``stitch_group_id`` (original label for unstitched cells, the minimum
    member label for stitched groups) and ``stitch_confidence`` to its obs;
    returns the obs DataFrame. ``stitch_params`` takes a :class:`StitchParams`
    instance (or a mapping of its field names) and overrides the knobs.
    """
    if stitch_params is not None:
        sp = resolve_params(stitch_params, StitchParams, "stitch_params")
        min_confidence, max_gap, max_group_size = sp.min_confidence, sp.max_gap, sp.max_group_size
    labels_arr = np.asarray(labels).squeeze()
    obs = qc_table.obs
    cut = obs[obs["tile_cut"].astype(bool)]
    h, w = labels_arr.shape

    # candidate borders: grid lines of the tiling
    ys = list(range(tile_size, h, tile_size))
    xs = list(range(tile_size, w, tile_size))

    pairs: list[tuple[int, int, float]] = []
    cut_labels = cut["label"].to_numpy()
    masks = {int(l): labels_arr == int(l) for l in cut_labels}
    spatial = np.asarray(qc_table.obsm["spatial"])
    label_to_idx = {int(l): i for i, l in enumerate(obs["label"].to_numpy())}

    for border_axis, positions in ((0, ys), (1, xs)):
        for pos in positions:
            # cells touching either side of this border line
            side_a, side_b = [], []
            for lid, mask in masks.items():
                iv_before = _border_interval(mask, border_axis, pos - 1)
                iv_after = _border_interval(mask, border_axis, pos)
                if iv_before is not None and iv_after is None:
                    side_a.append((lid, iv_before))
                elif iv_after is not None and iv_before is None:
                    side_b.append((lid, iv_after))
            for la, iv_a in side_a:
                for lb, iv_b in side_b:
                    overlap = min(iv_a[1], iv_b[1]) - max(iv_a[0], iv_b[0]) + 1
                    if overlap <= 0:
                        continue
                    span = max(iv_a[1], iv_b[1]) - min(iv_a[0], iv_b[0]) + 1
                    ca = spatial[label_to_idx[la]]
                    cb = spatial[label_to_idx[lb]]
                    gap = abs(ca[border_axis ^ 1] - cb[border_axis ^ 1])  # distance across border
                    confidence = overlap / span
                    if confidence >= min_confidence and gap <= max_gap + span:
                        pairs.append((la, lb, float(confidence)))

    # union-find with group-size bound
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    sizes: dict[int, int] = {}
    confidences: dict[int, float] = {}
    for la, lb, conf in sorted(pairs, key=lambda p: -p[2]):
        ra, rb = find(la), find(lb)
        if ra == rb:
            continue
        if sizes.get(ra, 1) + sizes.get(rb, 1) > max_group_size:
            continue
        root, child = min(ra, rb), max(ra, rb)
        parent[child] = root
        sizes[root] = sizes.get(ra, 1) + sizes.get(rb, 1)
        confidences[root] = max(confidences.get(root, 0.0), conf)
        confidences[child] = conf

    group_ids = []
    confs = []
    for lid in obs["label"].to_numpy():
        root = find(int(lid))
        group_ids.append(root)
        confs.append(confidences.get(int(lid), confidences.get(root, 0.0)))

    obs = obs.copy()
    obs["stitch_group_id"] = np.asarray(group_ids, dtype=np.int64)
    obs["stitch_confidence"] = np.asarray(confs, dtype=float)
    n_groups = int((obs.groupby("stitch_group_id").size() > 1).sum())
    logg.info(f"Assigned `{n_groups}` stitch groups covering "
              f"`{int((obs['stitch_group_id'] != obs['label']).sum()) + n_groups}` cells")
    if inplace:
        qc_table.obs = obs
    return obs
