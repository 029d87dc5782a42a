"""Typed tuning-knob objects for the experimental pipelines.

The reference exposes advanced knobs as frozen dataclasses passed via
``method_params`` / ``tiling_qc_params`` / ``stitch_params`` (e.g.
/root/reference/src/squidpy/experimental/im/_stain/_reinhard.py:34-75,
/root/reference/src/squidpy/experimental/tl/_tiling_qc.py:61-99). This module
provides the shared resolver: every public function accepts an instance, a
mapping of field names, or ``None`` (defaults).
"""

from __future__ import annotations

import dataclasses
from collections.abc import Mapping
from typing import Any, TypeVar

__all__ = ["resolve_params"]

P = TypeVar("P")


def resolve_params(value: Any, cls: type[P], label: str = "params") -> P:
    """Coerce ``value`` into an instance of the params dataclass ``cls``.

    Accepts an existing instance (returned as-is), a mapping of field names
    to values (unknown names raise), or ``None`` (all defaults).
    """
    if value is None:
        return cls()
    if isinstance(value, cls):
        return value
    if isinstance(value, Mapping):
        valid = {f.name for f in dataclasses.fields(cls)}
        unknown = set(value) - valid
        if unknown:
            raise ValueError(
                f"Unknown `{label}` field(s) {sorted(unknown)} for {cls.__name__}; "
                f"valid fields: {sorted(valid)}."
            )
        return cls(**value)
    raise TypeError(
        f"`{label}` must be {cls.__name__}, a mapping of its field names, or None; "
        f"got {type(value).__name__}."
    )
