"""Argument validators (reference: /root/reference/src/squidpy/_validators.py:15-120)."""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any


__all__ = [
    "assert_positive",
    "assert_non_negative",
    "assert_in_range",
    "assert_isinstance",
    "assert_one_of",
    "assert_key_in",
    "assert_key_in_adata",
    "assert_non_empty_sequence",
    "get_valid_values",
    "check_tuple_needles",
]


def assert_positive(value: float, *, name: str) -> None:
    if value <= 0:
        raise ValueError(f"Expected `{name}` to be positive, found `{value}`.")


def assert_non_negative(value: float, *, name: str) -> None:
    if value < 0:
        raise ValueError(f"Expected `{name}` to be non-negative, found `{value}`.")


def assert_in_range(value: float, minn: float, maxx: float, *, name: str) -> None:
    if not (minn <= value <= maxx):
        raise ValueError(f"Expected `{name}` to be in interval `[{minn}, {maxx}]`, found `{value}`.")


def assert_isinstance(value: Any, expected_type: type | tuple[type, ...], *, name: str) -> None:
    if isinstance(value, expected_type):
        return
    types = expected_type if isinstance(expected_type, tuple) else (expected_type,)
    wanted = " or ".join(t.__name__ for t in types)
    raise TypeError(f"Expected `{name}` to be of type `{wanted}`, got `{type(value).__name__}`.")


def assert_one_of(value: Any, options: Sequence[Any], *, name: str) -> None:
    if value not in options:
        raise ValueError(f"Expected `{name}` to be one of `{list(options)}`, got `{value!r}`.")


def assert_non_empty_sequence(
    seq: Any, *, name: str, convert_scalar: bool = True
) -> list[Any]:
    """Normalize ``seq`` to a de-duplicated (order-preserving) non-empty list.

    Strings and non-iterables count as scalars; they are wrapped into a
    one-element list when ``convert_scalar`` else rejected with ``TypeError``.
    """
    if isinstance(seq, str) or not hasattr(seq, "__iter__"):
        if not convert_scalar:
            raise TypeError(f"Expected a sequence, found `{type(seq)}`.")
        seq = (seq,)
    res = list(dict.fromkeys(seq))
    if not res:
        raise ValueError(f"No {name} have been selected.")
    return res


def get_valid_values(needle: Sequence[Any], haystack: Sequence[Any]) -> Sequence[Any]:
    """Subset ``needle`` to the values present in ``haystack``; never empty."""
    res = [n for n in needle if n in haystack]
    if not res:
        raise ValueError(f"No valid values were found. Valid values are `{sorted(set(haystack))}`.")
    return res


def assert_key_in(obj: Any, key: str, *, attr: str, obj_name: str, extra_msg: str = "") -> None:
    container = getattr(obj, attr)
    haystack = container.columns if hasattr(container, "columns") else container
    if key in haystack:
        return
    available = list(haystack.keys()) if hasattr(haystack, "keys") else list(haystack)
    msg = f"Key `{key!r}` not found in `{obj_name}.{attr}`. Available keys: {available}."
    raise KeyError(f"{msg} {extra_msg}" if extra_msg else msg)


def assert_key_in_adata(adata: Any, key: str | None, attr: str, *, extra_msg: str = "") -> None:
    container = getattr(adata, attr)
    haystack = container.columns if hasattr(container, "columns") else container
    if key not in haystack:
        msg = f"Key `{key}` not found in `adata.{attr}`."
        raise KeyError(f"{msg} {extra_msg}" if extra_msg else msg)


def check_tuple_needles(
    needles: Sequence[tuple[Any, Any]],
    haystack: Sequence[Any],
    msg: str,
    reraise: bool = True,
) -> Sequence[tuple[Any, Any]]:
    filtered = []
    for needle in needles:
        if not isinstance(needle, Sequence) or len(needle) != 2:
            raise ValueError(f"Expected a pair, found `{needle}`.")
        a, b = needle
        if a not in haystack or b not in haystack:
            if reraise:
                raise ValueError(msg.format(needle))
            continue
        filtered.append((a, b))
    return filtered
