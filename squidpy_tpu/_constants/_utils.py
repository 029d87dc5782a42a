"""Enum machinery with pretty error messages.

Mirrors the behavior of the reference's ``ModeEnum``
(/root/reference/src/squidpy/_constants/_utils.py:10-76): constructing an enum
from an invalid value raises a readable error enumerating the valid options.
"""

from __future__ import annotations

from enum import Enum, EnumMeta
from functools import wraps
from typing import Any


class PrettyEnumMeta(EnumMeta):
    def __call__(cls, value: Any, *args: Any, **kwargs: Any) -> Any:  # noqa: D102
        try:
            return super().__call__(value, *args, **kwargs)
        except ValueError:
            valid = [repr(m.value) for m in cls]  # type: ignore[var-annotated]
            raise ValueError(
                f"Invalid option `{value!r}` for `{cls.__name__}`. Valid options are: `[{', '.join(valid)}]`."
            ) from None


class ModeEnum(str, Enum, metaclass=PrettyEnumMeta):
    """String enum whose members stringify to their value."""

    def __str__(self) -> str:
        return str(self.value)

    @property
    def s(self) -> str:
        """The string value."""
        return str(self.value)

    @property
    def v(self) -> Any:
        """The raw value."""
        return self.value


def _docs_params(**kwds: str):  # noqa: ANN201
    """Decorator filling ``{param}`` placeholders in docstrings."""

    def dec(obj):  # noqa: ANN001, ANN202
        if obj.__doc__:
            obj.__doc__ = obj.__doc__.format(**kwds)
        return obj

    return dec


def inject_docs(**kwargs: Any):  # noqa: ANN201
    """Inject keyword values into a function docstring (``{key}`` placeholders)."""

    def decorator(fn):  # noqa: ANN001, ANN202
        @wraps(fn)
        def wrapper(*args: Any, **kw: Any) -> Any:
            return fn(*args, **kw)

        if fn.__doc__:
            wrapper.__doc__ = fn.__doc__.format(**kwargs)
        return wrapper

    return decorator
