"""Regenerate docs/api.md from package docstrings: python docs/_gen_api.py

For the main public surface (gr/im/tl/pl) each function also gets a
per-parameter table sourced from its numpydoc Parameters section (the shared
semantics table in squidpy_tpu/utils/_docs.py, injected at import)."""

from __future__ import annotations

import inspect
import io
import re
import sys
from pathlib import Path

DETAIL_MODULES = {"squidpy_tpu.gr", "squidpy_tpu.im", "squidpy_tpu.tl", "squidpy_tpu.pl"}


def _param_rows(fn) -> list[tuple[str, str]]:
    doc = inspect.getdoc(fn) or ""
    m = re.search(r"^Parameters\n-+\n(.*?)(?:\n\n[A-Z]|\Z)", doc, re.S | re.M)
    if not m:
        return []
    rows, name = [], None
    for line in m.group(1).splitlines():
        if line and not line.startswith((" ", "\t")):
            name = line.strip()
            rows.append((name, ""))
        elif name is not None and line.strip():
            rows[-1] = (name, (rows[-1][1] + " " + line.strip()).strip())
    return rows


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import squidpy_tpu as sq
    import squidpy_tpu.parallel as par
    import squidpy_tpu.utils as utils

    out = io.StringIO()
    out.write(
        "# API reference\n\n"
        "Every public symbol, with a one-line summary. Generated from docstrings\n"
        "(`python docs/_gen_api.py`); reference parity citations live in each\n"
        "docstring's body (file:line into the reference repo).\n\n"
    )
    modules = [
        ("squidpy_tpu.gr", sq.gr), ("squidpy_tpu.im", sq.im), ("squidpy_tpu.tl", sq.tl),
        ("squidpy_tpu.pl", sq.pl), ("squidpy_tpu.read", sq.read),
        ("squidpy_tpu.datasets", sq.datasets),
        ("squidpy_tpu.experimental.im", sq.experimental.im),
        ("squidpy_tpu.experimental.tl", sq.experimental.tl),
        ("squidpy_tpu.experimental.pl", sq.experimental.pl),
        ("squidpy_tpu.parallel", par), ("squidpy_tpu.utils", utils),
    ]
    for name, mod in modules:
        pub = getattr(mod, "__all__", None) or [n for n in dir(mod) if not n.startswith("_")]
        out.write(f"## `{name}`\n\n| Symbol | Summary |\n|---|---|\n")
        for n in sorted(pub):
            obj = getattr(mod, n, None)
            if obj is None:
                continue
            doc = (inspect.getdoc(obj) or "").strip().split("\n")[0]
            kind = "class" if inspect.isclass(obj) else ("fn" if callable(obj) else "obj")
            out.write(f"| `{n}` ({kind}) | {doc} |\n")
        out.write("\n")
        if name in DETAIL_MODULES:
            for n in sorted(pub):
                obj = getattr(mod, n, None)
                if not inspect.isfunction(obj):
                    continue
                rows = _param_rows(obj)
                if not rows:
                    continue
                out.write(f"### `{name.split('.', 1)[1]}.{n}`\n\n")
                out.write("| Parameter | Description |\n|---|---|\n")
                for pname, pdesc in rows:
                    out.write(f"| `{pname}` | {pdesc} |\n")
                out.write("\n")
    (Path(__file__).parent / "api.md").write_text(out.getvalue())


if __name__ == "__main__":
    main()
