"""Tracing / profiling hooks.

The reference has no built-in tracer — only elapsed-time logging via
``logg.info(..., time=start)`` (/root/reference/src/squidpy/gr/_ppatterns.py:219,250).
On TPU the interesting costs are inside XLA executables, so this module exposes
the JAX profiler at the same granularity: wrap any ``squidpy_tpu`` call in
:func:`profile` to capture a TensorBoard/Perfetto trace (HLO timelines, HBM
usage, per-op device time), and :func:`annotate` to label host-side phases so
they show up as named spans inside the trace.

Example
-------
>>> with sq.utils.profile("/tmp/sq-trace"):
...     sq.gr.nhood_enrichment(adata, "leiden")
# then: tensorboard --logdir /tmp/sq-trace  (or load into Perfetto)
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Iterator

__all__ = ["profile", "annotate"]


@contextmanager
def profile(logdir: str, *, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a JAX device+host profiler trace of the enclosed block.

    Parameters
    ----------
    logdir
        Directory for the trace (viewable with TensorBoard's profile plugin or
        Perfetto).
    create_perfetto_link
        Block at exit and print a ``ui.perfetto.dev`` link (interactive use).
    """
    import jax

    with jax.profiler.trace(logdir, create_perfetto_link=create_perfetto_link):
        yield


@contextmanager
def annotate(name: str, **kwargs: Any) -> Iterator[None]:
    """Label the enclosed host-side phase as a named span in profiler traces."""
    import jax

    with jax.profiler.TraceAnnotation(name, **kwargs):
        yield
