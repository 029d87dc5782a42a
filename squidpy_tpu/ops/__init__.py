"""Device compute kernels (JAX/XLA/Pallas) — the TPU counterpart of the
reference's numba ``@njit`` layer (SURVEY.md §2.1).

Two modules are EXPERIMENTAL, measured dead ends kept as documented
primitives with parity tests but dispatched by no production caller:

- :mod:`squidpy_tpu.ops.bfs` — batched device BFS; the per-shape remote
  compile (46-120 s) exceeds host multi-source dijkstra at every size.
- :mod:`squidpy_tpu.ops.pallas_pairs` — fused pairwise threshold counting;
  18× slower than the XLA path (tiny per-threshold matmuls, no cross-step
  pipelining). The production Pallas engine is
  :mod:`squidpy_tpu.ops.pallas_binned`.

Their module docstrings carry the measurements; re-attempt only with a new
idea (see CLAUDE.md "dead ends").
"""
