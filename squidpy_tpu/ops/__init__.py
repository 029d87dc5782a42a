"""Device compute kernels (JAX/XLA/Pallas) — the TPU counterpart of the
reference's numba ``@njit`` layer (SURVEY.md §2.1)."""
