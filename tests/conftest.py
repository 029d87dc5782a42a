"""Test configuration.

Tests run on CPU with an 8-device virtual mesh (so sharding paths are
exercised without TPU hardware) and with float64 enabled so numerical-parity
assertions against float64 numpy references hold to tight tolerances.
Must run before jax initializes a backend — hence module import time.
"""

from __future__ import annotations

import os

# The ambient sitecustomize imports jax and sets JAX_PLATFORMS=axon before
# this file runs, so plain env vars are too late; jax.config.update still
# works because no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pytest  # noqa: E402
from scipy import sparse as sp  # noqa: E402

from squidpy_tpu import AnnData  # noqa: E402

REFERENCE_H5AD = "/root/reference/tests/_data/test_data.h5ad"


@pytest.fixture(scope="session")
def adata_ref() -> AnnData:
    """The reference repo's committed 49x1999 Visium test fixture."""
    from squidpy_tpu import read_h5ad

    return read_h5ad(REFERENCE_H5AD)


@pytest.fixture()
def adata(adata_ref: AnnData) -> AnnData:
    return adata_ref.copy()


@pytest.fixture()
def dummy_adata() -> AnnData:
    """Random coords + expression, mirroring the reference's ``dummy_adata``
    (/root/reference/tests/conftest.py:110-118)."""
    rng = np.random.default_rng(42)
    n = 200
    adata = AnnData(
        X=rng.normal(size=(n, 30)).astype(np.float64),
        obs=pd.DataFrame(index=[f"cell_{i}" for i in range(n)]),
        var=pd.DataFrame(index=[f"gene_{i}" for i in range(30)]),
    )
    adata.obsm["spatial"] = rng.uniform(0, 100, size=(n, 2))
    adata.obs["leiden"] = pd.Categorical(rng.integers(0, 5, size=n).astype(str))
    return adata


@pytest.fixture()
def adata_squaregrid() -> AnnData:
    """Square-lattice coordinates (reference: tests/conftest.py:150-158)."""
    rng = np.random.default_rng(42)
    xx, yy = np.meshgrid(np.arange(10), np.arange(10))
    coords = np.c_[xx.ravel(), yy.ravel()].astype(float)
    n = len(coords)
    adata = AnnData(X=rng.normal(size=(n, 10)))
    adata.obsm["spatial"] = coords
    adata.obs["cluster"] = pd.Categorical(rng.integers(0, 3, size=n).astype(str))
    return adata


@pytest.fixture()
def adata_intmat() -> AnnData:
    """Hand-written 5-node graph with exactly known interaction counts
    (mirrors the reference's ``adata_intmat``, tests/conftest.py:121-137)."""
    graph = sp.csr_matrix(
        np.array(
            [
                [0, 1, 1, 0, 0],
                [0, 0, 0, 0, 1],
                [1, 2, 0, 0, 0],
                [0, 1, 0, 0, 1],
                [0, 0, 1, 2, 0],
            ],
            dtype=float,
        )
    )
    adata = AnnData(
        X=np.zeros((5, 5)),
        obs=pd.DataFrame(
            {"cat": pd.Categorical.from_codes([0, 0, 0, 1, 1], ("a", "b"))},
            index=[str(i) for i in range(5)],
        ),
    )
    adata.obsp["spatial_connectivities"] = graph
    return adata
