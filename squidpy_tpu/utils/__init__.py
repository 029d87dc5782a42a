from squidpy_tpu.utils._logging import logg, verbosity
from squidpy_tpu.utils._profiling import annotate, profile
from squidpy_tpu.utils._utils import (
    NDArrayA,
    _ensure_dim_order,
    chunked_vmap,
    deprecated_params,
    to_host,
)
from squidpy_tpu.utils._validators import (
    assert_in_range,
    assert_key_in_adata,
    assert_non_negative,
    assert_positive,
    check_tuple_needles,
)

__all__ = [
    "NDArrayA",
    "logg",
    "verbosity",
    "profile",
    "annotate",
    "chunked_vmap",
    "deprecated_params",
    "to_host",
    "_ensure_dim_order",
    "assert_positive",
    "assert_non_negative",
    "assert_in_range",
    "assert_key_in_adata",
    "check_tuple_needles",
]
