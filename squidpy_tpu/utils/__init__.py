from squidpy_tpu.utils._logging import logg, verbosity
from squidpy_tpu.utils._profiling import annotate, profile
from squidpy_tpu.utils._warmup import warmup
from squidpy_tpu.utils._utils import (
    NDArrayA,
    _ensure_dim_order,
    chunked_vmap,
    deprecated,
    deprecated_params,
    to_host,
)
from squidpy_tpu.utils._validators import (
    assert_in_range,
    assert_isinstance,
    assert_key_in,
    assert_key_in_adata,
    assert_non_empty_sequence,
    assert_non_negative,
    assert_one_of,
    assert_positive,
    get_valid_values,
    check_tuple_needles,
)

__all__ = [
    "NDArrayA",
    "logg",
    "verbosity",
    "profile",
    "annotate",
    "warmup",
    "chunked_vmap",
    "deprecated",
    "deprecated_params",
    "to_host",
    "_ensure_dim_order",
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
