"""Validator battery (reference: /root/reference/tests/test_validators.py)."""

from __future__ import annotations

import numpy as np
import pytest

from squidpy_tpu.utils._validators import (
    assert_in_range,
    assert_isinstance,
    assert_key_in,
    assert_key_in_adata,
    assert_non_empty_sequence,
    assert_non_negative,
    assert_one_of,
    assert_positive,
    check_tuple_needles,
    get_valid_values,
)


class TestAssertPositive:
    def test_positive_value(self):
        assert_positive(3.5, name="x")

    def test_zero_raises(self):
        with pytest.raises(ValueError, match="`x` to be positive"):
            assert_positive(0, name="x")

    def test_negative_raises(self):
        with pytest.raises(ValueError, match="found `-2`"):
            assert_positive(-2, name="x")


class TestAssertNonNegative:
    def test_zero_ok(self):
        assert_non_negative(0, name="y")

    def test_negative_raises(self):
        with pytest.raises(ValueError, match="non-negative"):
            assert_non_negative(-0.1, name="y")


class TestAssertInRange:
    def test_in_range(self):
        assert_in_range(0.5, 0.0, 1.0, name="frac")
        assert_in_range(0.0, 0.0, 1.0, name="frac")
        assert_in_range(1.0, 0.0, 1.0, name="frac")

    def test_out_of_range(self):
        with pytest.raises(ValueError, match=r"interval `\[0.0, 1.0\]`"):
            assert_in_range(1.5, 0.0, 1.0, name="frac")


class TestAssertIsinstance:
    def test_correct_type(self):
        assert_isinstance(3, int, name="n")

    def test_tuple_of_types(self):
        assert_isinstance("s", (int, str), name="v")

    def test_wrong_type(self):
        with pytest.raises(TypeError, match="to be of type `int`, got `str`"):
            assert_isinstance("s", int, name="n")

    def test_wrong_type_tuple_message(self):
        with pytest.raises(TypeError, match="int or float"):
            assert_isinstance("s", (int, float), name="n")

    def test_bool_is_subclass_of_int(self):
        assert_isinstance(True, int, name="flag")


class TestAssertOneOf:
    def test_valid(self):
        assert_one_of("moran", ["moran", "geary"], name="mode")

    def test_invalid(self):
        with pytest.raises(ValueError, match="one of"):
            assert_one_of("ripley", ["moran", "geary"], name="mode")

    def test_message_lists_options(self):
        with pytest.raises(ValueError, match=r"\['a', 'b'\]"):
            assert_one_of("c", ["a", "b"], name="mode")


class TestAssertNonEmptySequence:
    def test_list(self):
        assert assert_non_empty_sequence([1, 2], name="genes") == [1, 2]

    def test_scalar_conversion(self):
        assert assert_non_empty_sequence("gene", name="genes") == ["gene"]

    def test_no_scalar_conversion(self):
        with pytest.raises(TypeError, match="Expected a sequence"):
            assert_non_empty_sequence("gene", name="genes", convert_scalar=False)

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="No genes have been selected"):
            assert_non_empty_sequence([], name="genes")

    def test_dedup_preserves_order(self):
        assert assert_non_empty_sequence(["b", "a", "b"], name="genes") == ["b", "a"]

    def test_numpy_array(self):
        assert assert_non_empty_sequence(np.array([3, 1]), name="vals") == [3, 1]


class TestGetValidValues:
    def test_valid_subset(self):
        assert get_valid_values(["a", "x", "b"], ["a", "b", "c"]) == ["a", "b"]

    def test_none_valid_raises(self):
        with pytest.raises(ValueError, match="No valid values"):
            get_valid_values(["x"], ["a", "b"])

    def test_message_lists_valid(self):
        with pytest.raises(ValueError, match=r"\['a', 'b'\]"):
            get_valid_values(["x"], ["b", "a"])


class TestCheckTupleNeedles:
    def test_valid_needles(self):
        res = check_tuple_needles([("a", "b")], ["a", "b", "c"], msg="bad {}")
        assert res == [("a", "b")]

    def test_invalid_needle_reraise(self):
        with pytest.raises(ValueError, match="bad"):
            check_tuple_needles([("a", "z")], ["a", "b"], msg="bad {}", reraise=True)

    def test_invalid_needle_no_reraise(self):
        res = check_tuple_needles(
            [("a", "z"), ("a", "b")], ["a", "b"], msg="bad {}", reraise=False
        )
        assert res == [("a", "b")]

    def test_wrong_length(self):
        with pytest.raises(ValueError, match="Expected a pair"):
            check_tuple_needles([("a", "b", "c")], ["a", "b", "c"], msg="bad {}")


class TestAssertKeyIn:
    def test_key_present(self):
        class Obj:
            uns = {"hit": 1}

        assert_key_in(Obj(), "hit", attr="uns", obj_name="adata")

    def test_key_missing_lists_available(self):
        class Obj:
            uns = {"other": 1}

        with pytest.raises(KeyError, match=r"Available keys: \['other'\]"):
            assert_key_in(Obj(), "hit", attr="uns", obj_name="adata")

    def test_extra_msg(self):
        class Obj:
            uns = {}

        with pytest.raises(KeyError, match="run gr.ripley first"):
            assert_key_in(Obj(), "hit", attr="uns", obj_name="adata", extra_msg="run gr.ripley first")

    def test_dataframe_columns(self, dummy_adata):
        assert_key_in_adata(dummy_adata, "leiden", "obs")
        with pytest.raises(KeyError, match="not found in `adata.obs`"):
            assert_key_in_adata(dummy_adata, "absent", "obs")

    def test_adata_extra_msg(self, dummy_adata):
        with pytest.raises(KeyError, match="hint here"):
            assert_key_in_adata(dummy_adata, "absent", "obs", extra_msg="hint here")
