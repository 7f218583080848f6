"""Unit tests for default/remove/pointer/shift write-collision semantics,
mirroring the reference's in-module tests (src/lib.rs:127-328,
src/default.rs:14-80, src/remove.rs:14-75) plus the documented quirks."""

from __future__ import annotations

import pytest

from fluvio_jolt_spark.jolt import transform
from fluvio_jolt_spark.jolt.errors import TransformError
from fluvio_jolt_spark.jolt.numbers import number_to_string
from fluvio_jolt_spark.jolt.shift import _match_stars
from fluvio_jolt_spark.jolt.transform import apply_default, apply_remove


# ---- default ----

def test_default_inserts_absent():
    spec = {"a": "dv", "d": {"e": "dv"}}
    got = apply_default({"b": 1}, spec)
    assert got == {"b": 1, "a": "dv", "d": {"e": "dv"}}


def test_default_present_wins():
    got = apply_default({"a": "keep"}, {"a": "dv"})
    assert got == {"a": "keep"}


def test_default_null_counts_as_present():
    got = apply_default({"a": None}, {"a": "dv"})
    assert got == {"a": None}


def test_default_does_not_descend_non_objects():
    # intermediate is a scalar -> silently no-op (insert's try_fold)
    got = apply_default({"a": 5}, {"a": {"b": 1}})
    assert got == {"a": 5}


def test_default_array_leaf_in_spec():
    # spec arrays enumerate by index; input arrays are matched via
    # pointer index tokens but insert only creates objects
    got = apply_default({"xs": [10, None]}, {"xs": [1, 2, 3]})
    # xs/0 and xs/1 exist (present wins); xs/2 is absent but parent is an
    # array -> insert no-ops
    assert got == {"xs": [10, None]}


def test_default_into_created_chain():
    got = apply_default({}, {"a": {"b": {"c": 7}}})
    assert got == {"a": {"b": {"c": 7}}}


# ---- remove ----

def test_remove_leaf():
    got = apply_remove({"a": 1, "b": 2}, {"a": ""})
    assert got == {"b": 2}


def test_remove_nested():
    got = apply_remove({"d": {"e": 1, "f": 2}}, {"d": {"e": ""}})
    assert got == {"d": {"f": 2}}


def test_remove_absent_is_noop():
    got = apply_remove({"b": 2}, {"a": ""})
    assert got == {"b": 2}


def test_remove_array_parent_is_noop():
    # parent resolves to an array, delete requires an object parent
    got = apply_remove({"xs": [1, 2]}, {"xs": {"0": ""}})
    assert got == {"xs": [1, 2]}


# ---- shift write-collision semantics (shift.rs:355-366) ----

def test_collision_wraps_scalar_into_array():
    spec = [{"operation": "shift", "spec": {"bar|baz": "d"}}]
    got = transform({"bar": 2, "baz": 3}, spec)
    assert got == {"d": [2, 3]}


def test_collision_pushes_to_existing_array():
    spec = [{"operation": "shift", "spec": {"a|b|c": "d"}}]
    got = transform({"a": 1, "b": 2, "c": 3}, spec)
    assert got == {"d": [1, 2, 3]}


def test_root_output_can_be_array():
    spec = [{"operation": "shift", "spec": {"a": "[1]"}}]
    got = transform({"a": "x"}, spec)
    assert got == [None, "x"]


def test_empty_index_appends():
    spec = [{"operation": "shift", "spec": {"*": "out[]"}}]
    got = transform({"k1": "a", "k2": "b"}, spec)
    assert got == {"out": ["a", "b"]}


def test_output_null_when_nothing_matches():
    spec = [{"operation": "shift", "spec": {"nope": "x"}}]
    got = transform({"a": 1}, spec)
    assert got is None


# ---- input-key coercion (shift.rs:60-97) ----

def test_bool_input_coerced_key():
    spec = [{"operation": "shift", "spec": {"flag": {"true": "yes", "false": "no"}}}]
    assert transform({"flag": True}, spec) == {"yes": True}
    assert transform({"flag": False}, spec) == {"no": False}


def test_number_input_coerced_key():
    spec = [{"operation": "shift", "spec": {"n": {"42": "matched"}}}]
    assert transform({"n": 42}, spec) == {"matched": 42}


def test_null_input_coerced_key():
    spec = [{"operation": "shift", "spec": {"x": {"null": "was_null"}}}]
    assert transform({"x": None}, spec) == {"was_null": None}


def test_string_value_matches_itself():
    spec = [{"operation": "shift", "spec": {"color": {"red": "is_red"}}}]
    assert transform({"color": "red"}, spec) == {"is_red": "red"}


def test_array_elements_match_by_index_key():
    spec = [{"operation": "shift", "spec": {"xs": {"1": "second"}}}]
    assert transform({"xs": ["a", "b", "c"]}, spec) == {"second": "b"}


# ---- precedence: literal -> amp -> pipes, first match wins ----

def test_literal_beats_glob():
    spec = [{"operation": "shift", "spec": {"*": "glob", "a": "lit"}}]
    got = transform({"a": 1}, spec)
    assert got == {"lit": 1}


def test_one_rule_per_key():
    spec = [{"operation": "shift", "spec": {"a*": "g1", "*": "g2"}}]
    got = transform({"ax": 1}, spec)
    assert got == {"g1": 1}


# ---- match_stars quirks ----

def test_match_stars_exact():
    assert _match_stars(["abc"], "abc") == ["abc"]
    assert _match_stars(["abc"], "abd") is None


def test_match_stars_star():
    assert _match_stars(["", ""], "anything") == ["anything", "anything"]


def test_match_stars_prefix():
    assert _match_stars(["tuna-", ""], "tuna-1") == ["tuna-1", "1"]
    assert _match_stars(["tuna-", ""], "nope") is None


def test_match_stars_unanchored_tail():
    # the reference does not anchor after the last non-empty segment
    assert _match_stars(["a", "b"], "aXbZZZ") == ["aXbZZZ", "X"]


def test_match_stars_non_consuming():
    # middle literals are found but not consumed; next find starts at them
    assert _match_stars(["", "a", ""], "za z") == ["za z", "z", "a z"]


def test_match_stars_empty_pattern_list():
    assert _match_stars([], "") == [""]
    assert _match_stars([], "x") is None


# ---- error propagation ----

def test_at_missing_key_errors():
    spec = [{"operation": "shift", "spec": {"a": {"@(1,missing)": "out"}}}]
    with pytest.raises(TransformError):
        transform({"a": {"b": 1}}, spec)


def test_array_index_out_of_range_read_errors():
    spec = [{"operation": "shift", "spec": {"a": {"@(1,xs[9])": "out"}}}]
    with pytest.raises(TransformError):
        transform({"a": {"xs": [1]}}, spec)


# ---- number coercion ----

def test_number_to_string():
    assert number_to_string(42) == "42"
    assert number_to_string(-7) == "-7"
    assert number_to_string(1.0) == "1.0"
    assert number_to_string(2.5) == "2.5"
    assert number_to_string(1e30) == "1e30"
    assert number_to_string(1e-5) == "1e-5"
    assert number_to_string(1e16) == "1e16"
    assert number_to_string(0.0001) == "0.0001"
    assert number_to_string(18446744073709551615) == "18446744073709551615"


# ---- pipeline composition ----

def test_three_op_pipeline():
    spec = [
        {"operation": "remove", "spec": {"drop_me": ""}},
        {"operation": "shift", "spec": {"a": "b"}},
        {"operation": "default", "spec": {"c": 9}},
    ]
    got = transform({"a": 1, "drop_me": 2}, spec)
    assert got == {"b": 1, "c": 9}


def test_input_not_mutated():
    record = {"a": {"b": 1}}
    spec = [{"operation": "shift", "spec": {"a": "x"}}]
    transform(record, spec)
    assert record == {"a": {"b": 1}}
