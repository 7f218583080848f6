"""Differential gates for the compiled shift fast paths.

The interpreter keeps two observationally-identical execution lanes:

* the generic ordered-scan / generic-writer lane
  (``_insert_val_to_rhs``, literal→&→pipes bucket probes), which is a
  line-for-line mirror of the reference (shift.rs:105-144,274-369), and
* the compiled lane (``Rhs.writer`` closures, ``JoltObject.exact_map``
  merged dispatch) attached at spec-compile time for speed.

These tests force the generic lane and assert byte-identical output to
the compiled lane for every spec/input pair — including the collision
semantics (null slot → set, array → push, scalar → wrap), null values,
non-dict roots, and mixed exact/glob pipes where only a prefix of the
groups may merge into ``exact_map``.
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from fluvio_jolt_spark.jolt.compiler import (
    JoltObject,
    ShiftOp,
    TransformSpec,
    compile_spec_cached,
)
from fluvio_jolt_spark.jolt.transform import transform


def _strip_compiled(spec: TransformSpec) -> TransformSpec:
    """Return a parallel compile of the same spec with every compiled
    acceleration disabled: writers → None (generic _insert_val_to_rhs),
    exact_map → None and pipes_rest → pipes (ordered bucket scan)."""

    def strip_obj(obj: JoltObject) -> None:
        obj.exact_map = None
        obj.pipes_rest = obj.pipes
        rentries = [r for _, r in obj.literal] + [r for _, r in obj.amp] + [
            r for _, r, _ in obj.pipes
        ]
        for rentry in rentries:
            if isinstance(rentry, JoltObject):
                strip_obj(rentry)
            elif isinstance(rentry, list):
                for rhs in rentry:
                    rhs.writer = None
        for _lhs, rhs_list in obj.infallible:
            for rhs in rhs_list:
                rhs.writer = None

    for entry in spec.entries:
        if isinstance(entry, ShiftOp):
            strip_obj(entry.root)
    return spec


def _assert_both_lanes_agree(spec_value: list, input_value) -> None:
    compiled = TransformSpec.from_value(spec_value)
    generic = _strip_compiled(TransformSpec.from_value(spec_value))
    out_fast = transform(input_value, compiled)
    out_slow = transform(input_value, generic)
    assert json.dumps(out_fast, sort_keys=True) == json.dumps(out_slow, sort_keys=True)


SPECS = [
    # static key chain (static_writer)
    [{"operation": "shift", "spec": {"a": "x.y.z", "b": "x.y.z"}}],
    # literal.&0 (static_amp_writer) with pipes merging into exact_map
    [{"operation": "shift", "spec": {
        "name|gender|age": "personal_details.&0",
        "company|email|phone": "contacts.&0",
        "balance": "balance",
    }}],
    # bare &0 and deep & (keyed_writer)
    [{"operation": "shift", "spec": {"a|b": "&0", "c": "out.&0.deep"}}],
    # collisions: several sources into one slot (null→set, then wrap/push)
    [{"operation": "shift", "spec": {"a": "dst", "b": "dst", "c": "dst", "d": "dst"}}],
    # mixed exact THEN glob THEN exact pipes: only the leading exact
    # group may merge; the trailing one must stay in the ordered scan
    [{"operation": "shift", "spec": {
        "a|b": "first.&0",
        "pre*": "glob.&(0,1)",
        "c|d": "second.&0",
    }}],
    # glob BEFORE exact alternatives that overlap it: glob must win
    [{"operation": "shift", "spec": {
        "p*": "globwin.&(0,1)",
        "px|q": "exact.&0",
    }}],
    # literal key that also matches an earlier glob: literal bucket wins
    [{"operation": "shift", "spec": {
        "p*": "glob.&(0,1)",
        "px": "lit.&0",
    }}],
    # & LHS present: exact_map must be disabled for the whole object
    [{"operation": "shift", "spec": {
        "name": {"&(1)": "by_name.&0"},
        "other": "passthrough",
    }}],
    # nested objects + composite RHS keys + index writes
    [{"operation": "shift", "spec": {
        "user": {"id": "ids[]", "tags": {"*": "tag-&0.&(1,0)"}},
        "*": "rest.&0",
    }}],
    # infallible ops interleaved
    [{"operation": "shift", "spec": {
        "$": "meta.key",
        "#flag": "meta.flag",
        "a": "out.a",
    }}],
    # full reference-shaped 3-op pipeline
    [
        {"operation": "remove", "spec": {"_id": "", "friends": "", "nested": {"x": ""}}},
        {"operation": "shift", "spec": {
            "name|gender|age": "personal_details.&0",
            "company|email|phone": "contacts.&0",
            "balance": "balance",
        }},
        {"operation": "default", "spec": {"account_type": "CHECKING", "deep": {"d": 1}}},
    ],
]

INPUTS = [
    {"name": "n", "gender": "g", "age": 3, "company": "c", "email": "e",
     "phone": "p", "balance": "$1", "_id": "i", "friends": [1, 2],
     "extra": True, "user": {"id": 7, "tags": {"t1": "a", "t2": "b"}},
     "a": None, "b": [1, {"k": "v"}], "c": "s", "d": 1.5,
     "px": "pxv", "py": "pyv", "q": "qv", "pre_fix": "pf"},
    {"a": {"deep": {"obj": 1}}, "b": None, "c": None, "d": None},
    {"nested": {"x": 1, "y": 2}},
    [1, 2, {"a": "in-array"}],
    "scalar-root",
    42,
    None,
    {},
]


def test_compiled_lanes_match_generic_lane():
    for spec_value in SPECS:
        for input_value in INPUTS:
            _assert_both_lanes_agree(spec_value, input_value)


_KEYS = st.sampled_from(
    ["name", "gender", "age", "balance", "px", "py", "q", "pre1", "a", "b",
     "c", "d", "true", "null", "0", "1", ""]
)
_VALS = st.recursive(
    st.one_of(st.none(), st.booleans(), st.integers(-5, 5),
              st.text(max_size=6), st.floats(allow_nan=False, allow_infinity=False, width=32)),
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(_KEYS, children, max_size=4),
    ),
    max_leaves=12,
)


@settings(max_examples=150, deadline=None)
@given(st.dictionaries(_KEYS, _VALS, max_size=8))
def test_compiled_lanes_match_generic_lane_random(doc):
    for spec_value in SPECS:
        _assert_both_lanes_agree(spec_value, doc)


def test_exact_map_shape():
    """The merged dispatch covers exactly literal + leading exact pipe
    groups, and is disabled whenever the & bucket is non-empty."""
    spec = compile_spec_cached(json.dumps([{"operation": "shift", "spec": {
        "a|b": "x.&0", "p*": "g.&(0,1)", "c|d": "y.&0", "lit": "z",
    }}]))
    root = spec.entries[0].root
    assert set(root.exact_map) == {"a", "b", "lit"}
    assert len(root.pipes_rest) == 2  # the glob group + the trailing exact group

    spec2 = compile_spec_cached(json.dumps([{"operation": "shift", "spec": {
        "outer": {"&(1)": "by.&0", "k": "v"},
    }}]))
    inner = spec2.entries[0].root.exact_map["outer"]
    assert inner.exact_map is None  # & bucket present → ordered probes only
