"""Parser/tokenizer unit tests + hypothesis property tests (standing in
for the reference's libFuzzer target over Lhs::parse/Rhs::parse)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fluvio_jolt_spark.jolt.ast import (
    AmpEntry,
    AmpLhs,
    AtEntry,
    AtLhs,
    CompositeKeyPart,
    DollarLhs,
    EmptyIndex,
    IndexPart,
    KeyEntry,
    KeyPart,
    LiteralIndex,
    LiteralLhs,
    PipesLhs,
    Rhs,
    SquareLhs,
    Stars,
)
from fluvio_jolt_spark.jolt.errors import ParseError
from fluvio_jolt_spark.jolt.parser import parse_lhs, parse_rhs


# ---- LHS ----

def test_lhs_literal():
    assert parse_lhs("hello") == LiteralLhs("hello")


def test_lhs_empty_matches_empty_key():
    assert parse_lhs("") == PipesLhs([Stars([""])])


def test_lhs_star():
    assert parse_lhs("*") == PipesLhs([Stars(["", ""])])


def test_lhs_prefix_star():
    assert parse_lhs("tuna-*") == PipesLhs([Stars(["tuna-", ""])])


def test_lhs_multi_star():
    assert parse_lhs("a*b*c") == PipesLhs([Stars(["a", "b", "c"])])


def test_lhs_pipes():
    assert parse_lhs("a|b|c") == PipesLhs([Stars(["a"]), Stars(["b"]), Stars(["c"])])


def test_lhs_pipes_with_stars():
    assert parse_lhs("a*|b") == PipesLhs([Stars(["a", ""]), Stars(["b"])])


def test_lhs_amp_sugar():
    assert parse_lhs("&") == AmpLhs(0, 0)
    assert parse_lhs("&(2)") == AmpLhs(2, 0)
    assert parse_lhs("&(2,1)") == AmpLhs(2, 1)


def test_lhs_dollar_sugar():
    assert parse_lhs("$") == DollarLhs(0, 0)
    assert parse_lhs("$(4)") == DollarLhs(4, 0)
    assert parse_lhs("$(0,1)") == DollarLhs(0, 1)


def test_lhs_square():
    assert parse_lhs("#") == SquareLhs("")
    assert parse_lhs("#fallback") == SquareLhs("fallback")


def test_lhs_at_forms():
    assert parse_lhs("@") == AtLhs(0, Rhs([]))
    assert parse_lhs("@(2,)") == AtLhs(2, Rhs([]))
    got = parse_lhs("@(1,key)")
    assert got == AtLhs(1, Rhs([KeyPart(KeyEntry("key"))]))
    got = parse_lhs("@(key)")
    assert got == AtLhs(0, Rhs([KeyPart(KeyEntry("key"))]))


def test_lhs_escapes():
    assert parse_lhs(r"a\.b") == LiteralLhs("a.b")
    assert parse_lhs(r"\*") == LiteralLhs("*")
    assert parse_lhs(r"\@") == LiteralLhs("@")
    assert parse_lhs(r"\\") == LiteralLhs("\\")


def test_lhs_escaped_star_in_glob():
    # "tuna\\.*-*-*" from wildcards.json
    assert parse_lhs(r"tuna\.*-*-*") == PipesLhs([Stars(["tuna.", "-", "-", ""])])


def test_lhs_rejects_double_star():
    with pytest.raises(ParseError):
        parse_lhs("**")


def test_lhs_rejects_amp_then_trailing():
    with pytest.raises(ParseError):
        parse_lhs("&1")  # only &(1) form is valid


def test_lhs_rejects_bracket():
    with pytest.raises(ParseError):
        parse_lhs("[0]")


# ---- RHS ----

def test_rhs_simple_path():
    assert parse_rhs("a.b.c") == Rhs(
        [KeyPart(KeyEntry("a")), KeyPart(KeyEntry("b")), KeyPart(KeyEntry("c"))]
    )


def test_rhs_empty():
    assert parse_rhs("") == Rhs([])


def test_rhs_amp_in_path():
    # "&0" is a composite of Amp(0,0) and the literal key "0" — the &N
    # shorthand does NOT exist in this dialect (only &(N)).
    assert parse_rhs("personal_details.&0") == Rhs(
        [
            KeyPart(KeyEntry("personal_details")),
            CompositeKeyPart([AmpEntry(0, 0), KeyEntry("0")]),
        ]
    )


def test_rhs_amp_tuple():
    assert parse_rhs("a.&(1,2)") == Rhs(
        [KeyPart(KeyEntry("a")), KeyPart(AmpEntry(1, 2))]
    )


def test_rhs_composite_key():
    got = parse_rhs("photo-&-url")
    assert got == Rhs(
        [CompositeKeyPart([KeyEntry("photo-"), AmpEntry(0, 0), KeyEntry("-url")])]
    )


def test_rhs_empty_index():
    assert parse_rhs("a[]") == Rhs([KeyPart(KeyEntry("a")), IndexPart(EmptyIndex())])


def test_rhs_literal_index():
    assert parse_rhs("a[3]") == Rhs([KeyPart(KeyEntry("a")), IndexPart(LiteralIndex(3))])


def test_rhs_leading_index():
    assert parse_rhs("[1]") == Rhs([IndexPart(LiteralIndex(1))])


def test_rhs_amp_index():
    got = parse_rhs("a[&(1,2)]")
    assert got == Rhs([KeyPart(KeyEntry("a")), IndexPart(__import__("fluvio_jolt_spark.jolt.ast", fromlist=["AmpIndex"]).AmpIndex(1, 2))])


def test_rhs_at_expr():
    got = parse_rhs("@(1,index)")
    assert got == Rhs([KeyPart(AtEntry(1, Rhs([KeyPart(KeyEntry("index"))])))])


def test_rhs_max_depth_nested_at():
    deep = "@(1,@(1,@(1,@(1,a))))"  # depth 4: OK
    parse_rhs(deep)
    too_deep = "@(1,@(1,@(1,@(1,@(1,a)))))"
    with pytest.raises(ParseError):
        parse_rhs(too_deep)


def test_rhs_trailing_dot_allowed():
    # parse_rhs_impl breaks on dot followed by nothing
    assert parse_rhs("a.") == Rhs([KeyPart(KeyEntry("a"))])


# ---- property tests (fuzz stand-in) ----

@settings(max_examples=300, deadline=None)
@given(st.text(max_size=40))
def test_lhs_parse_never_crashes(s):
    try:
        parse_lhs(s)
    except ParseError:
        pass


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=40))
def test_rhs_parse_never_crashes(s):
    try:
        parse_rhs(s)
    except ParseError:
        pass


_KEY = st.text(
    alphabet=st.characters(blacklist_characters="$&@#*|[]().,\\", blacklist_categories=("Cs",)),
    min_size=1,
    max_size=8,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_KEY, min_size=1, max_size=4))
def test_rhs_roundtrip_dotted_path(keys):
    got = parse_rhs(".".join(keys))
    assert got == Rhs([KeyPart(KeyEntry(k)) for k in keys])


# ---- grammar-directed property tests: VALID expressions must parse ----
# (random text rarely exercises the deep grammar; these generators build
# syntactically-valid LHS/RHS strings from the DSL grammar and assert
# parse success — the sharper half of the fuzz stand-in.)

_IDX = st.integers(min_value=0, max_value=9).map(str)

_LHS_ATOM = st.one_of(
    _KEY,
    st.just("*"),
    _KEY.map(lambda k: k + "*"),
    st.tuples(_KEY, _KEY).map(lambda t: f"{t[0]}*{t[1]}"),
    st.just("&"),
    _IDX.map(lambda i: f"&({i})"),
    st.tuples(_IDX, _IDX).map(lambda t: f"&({t[0]},{t[1]})"),
    st.just("$"),
    st.tuples(_IDX, _IDX).map(lambda t: f"$({t[0]},{t[1]})"),
    st.just("@"),
    _KEY.map(lambda k: f"@({k})"),
    st.tuples(_IDX, _KEY).map(lambda t: f"@({t[0]},{t[1]})"),
    st.just("#lit"),
    # escaped special char inside a key
    st.sampled_from(list("$&@#*|[]().,")).map(lambda c: f"a\\{c}b"),
)


@settings(max_examples=300, deadline=None)
@given(_LHS_ATOM)
def test_lhs_valid_atoms_parse(s):
    parse_lhs(s)  # must not raise


@settings(max_examples=300, deadline=None)
@given(st.lists(st.one_of(_KEY, st.just("*"), _KEY.map(lambda k: k + "*")),
                min_size=1, max_size=4))
def test_lhs_pipe_alternations_parse(parts):
    got = parse_lhs("|".join(parts))
    assert isinstance(got, (PipesLhs, LiteralLhs))


_RHS_PART = st.one_of(
    _KEY,
    st.just("&"),
    _IDX.map(lambda i: f"&({i})"),
    st.tuples(_IDX, _IDX).map(lambda t: f"&({t[0]},{t[1]})"),
    _KEY.map(lambda k: f"@({k})"),
    st.tuples(_KEY, _KEY).map(lambda t: f"{t[0]}&{t[1]}"),  # composite
)

_RHS_INDEX = st.one_of(
    st.just("[]"),
    _IDX.map(lambda i: f"[{i}]"),
    st.tuples(_IDX, _IDX).map(lambda t: f"[&({t[0]},{t[1]})]"),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_RHS_PART, min_size=1, max_size=4), _RHS_INDEX)
def test_rhs_valid_paths_parse(parts, idx):
    parse_rhs(".".join(parts))          # dotted path
    parse_rhs(".".join(parts) + idx)    # with a trailing index op


@settings(max_examples=200, deadline=None)
@given(st.sampled_from(list("$&@#*|[]().,\\")), _KEY)
def test_lhs_escaped_special_is_literal(c, key):
    got = parse_lhs(f"{key}\\{c}")
    assert got == LiteralLhs(f"{key}{c}")


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=5, max_value=8))
def test_rhs_nested_at_beyond_max_depth_errors(depth):
    expr = "@(0," * depth + "a" + ")" * depth
    with pytest.raises(ParseError):
        parse_rhs(expr)
