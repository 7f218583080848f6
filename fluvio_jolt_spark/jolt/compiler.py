"""Spec compiler: JSON spec documents → executable operation objects.

Replicates the reference's deserialize-time compilation:

* A shift spec object is bucketed into four match classes —
  ``infallible`` ($ / @ / #), ``literal``, ``amp`` (&), ``pipes``
  (globs/alternations) — preserving spec order within each bucket
  (fluvio-jolt/src/dsl/deserialize.rs:19-25,124-168). Probe order at
  match time is literal → amp → pipes, first match wins
  (fluvio-jolt/src/shift.rs:112-141).
* ``default`` / ``remove`` specs stay as raw JSON trees, walked
  leaf-by-leaf at apply time (fluvio-jolt/src/spec.rs:220-276).
* The top-level spec is a list of adjacently-tagged entries
  ``{"operation": shift|default|remove, "spec": ...}``
  (fluvio-jolt/src/spec.rs:208-218).

Compilation happens once per spec (driver-side or once per executor);
records are then transformed against the compiled form only.
"""

from __future__ import annotations

import json
from typing import Any, Optional, Union

from .ast import (
    AmpLhs,
    AtLhs,
    DollarLhs,
    LiteralLhs,
    PipesLhs,
    Rhs,
    SquareLhs,
    Stars,
)
from .errors import SpecError
from .parser import parse_lhs, parse_rhs


class Thrash:
    """RHS ``null``: match and discard (deserialize.rs:258-263)."""

    __slots__ = ()

    def __repr__(self):
        return "Thrash()"


THRASH = Thrash()


class JoltObject:
    """A compiled shift spec object (cf. deserialize.rs:19-25).

    ``literal_map`` and per-pipes-entry literal frozensets are pure
    lookup accelerations: duplicate LHS keys are rejected at compile
    time and two distinct literals can't match the same input key, so a
    hash probe is observationally identical to the reference's ordered
    scan. A pipes entry mixing globs and literals keeps the ordered scan
    (an earlier glob alternative must win and supply its captures).

    ``exact_map`` / ``pipes_rest`` extend the same acceleration across
    buckets: when the ``&`` bucket is empty (its probes sit between
    literal and pipes in the reference's order and depend on runtime
    captures, so they can't merge), the literal map plus every
    all-literal pipes group BEFORE the first glob group collapse into
    one dict — probe order is preserved because an earlier entry wins
    via setdefault, and a key that would first match a glob group is
    never in the map (groups from the first glob onward stay in
    ``pipes_rest`` and keep the ordered scan). All merged matches push
    the same single-capture frame ``[k]`` the per-bucket probes would."""

    __slots__ = (
        "infallible", "literal", "amp", "pipes", "literal_map",
        "exact_map", "pipes_rest",
    )

    def __init__(self):
        # list[(lhs, list[Rhs])] — $ / @ / # entries, spec order.
        self.infallible: list[tuple[Union[DollarLhs, AtLhs, SquareLhs], list[Rhs]]] = []
        # list[(key, rentry)]
        self.literal: list[tuple[str, "REntry"]] = []
        # list[((path_idx, match_idx), rentry)]
        self.amp: list[tuple[tuple[int, int], "REntry"]] = []
        # list[(list[Stars], rentry, exact_set|None)]
        self.pipes: list[tuple[list[Stars], "REntry", frozenset | None]] = []
        self.literal_map: dict[str, "REntry"] = {}
        self.exact_map: dict[str, "REntry"] | None = None
        self.pipes_rest: list[tuple[list[Stars], "REntry", frozenset | None]] = []

    def finish(self) -> "JoltObject":
        self.literal_map = dict(self.literal)
        if self.amp:
            self.exact_map = None
            self.pipes_rest = self.pipes
            return self
        exact_map = dict(self.literal_map)
        rest: list = []
        for grp in self.pipes:
            _stars, rentry, exact = grp
            if not rest and exact is not None:
                for k in exact:
                    exact_map.setdefault(k, rentry)
            else:
                rest.append(grp)
        self.exact_map = exact_map
        self.pipes_rest = rest
        return self


# An REntry (the value of a shift spec key) is one of:
#   JoltObject — nested spec object
#   list[Rhs]  — one or more output paths
#   Thrash     — discard
REntry = Union[JoltObject, list, Thrash]


def _parse_write_rhs(s: str) -> Rhs:
    rhs = parse_rhs(s)
    from .shift import compile_rhs_writer

    rhs.writer = compile_rhs_writer(rhs)
    return rhs


def _compile_rhs_list(value: Any, context: str) -> list[Rhs]:
    """Value of an infallible key: string, or arbitrarily nested lists of
    strings (flattened) — mirrors RhssVisitor (deserialize.rs:67-102)."""
    if isinstance(value, str):
        return [_parse_write_rhs(value)]
    if isinstance(value, list):
        out: list[Rhs] = []
        for item in value:
            out.extend(_compile_rhs_list(item, context))
        return out
    raise SpecError(f"invalid rhs for {context}: expected string or list, got {type(value).__name__}")


def _compile_rentry(value: Any) -> REntry:
    """Value of a fallible key — mirrors REntryVisitor (deserialize.rs:213-271).

    Note the asymmetry vs ``_compile_rhs_list``: list elements here must be
    plain strings (no nested lists), exactly as in the reference.
    """
    if value is None:
        return THRASH
    if isinstance(value, str):
        return [_parse_write_rhs(value)]
    if isinstance(value, list):
        out = []
        for item in value:
            if not isinstance(item, str):
                raise SpecError(
                    f"invalid rhs array element: expected string, got {type(item).__name__}"
                )
            out.append(_parse_write_rhs(item))
        return out
    if isinstance(value, dict):
        return compile_shift_object(value)
    raise SpecError(f"invalid rhs value of type {type(value).__name__}")


def compile_shift_object(spec: dict) -> JoltObject:
    if not isinstance(spec, dict):
        raise SpecError(f"shift spec must be an object, got {type(spec).__name__}")
    obj = JoltObject()
    for key, value in spec.items():
        lhs = parse_lhs(key)
        if isinstance(lhs, DollarLhs) or isinstance(lhs, AtLhs) or isinstance(lhs, SquareLhs):
            obj.infallible.append((lhs, _compile_rhs_list(value, key)))
        elif isinstance(lhs, AmpLhs):
            obj.amp.append(((lhs.path_idx, lhs.match_idx), _compile_rentry(value)))
        elif isinstance(lhs, PipesLhs):
            exact = (
                frozenset(s.segments[0] for s in lhs.alternatives)
                if all(len(s.segments) == 1 for s in lhs.alternatives)
                else None
            )
            obj.pipes.append((lhs.alternatives, _compile_rentry(value), exact))
        elif isinstance(lhs, LiteralLhs):
            obj.literal.append((lhs.key, _compile_rentry(value)))
        else:  # pragma: no cover
            raise SpecError(f"unhandled lhs type for key {key!r}")
    return obj.finish()


class ShiftOp:
    __slots__ = ("root",)

    def __init__(self, root: JoltObject):
        self.root = root


class DefaultOp:
    """Spec kept raw (spec.rs:220-221) plus leaves precompiled to
    normalized pointer-token lists — the walk is per-spec work, not
    per-record work.

    ``top`` splits out the single-token leaves: on a dict root they
    reduce to one containment probe + insert, skipping the generic
    pointer walk. A top-level key is never also a prefix of a deeper
    leaf (one JSON key → one subtree), so applying the two groups in
    either order is observationally identical to spec order."""

    __slots__ = ("spec", "leaves", "top", "deep")

    def __init__(self, spec: Any):
        from .pointer import compile_leaf_paths

        self.spec = spec
        self.leaves = compile_leaf_paths(spec)
        self.top = [(t[0], leaf) for t, leaf in self.leaves if len(t) == 1]
        self.deep = [(t, leaf) for t, leaf in self.leaves if len(t) != 1]


class RemoveOp:
    __slots__ = ("spec", "leaves", "top", "deep")

    def __init__(self, spec: Any):
        from .pointer import compile_leaf_paths

        self.spec = spec
        self.leaves = compile_leaf_paths(spec)
        self.top = [t[0] for t, _leaf in self.leaves if len(t) == 1]
        self.deep = [(t, leaf) for t, leaf in self.leaves if len(t) != 1]


SpecEntry = Union[ShiftOp, DefaultOp, RemoveOp]


class TransformSpec:
    """A compiled operation pipeline (cf. spec.rs:208-218)."""

    __slots__ = ("entries",)

    def __init__(self, entries: list[SpecEntry]):
        self.entries = entries

    @classmethod
    def from_value(cls, value: Any) -> "TransformSpec":
        if not isinstance(value, list):
            raise SpecError("transform spec must be a JSON array of operations")
        entries: list[SpecEntry] = []
        for i, entry in enumerate(value):
            if not isinstance(entry, dict):
                raise SpecError(f"spec entry {i} must be an object")
            try:
                op = entry["operation"]
            except KeyError:
                raise SpecError(f"spec entry {i} missing 'operation'") from None
            spec = entry.get("spec")
            if op == "shift":
                entries.append(ShiftOp(compile_shift_object(spec)))
            elif op == "default":
                entries.append(DefaultOp(spec))
            elif op == "remove":
                entries.append(RemoveOp(spec))
            else:
                raise SpecError(f"unknown operation {op!r}")
        return cls(entries)

    @classmethod
    def from_json(cls, s: str) -> "TransformSpec":
        return cls.from_value(json.loads(s))


_SPEC_CACHE: dict[str, TransformSpec] = {}


def compile_spec_cached(spec_json: str) -> TransformSpec:
    """Executor-side memoized compile, keyed on the spec text — the
    Python analogue of the SmartModule's compile-once ``OnceCell``
    (reference smartmodule/src/lib.rs:11,16-33)."""
    spec = _SPEC_CACHE.get(spec_json)
    if spec is None:
        spec = TransformSpec.from_json(spec_json)
        _SPEC_CACHE[spec_json] = spec
    return spec
