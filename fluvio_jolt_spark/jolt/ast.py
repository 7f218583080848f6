"""AST node types for the Jolt shift expression DSL.

Shape mirrors the reference grammar (reference SPEC.md "Expression
Grammar"; AST at fluvio-jolt/src/dsl/ast.rs:5-49) but is plain Python.
Nodes are immutable value objects used both by the parser and by the
compiled-spec interpreter.
"""

from __future__ import annotations

from typing import Union


class Stars:
    """A glob pattern: literal segments separated by ``*``.

    ``"*"`` is ``Stars(["", ""])``; ``"pre*"`` is ``Stars(["pre", ""])``;
    a single-element Stars is an exact literal match.
    (cf. dsl/ast.rs:21-24)
    """

    __slots__ = ("segments",)

    def __init__(self, segments: list[str]):
        self.segments = segments

    def __eq__(self, other):
        return isinstance(other, Stars) and self.segments == other.segments

    def __repr__(self):
        return f"Stars({self.segments!r})"


class Rhs:
    """A right-hand-side path expression: an ordered list of parts.

    ``writer`` is an optional compiled write closure (attached by the
    spec compiler for hot paths); equality ignores it.
    """

    __slots__ = ("parts", "writer")

    def __init__(self, parts: list["RhsPart"]):
        self.parts = parts
        self.writer = None

    def __eq__(self, other):
        return isinstance(other, Rhs) and self.parts == other.parts

    def __repr__(self):
        return f"Rhs({self.parts!r})"


# ---- RhsPart variants (cf. dsl/ast.rs:30-34) ----


class IndexPart:
    """``[op]`` — array index step in an RHS path."""

    __slots__ = ("op",)

    def __init__(self, op: "IndexOp"):
        self.op = op

    def __eq__(self, other):
        return isinstance(other, IndexPart) and self.op == other.op

    def __repr__(self):
        return f"IndexPart({self.op!r})"


class KeyPart:
    """A single-entry key step."""

    __slots__ = ("entry",)

    def __init__(self, entry: "RhsEntry"):
        self.entry = entry

    def __eq__(self, other):
        return isinstance(other, KeyPart) and self.entry == other.entry

    def __repr__(self):
        return f"KeyPart({self.entry!r})"


class CompositeKeyPart:
    """A key assembled by concatenating several entries, e.g. ``photo-&-url``."""

    __slots__ = ("entries",)

    def __init__(self, entries: list["RhsEntry"]):
        self.entries = entries

    def __eq__(self, other):
        return isinstance(other, CompositeKeyPart) and self.entries == other.entries

    def __repr__(self):
        return f"CompositeKeyPart({self.entries!r})"


RhsPart = Union[IndexPart, KeyPart, CompositeKeyPart]


# ---- RhsEntry variants (cf. dsl/ast.rs:36-41) ----


class AmpEntry:
    """``&(path_idx, match_idx)`` back-reference to a captured key."""

    __slots__ = ("path_idx", "match_idx")

    def __init__(self, path_idx: int, match_idx: int):
        self.path_idx = path_idx
        self.match_idx = match_idx

    def __eq__(self, other):
        return (
            isinstance(other, AmpEntry)
            and self.path_idx == other.path_idx
            and self.match_idx == other.match_idx
        )

    def __repr__(self):
        return f"AmpEntry({self.path_idx}, {self.match_idx})"


class AtEntry:
    """``@(path_idx, rhs)`` transpose lookup."""

    __slots__ = ("path_idx", "rhs")

    def __init__(self, path_idx: int, rhs: Rhs):
        self.path_idx = path_idx
        self.rhs = rhs

    def __eq__(self, other):
        return (
            isinstance(other, AtEntry)
            and self.path_idx == other.path_idx
            and self.rhs == other.rhs
        )

    def __repr__(self):
        return f"AtEntry({self.path_idx}, {self.rhs!r})"


class KeyEntry:
    """A literal key string."""

    __slots__ = ("key",)

    def __init__(self, key: str):
        self.key = key

    def __eq__(self, other):
        return isinstance(other, KeyEntry) and self.key == other.key

    def __repr__(self):
        return f"KeyEntry({self.key!r})"


RhsEntry = Union[AmpEntry, AtEntry, KeyEntry]


# ---- IndexOp variants (cf. dsl/ast.rs:43-49) ----


class AmpIndex:
    __slots__ = ("path_idx", "match_idx")

    def __init__(self, path_idx: int, match_idx: int):
        self.path_idx = path_idx
        self.match_idx = match_idx

    def __eq__(self, other):
        return (
            isinstance(other, AmpIndex)
            and self.path_idx == other.path_idx
            and self.match_idx == other.match_idx
        )

    def __repr__(self):
        return f"AmpIndex({self.path_idx}, {self.match_idx})"


class LiteralIndex:
    __slots__ = ("value",)

    def __init__(self, value: int):
        self.value = value

    def __eq__(self, other):
        return isinstance(other, LiteralIndex) and self.value == other.value

    def __repr__(self):
        return f"LiteralIndex({self.value})"


class AtIndex:
    __slots__ = ("path_idx", "rhs")

    def __init__(self, path_idx: int, rhs: Rhs):
        self.path_idx = path_idx
        self.rhs = rhs

    def __eq__(self, other):
        return (
            isinstance(other, AtIndex)
            and self.path_idx == other.path_idx
            and self.rhs == other.rhs
        )

    def __repr__(self):
        return f"AtIndex({self.path_idx}, {self.rhs!r})"


class EmptyIndex:
    """``[]`` — append to the output array."""

    __slots__ = ()

    def __eq__(self, other):
        return isinstance(other, EmptyIndex)

    def __repr__(self):
        return "EmptyIndex()"


IndexOp = Union[AmpIndex, LiteralIndex, AtIndex, EmptyIndex]


# ---- Lhs variants (cf. dsl/ast.rs:5-13) ----


class DollarLhs:
    """``$(path_idx, match_idx)`` — emit the matched key as data."""

    __slots__ = ("path_idx", "match_idx")

    def __init__(self, path_idx: int, match_idx: int):
        self.path_idx = path_idx
        self.match_idx = match_idx

    def __eq__(self, other):
        return (
            isinstance(other, DollarLhs)
            and self.path_idx == other.path_idx
            and self.match_idx == other.match_idx
        )

    def __repr__(self):
        return f"DollarLhs({self.path_idx}, {self.match_idx})"


class AmpLhs:
    """``&(path_idx, match_idx)`` — match the key equal to a prior capture."""

    __slots__ = ("path_idx", "match_idx")

    def __init__(self, path_idx: int, match_idx: int):
        self.path_idx = path_idx
        self.match_idx = match_idx

    def __eq__(self, other):
        return (
            isinstance(other, AmpLhs)
            and self.path_idx == other.path_idx
            and self.match_idx == other.match_idx
        )

    def __repr__(self):
        return f"AmpLhs({self.path_idx}, {self.match_idx})"


class AtLhs:
    """``@(path_idx, rhs)`` — transpose: use a looked-up value as data."""

    __slots__ = ("path_idx", "rhs")

    def __init__(self, path_idx: int, rhs: Rhs):
        self.path_idx = path_idx
        self.rhs = rhs

    def __eq__(self, other):
        return (
            isinstance(other, AtLhs)
            and self.path_idx == other.path_idx
            and self.rhs == other.rhs
        )

    def __repr__(self):
        return f"AtLhs({self.path_idx}, {self.rhs!r})"


class SquareLhs:
    """``#literal`` — inject a constant string as data."""

    __slots__ = ("literal",)

    def __init__(self, literal: str):
        self.literal = literal

    def __eq__(self, other):
        return isinstance(other, SquareLhs) and self.literal == other.literal

    def __repr__(self):
        return f"SquareLhs({self.literal!r})"


class PipesLhs:
    """``a|b*c|d`` — alternation of glob patterns."""

    __slots__ = ("alternatives",)

    def __init__(self, alternatives: list[Stars]):
        self.alternatives = alternatives

    def __eq__(self, other):
        return isinstance(other, PipesLhs) and self.alternatives == other.alternatives

    def __repr__(self):
        return f"PipesLhs({self.alternatives!r})"


class LiteralLhs:
    """Exact key match."""

    __slots__ = ("key",)

    def __init__(self, key: str):
        self.key = key

    def __eq__(self, other):
        return isinstance(other, LiteralLhs) and self.key == other.key

    def __repr__(self):
        return f"LiteralLhs({self.key!r})"


Lhs = Union[DollarLhs, AmpLhs, AtLhs, SquareLhs, PipesLhs, LiteralLhs]
