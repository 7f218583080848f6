"""Error taxonomy for the Jolt engine.

Mirrors the reference's error set (fluvio-jolt/src/error.rs:4-32 and
fluvio-jolt/src/dsl/error.rs:7-29) so that failure modes are 1:1
checkable, while staying idiomatic Python exceptions.
"""

from __future__ import annotations


class JoltError(Exception):
    """Base class for all Jolt transform errors."""


class ParseError(JoltError):
    """Spec-expression parse failure (cf. dsl/error.rs:7-29).

    Carries the byte position within the expression string.
    """

    def __init__(self, pos: int, cause: str):
        self.pos = pos
        self.cause = cause
        super().__init__(f"parse error at position {pos}: {cause}")


class SpecError(JoltError):
    """Spec-level (non-expression) compile failure, e.g. duplicate LHS,
    unknown operation tag, or a malformed RHS value."""


class TransformError(JoltError):
    """Base for runtime (per-record) transform failures (cf. error.rs:4-32)."""


class KeyNotFound(TransformError):
    def __init__(self, key: str):
        self.key = key
        super().__init__(f"key not found: {key!r}")


class PathIndexOutOfRange(TransformError):
    def __init__(self, idx: int, length: int):
        super().__init__(f"path index {idx} out of range for path of length {length}")


class MatchIndexOutOfRange(TransformError):
    def __init__(self, idx: int, length: int):
        super().__init__(f"match index {idx} out of range for {length} captures")


class ArrIndexOutOfRange(TransformError):
    def __init__(self, idx: int, length: int):
        super().__init__(f"array index {idx} out of range for array of length {length}")


class InvalidIndex(TransformError):
    def __init__(self, raw: object):
        super().__init__(f"invalid array index: {raw!r}")


class UnexpectedRhsEntry(TransformError):
    def __init__(self, detail: str = ""):
        super().__init__(f"unexpected rhs entry{': ' + detail if detail else ''}")


class EvalStringError(TransformError):
    """A looked-up value could not be coerced into an output key string."""

    def __init__(self) -> None:
        super().__init__("value cannot be used as an output key (not string/number/bool)")
