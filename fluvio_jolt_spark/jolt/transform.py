"""Top-level record transform: left-fold the operation pipeline.

Parity with ``fluvio_jolt::transform`` (fluvio-jolt/src/lib.rs:78-88):
shift produces a fresh tree; default inserts spec leaves at absent
paths (present values — including JSON null — win,
fluvio-jolt/src/default.rs:5-12); remove deletes present leaf paths
(fluvio-jolt/src/remove.rs:5-12).
"""

from __future__ import annotations

import json
from typing import Any, Union

try:  # optional fast path — stdlib json is the behavioral reference
    import orjson as _orjson
except ImportError:  # pragma: no cover
    _orjson = None

from .compiler import DefaultOp, RemoveOp, ShiftOp, TransformSpec, compile_spec_cached
from .pointer import compile_leaf_paths, tokens_delete, tokens_exists, tokens_insert
from .shift import _clone, apply_shift


def apply_default(value: Any, spec: Any) -> Any:
    """Insert spec leaves at absent paths; present values (incl. null) win."""
    if isinstance(spec, DefaultOp):
        # single-token leaves on a dict root: one containment probe each
        # (on a non-dict root both exists() and insert() no-op, same as
        # skipping). Scalar leaves need no defensive clone.
        if isinstance(value, dict):
            for k, leaf in spec.top:
                if k not in value:
                    cls = leaf.__class__
                    value[k] = _clone(leaf) if (cls is dict or cls is list) else leaf
        for tokens, leaf in spec.deep:
            if not tokens_exists(value, tokens):
                tokens_insert(value, tokens, _clone(leaf))
        return value
    for tokens, leaf in compile_leaf_paths(spec):
        if not tokens_exists(value, tokens):
            tokens_insert(value, tokens, _clone(leaf))
    return value


def apply_remove(value: Any, spec: Any) -> Any:
    if isinstance(spec, RemoveOp):
        # single-token leaves: exists+delete collapse to one guarded pop
        # (tokens_delete only acts when the parent — here the root — is
        # a dict, so the non-dict root no-op is preserved).
        if isinstance(value, dict):
            for k in spec.top:
                value.pop(k, None)
        for tokens, _leaf in spec.deep:
            if tokens_exists(value, tokens):
                tokens_delete(value, tokens)
        return value
    for tokens, _leaf in compile_leaf_paths(spec):
        if tokens_exists(value, tokens):
            tokens_delete(value, tokens)
    return value


def transform(value: Any, spec: Union[TransformSpec, list, str], copy_input: bool = True) -> Any:
    """Apply a compiled (or raw) transform spec to one JSON value.

    ``spec`` may be a compiled TransformSpec, a parsed JSON list, or a
    JSON string. With ``copy_input=True`` (default) the input value is
    never mutated; pass False when the caller owns the tree (e.g. a
    throwaway json.loads result) to skip the defensive copy.
    """
    if isinstance(spec, str):
        spec = compile_spec_cached(spec)
    elif not isinstance(spec, TransformSpec):
        spec = TransformSpec.from_value(spec)

    result = value
    owned = not copy_input
    for entry in spec.entries:
        if isinstance(entry, ShiftOp):
            result = apply_shift(entry, result)
            owned = True  # shift builds a fresh tree
        else:
            if not owned:
                result = _clone(result)
                owned = True
            if isinstance(entry, DefaultOp):
                result = apply_default(result, entry)
            else:  # RemoveOp
                result = apply_remove(result, entry)
    return result


def transform_json(text: str, spec: Union[TransformSpec, list, str]) -> str:
    """String-in/string-out convenience used by the vectorized Spark
    stage: parse, transform, re-serialize with insertion order preserved
    (the per-turn text-equality invariant)."""
    loads = _orjson.loads if _orjson is not None else json.loads
    return dumps_canonical(transform(loads(text), spec, copy_input=False))


def dumps_canonical(value: Any) -> str:
    """Serialize like serde_json::to_string: minimal separators,
    insertion-ordered keys, UTF-8 passthrough. orjson when available
    (same compact format; its float formatting is ryu — the same
    algorithm serde_json uses); stdlib fallback covers >64-bit ints."""
    if _orjson is not None:
        try:
            return _orjson.dumps(value).decode()
        except (TypeError, OverflowError):
            pass  # e.g. ints beyond 64-bit — stdlib handles them
    return json.dumps(value, separators=(",", ":"), ensure_ascii=False)
