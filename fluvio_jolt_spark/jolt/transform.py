"""Top-level record transform: left-fold the operation pipeline.

Parity with ``fluvio_jolt::transform`` (fluvio-jolt/src/lib.rs:78-88):
shift produces a fresh tree; default inserts spec leaves at absent
paths (present values — including JSON null — win,
fluvio-jolt/src/default.rs:5-12); remove deletes present leaf paths
(fluvio-jolt/src/remove.rs:5-12).
"""

from __future__ import annotations

import copy
import json
from typing import Any, Union

from .compiler import DefaultOp, RemoveOp, ShiftOp, TransformSpec, compile_spec_cached
from .pointer import pointer_delete, pointer_exists, pointer_insert, spec_leaves
from .shift import apply_shift


def apply_default(value: Any, spec: Any) -> Any:
    for path, leaf in spec_leaves(spec):
        if not pointer_exists(value, path):
            pointer_insert(value, path, copy.deepcopy(leaf))
    return value


def apply_remove(value: Any, spec: Any) -> Any:
    for path, _leaf in spec_leaves(spec):
        if pointer_exists(value, path):
            pointer_delete(value, path)
    return value


def transform(value: Any, spec: Union[TransformSpec, list, str]) -> Any:
    """Apply a compiled (or raw) transform spec to one JSON value.

    ``spec`` may be a compiled TransformSpec, a parsed JSON list, or a
    JSON string. The input value is not mutated.
    """
    if isinstance(spec, str):
        spec = compile_spec_cached(spec)
    elif not isinstance(spec, TransformSpec):
        spec = TransformSpec.from_value(spec)

    result = copy.deepcopy(value)
    for entry in spec.entries:
        if isinstance(entry, ShiftOp):
            result = apply_shift(entry, result)
        elif isinstance(entry, DefaultOp):
            result = apply_default(result, entry.spec)
        else:  # RemoveOp
            result = apply_remove(result, entry.spec)
    return result


def transform_json(text: str, spec: Union[TransformSpec, list, str]) -> str:
    """String-in/string-out convenience used by the vectorized Spark
    stage: parse, transform, re-serialize with insertion order preserved
    (the per-turn text-equality invariant)."""
    return dumps_canonical(transform(json.loads(text), spec))


def dumps_canonical(value: Any) -> str:
    """Serialize like serde_json::to_string: minimal separators,
    insertion-ordered keys, UTF-8 passthrough."""
    return json.dumps(value, separators=(",", ":"), ensure_ascii=False)
