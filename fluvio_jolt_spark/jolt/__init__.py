"""Pure-Python Jolt core: spec-driven JSON reshaping (shift / default /
remove) with full behavioral parity to the reference engine at
/root/reference (infinyon/fluvio-jolt). No Spark dependency — this layer
is unit-testable standalone and is invoked per-record inside Arrow
batches by ``fluvio_jolt_spark.operators.reshape``.
"""

from .compiler import TransformSpec, compile_spec_cached
from .errors import (
    JoltError,
    ParseError,
    SpecError,
    TransformError,
)
from .transform import (
    apply_default,
    apply_remove,
    dumps_canonical,
    transform,
    transform_json,
)
from .shift import apply_shift

__all__ = [
    "TransformSpec",
    "compile_spec_cached",
    "transform",
    "transform_json",
    "dumps_canonical",
    "apply_shift",
    "apply_default",
    "apply_remove",
    "JoltError",
    "ParseError",
    "SpecError",
    "TransformError",
]
